"""Materialized sparse (BM25) text index: the inverted-index artifact a
production search deployment maintains, as the sparse sibling of
operators/similarity.py::build_ivf_index.

Layout (all content-addressed by the source corpus fingerprint and
published under a per-fingerprint tag, so regenerated testdata can never
serve stale postings):

- ``postings`` — (tok, doc_id, tf, dl), written ``bucketBy(N, tok)`` +
  ``sortBy(tok)``: a query's term set selects only its terms' buckets
  (``SelectedBucketsCount`` in the scan — plan-asserted), the bucket-file
  read is the sparse analog of the IVF index's cell-partition pruning.
  Buckets, not hive partitions: a real vocabulary is millions of tokens
  — one directory per token would melt the namenode; N fixed bucket
  files is the standard layout. ``dl`` rides denormalized in the posting
  row so scoring never joins a doc-length table.
- ``stats`` — (tok, df): vocabulary-sized, broadcast at query time.
- ``corpus`` — (n_docs, a_tok): one row.

Query-time: the query's terms are DRIVER-SIDE LITERALS (a search query
is request metadata, like the panel ids every similarity query takes) —
which is what makes bucket pruning applicable: ``tok IN (...literals)``
prunes at planning. Scoring replays the exact-integer linear-idf BM25 of
plans/retrieval.py (same ``_BM25_MILLI_SQL`` fragment), so the search
result is bit-identical to the scan-everything llm_bm25_topk.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_query_engine_spark.functions import text as T

N_BUCKETS = 32

_TMP = Path(__file__).resolve().parents[2] / ".tmp"


def _stage(sf_dir: str) -> tuple[Path, str]:
    """Content-addressed staging dir + catalog tag for the corpus at
    ``sf_dir`` (fingerprint = documents.parquet path+mtime+size — the
    bucketed-staging discipline of plans/analytic.py::_bucket_stage).
    Stale same-corpus siblings are swept; sweeping is race-benign
    because their source no longer exists in that form."""
    from distributed_query_engine_spark.catalog import staging_key

    key = staging_key(sf_dir).replace(".", "_").replace("-", "_")
    f = Path(sf_dir) / "documents.parquet"
    st = f.stat()
    fp = hashlib.md5(f"{f}:{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:8]
    tag = f"{key}_{fp}"
    current = _TMP / f"bm25_index_{tag}"
    for d in _TMP.glob(f"bm25_index_{key}_*"):
        if d != current:
            shutil.rmtree(d, ignore_errors=True)
    return current, tag


def tf_dl_relation(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, tf, dl): term frequencies with the doc length
    denormalized on — one exploded scan, two partial-agg'd shuffles."""
    toks = docs.select("doc_id", F.explode(T.words(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, "doc_id")


def build_bm25_index(
    spark: SparkSession, docs: DataFrame, sf_dir: str, n_buckets: int = N_BUCKETS
) -> str:
    """Materialize the index; returns the catalog tag of the postings
    table. Idempotent per corpus fingerprint: a fingerprint hit skips
    the build entirely (same skip discipline as the content-addressed
    ANN indexes)."""
    base, tag = _stage(sf_dir)
    tbl = f"bm25_postings_{tag}"
    done = base / "_PUBLISHED"
    if done.exists() and spark.catalog.tableExists(tbl):
        return tag
    rel = tf_dl_relation(docs)
    (
        rel.select("tok", "doc_id", "tf", "dl")
        .write.format("parquet")
        .bucketBy(n_buckets, "tok")
        .sortBy("tok")
        .option("path", str(base / "postings"))
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    rel.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).write.mode(
        "overwrite"
    ).parquet(str(base / "stats"))
    rel.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("a_tok"),
    ).write.mode("overwrite").parquet(str(base / "corpus"))
    done.touch()
    return tag


def bm25_search_index(
    spark: SparkSession,
    sf_dir: str,
    qterms: list[tuple[int, str]],
    k: int = 5,
    milli_sql: str | None = None,
) -> DataFrame:
    """BM25 top-k against the materialized index. ``qterms`` is the
    tokenized query panel as (q_id, term) literals — request metadata,
    so the ``tok IN`` predicate is literal and the postings scan bucket-
    prunes. ``milli_sql`` is the per-term integer score expression
    (defaults to the shared plans/retrieval.py fragment)."""
    if milli_sql is None:
        from distributed_query_engine_spark.plans.retrieval import _BM25_MILLI_SQL

        milli_sql = _BM25_MILLI_SQL.replace("//", " div ")
    base, tag = _stage(sf_dir)
    # Bucketed scans (and hence bucket pruning) stay enabled even when
    # no join needs the distribution — scan-level pruning is the point.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    postings = spark.table(f"bm25_postings_{tag}")
    stats = spark.read.parquet(str(base / "stats"))
    corpus = spark.read.parquet(str(base / "corpus"))
    terms = sorted({t for _, t in qterms})
    q = spark.createDataFrame(qterms, "q_id long, tok string")
    scored = (
        postings.filter(F.col("tok").isin(terms))
        .join(F.broadcast(q), "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .join(F.broadcast(stats), "tok")
        .crossJoin(F.broadcast(corpus))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.expr(milli_sql)).cast("long").alias("score_milli"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score_milli").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )
