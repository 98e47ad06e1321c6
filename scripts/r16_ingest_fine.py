#!/usr/bin/env python
"""Fine-grained decomposition of ONE ingest micro-batch's candidate +
verify pipeline (guide §1): times each sub-relation with the noop sink
from cold lineage, so stage cost = t(stage) - t(prefix), and counts the
key cardinalities. Uses batch 1 against a store holding the corpus +
batch 0 (the steady-state shape).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
import os  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from distributed_query_engine_spark.catalog import Tables  # noqa: E402
from distributed_query_engine_spark.operators import dedup as D  # noqa: E402
from distributed_query_engine_spark.session import get_spark  # noqa: E402
from distributed_query_engine_spark.streaming import ops  # noqa: E402

spark = get_spark("r16-ingest-fine")
spark.sparkContext.setLogLevel("ERROR")


def t(label, df, n=3):
    secs = []
    for i in range(n + 1):
        spark.sparkContext.setJobDescription(f"{label} [{i}]")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        secs.append(round(time.perf_counter() - t0, 3))
    print(f"{label:44s} warm={secs[0]:7.3f}  passes={secs[1:]}", flush=True)


d_all = Tables(spark, SF).documents
corpus = d_all.filter(F.col("doc_id") % 5 != 0)
tmp = Path(tempfile.mkdtemp(prefix="r16_fine_"))
store = str(tmp / "store")
D.build_signature_store(spark, corpus, store, hashed=True)

slices = ops._stage_docs_sliced(spark, SF, 4)
slice_files = sorted((slices / "flat").glob("*.parquet"))
b0 = spark.read.schema(ops._DOCS_SCHEMA).parquet(str(slice_files[0]))
batch_df = spark.read.schema(ops._DOCS_SCHEMA).parquet(str(slice_files[1]))
# advance the store by batch 0 (steady state: store = corpus + b0)
g0 = D.signature_groups(D.signatures_rowlocal(b0, spread=False))
g0.write.mode("overwrite").parquet(str(Path(store) / "b0"))

sig_cols = [f"m{i}" for i in range(D.N_HASHES)]
print(f"batch rows: {batch_df.count()}")

gn = D.signature_groups(
    D.signatures_rowlocal(batch_df, spread=False)
).localCheckpoint()
gc = spark.read.option("recursiveFileLookup", "true").parquet(store)
print(f"|gc| groups: {gc.count()}  |gn| groups: {gn.count()}")
print(f"store files: {[p.name for p in Path(store).rglob('*.parquet')]}")

t("gc scan only", gc)
bands_c = D.lsh_bands(gc.select(F.col("rep").alias("doc_id"), *sig_cols))
t("bands_c (store bands)", bands_c)
bands_n = D.lsh_bands(gn.select(F.col("rep").alias("doc_id"), *sig_cols))
a = bands_c.alias("a")
b = bands_n.alias("b")
earlier_collision = F.exists(
    F.sequence(F.lit(0), F.col("band") - 1),
    lambda j: F.col("a.band_keys")[j] == F.col("b.band_keys")[j],
)
first_band = F.when(F.col("band") == 0, F.lit(True)).otherwise(~earlier_collision)
rep_pairs = (
    a.join(F.broadcast(b), ["band", "band_key"])
    .filter(first_band)
    .select(F.col("b.doc_id").alias("nrep"), F.col("a.doc_id").alias("crep"))
)
t("rep_pairs (band join)", rep_pairs)
print(f"|rep_pairs|: {rep_pairs.count()}")
par = D.SALT_GROUPS * 4
cross = (
    rep_pairs.join(
        gn.select(F.col("rep").alias("nrep"), F.col("members").alias("mn")), "nrep"
    )
    .join(
        gc.select(F.col("rep").alias("crep"), F.col("members").alias("mc")), "crep"
    )
    .select(F.explode("mn").alias("doc_a"), "mc")
    .repartition(par, "doc_a")
    .select("doc_a", F.explode("mc").alias("doc_b"))
)
t("cross (member expand)", cross)
within = D.candidate_pairs_grouped(batch_df and None or None, groups=gn) if False else None
within = D.candidate_pairs_grouped(None, groups=gn).select(
    F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
)
t("within (in-batch)", within)
pairs_lazy = cross.unionByName(within)
print(f"|pairs|: {pairs_lazy.count()}")

t0 = time.perf_counter()
pairs = pairs_lazy.localCheckpoint()
print(f"pairs localCheckpoint: {time.perf_counter() - t0:.3f}s")

hit_ids = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
t("hit_ids (from ckpt pairs)", hit_ids)
print(f"|hit_ids|: {hit_ids.count()}")
corpus_hits = d_all.join(hit_ids, "doc_id", "left_semi")
t("corpus_hits (semi join scan)", corpus_hits)
corpus_only = corpus_hits.join(batch_df.select("doc_id"), "doc_id", "left_anti")
ds_c = D.doc_hash_sets_rowlocal(corpus_only)
t("doc_sets corpus side (md5 hash)", ds_c)
doc_sets = ds_c.unionByName(D.doc_hash_sets_rowlocal(batch_df, spread=False))
report = D.exact_jaccard(pairs, threshold=0.5, doc_sets=doc_sets)
t("verify join (full report)", report)

# alternative hit_ids without touching pairs: members of hit store groups
hit_ids2 = (
    gc.join(rep_pairs.select(F.col("crep").alias("rep")).distinct(), "rep")
    .select(F.explode("members").alias("doc_id"))
    .distinct()
)
t("hit_ids2 (rep-join re-derive)", hit_ids2)
print(f"|hit_ids2|: {hit_ids2.count()}  (expect == |hit_ids| minus in-batch)")

shutil.rmtree(tmp, ignore_errors=True)
