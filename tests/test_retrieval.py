"""Sparse/hybrid retrieval family (plans/retrieval.py): result-shape
invariants DuckDB repr-compare can't see, plus the physical-plan claims
the docstrings make (posting heads limited BEFORE collection, panel
relations broadcast, shard manifest shuffle-free up to its 64-row agg).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_query_engine_spark.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(name, spark, sf_dir):
    return all_queries()[name](spark, sf_dir)


def test_inverted_index_postings_sorted_and_bounded(spark, sf_dir):
    rows = _q("llm_inverted_index", spark, sf_dir).collect()
    assert rows
    for r in rows:
        # postings_head is SERIALIZED (comma-joined) — a top-level array
        # column would not survive the driver's pandas canonicalizer.
        head = [int(x) for x in r.postings_head.split(",")]
        assert 1 <= len(head) <= 8
        assert head == sorted(head)
        assert len(head) == min(r.df, 8)
        assert r.cf >= r.df  # every posting contributes >= 1 occurrence


def test_inverted_index_head_is_window_limited(spark, sf_dir):
    # The rn<=8 head must be a WindowGroupLimit (map-side partial limit),
    # not a full collect_list + slice: no executor ever materializes a
    # stopword's complete posting list.
    plan = _plan(_q("llm_inverted_index", spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "slice(" not in plan


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    rows = _q("llm_bm25_topk", spark, sf_dir).collect()
    assert len(rows) == 25  # 5 queries x top-5
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.doc_id != r.q_id
        assert r.score_milli > 0
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        scores = [r.score_milli for r in rs]
        assert scores == sorted(scores, reverse=True), (q, scores)


def test_bm25_panel_relations_broadcast(spark, sf_dir):
    # qterms / dfreq / corpus are panel- or vocabulary-sized: all must
    # ride broadcast joins; the corpus-sized tf relation must never be
    # the build side.
    plan = _plan(_q("llm_bm25_topk", spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_fuses_both_rankers(spark, sf_dir):
    rows = _q("llm_hybrid_rrf", spark, sf_dir).collect()
    assert len(rows) == 25
    # A doc ranked #1 by BOTH rankers would score 2*floor(1e6/61); a doc
    # present in only one list tops out at floor(1e6/61). Every fused
    # score must be a sum of at most two valid contributions.
    max_single = 1_000_000 // 61
    for r in rows:
        assert 0 < r.rrf_scaled <= 2 * max_single
        assert r.doc_id != r.q_id


def test_rrf_agrees_with_component_rankers(spark, sf_dir):
    # Recompute RRF driver-side from the two registered rankers at the
    # same depth and compare the fused top-5 exactly.
    from distributed_query_engine_spark.operators import similarity as S
    from distributed_query_engine_spark.catalog import Tables
    from distributed_query_engine_spark.plans.retrieval import (
        _RRF_DEPTH,
        _RRF_K,
        _RRF_SCALE,
        _Q_IDS,
        _bm25_ranks,
    )

    sparse = {
        (r.q_id, r.doc_id): r.rn
        for r in _bm25_ranks(spark, sf_dir).collect()
    }
    dense = {
        (r.q_id, r.vec_id): r.rn
        for r in S.topk_cosine(
            Tables(spark, sf_dir).embeddings, _Q_IDS, k=_RRF_DEPTH
        ).collect()
    }
    fused: dict[tuple, int] = {}
    for key, rn in list(sparse.items()) + list(dense.items()):
        fused[key] = fused.get(key, 0) + _RRF_SCALE // (_RRF_K + rn)
    expect = {}
    for q in _Q_IDS:
        cand = [(s, d) for (qq, d), s in fused.items() if qq == q]
        cand.sort(key=lambda t: (-t[0], t[1]))
        expect[q] = cand[:5]
    got: dict[int, list] = {q: [] for q in _Q_IDS}
    for r in sorted(
        _q("llm_hybrid_rrf", spark, sf_dir).collect(), key=lambda r: (r.q_id, r.rn)
    ):
        got[r.q_id].append((r.rrf_scaled, r.doc_id))
    assert got == expect


def test_corpus_shuffle_manifest_conserves_corpus(spark, sf_dir):
    man = _q("llm_corpus_shuffle", spark, sf_dir).collect()
    assert 1 <= len(man) <= 64
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = d.count()
    n_tok = d.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert sum(r.n_docs for r in man) == n_docs
    assert sum(r.n_tokens for r in man) == n_tok
    for r in man:
        assert r.first_key <= r.last_key


def test_corpus_shuffle_is_map_side_plus_tiny_agg(spark, sf_dir):
    # The manifest must cost exactly one shuffle (the 64-group agg);
    # no GLOBAL sort anywhere — the total order is (shard, skey) by
    # construction. (SortAggregate's within-partition sorts print as
    # `Sort [...], false, 0` — the `false` is the global flag.)
    plan = _plan(_q("llm_corpus_shuffle", spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "], true, 0" not in plan and "SinglePartition" not in plan


def test_bm25_index_scan_bucket_prunes(spark, sf_dir):
    # The postings scan must read only the query terms' buckets — the
    # sparse analog of IVF partition pruning.
    import re

    plan = _plan(_q("llm_bm25_index", spark, sf_dir))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) <= int(m.group(2))
    assert "Bucketed: true" in plan


def test_bm25_index_matches_scan_everything(spark, sf_dir):
    # build-once/search-many contract: index search == full-scan BM25.
    idx = sorted(
        tuple(r) for r in _q("llm_bm25_index", spark, sf_dir).collect()
    )
    scan = sorted(
        tuple(r) for r in _q("llm_bm25_topk", spark, sf_dir).collect()
    )
    assert idx == scan


def test_bm25_index_fingerprint_skip_and_stale_sweep(spark, sf_dir, tmp_path):
    # A fingerprint hit skips the rebuild (the _PUBLISHED marker
    # persists); a regenerated corpus gets a fresh tag and the stale
    # sibling dir is swept.
    import shutil

    from distributed_query_engine_spark.operators import sparse as SP

    src = tmp_path / "corpus"
    src.mkdir()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    d.toPandas().to_parquet(src / "documents.parquet")
    docs = spark.read.parquet(str(src / "documents.parquet"))
    tag1 = SP.build_bm25_index(spark, docs, str(src))
    base1, _, _ = SP._stage(str(src))
    marker = base1 / "_PUBLISHED"
    mtime1 = marker.stat().st_mtime_ns
    assert SP.build_bm25_index(spark, docs, str(src)) == tag1
    assert marker.stat().st_mtime_ns == mtime1  # no rebuild on hit
    # regenerate the corpus -> new fingerprint, old dir swept
    d.limit(40).toPandas().to_parquet(src / "documents.parquet")
    docs2 = spark.read.parquet(str(src / "documents.parquet"))
    tag2 = SP.build_bm25_index(spark, docs2, str(src))
    assert tag2 != tag1
    assert not base1.exists()
    # r13: the sweep also DROPs the stale catalog entry, so no table can
    # dangle on a deleted path (r12 ADVICE)
    assert not spark.catalog.tableExists(f"bm25_postings_{tag1}")
    base2, _, _ = SP._stage(str(src))
    assert (base2 / "_PUBLISHED").exists()
    shutil.rmtree(base2, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS bm25_postings_{tag1}")
    spark.sql(f"DROP TABLE IF EXISTS bm25_postings_{tag2}")


def test_bm25_search_restores_planner_conf(spark, sf_dir):
    """r12 ADVICE: bm25_search_index must not leak the
    autoBucketedScan planner flag into the shared session — the pruned
    physical plan is forced (and cached on QueryExecution) while the
    flag is set, then the prior value is restored."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prior = spark.conf.get(key)
    df = _q("llm_bm25_index", spark, sf_dir)
    assert spark.conf.get(key) == prior
    # the cached physical plan still bucket-prunes after the restore
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan
    assert df.count() > 0


def test_bm25_incremental_matches_full_rebuild(spark, sf_dir):
    # Incremental-ingest contract: search over the append-mutated index
    # == search over the one-shot full build, bit-identical (modulo the
    # is_new ingest-batch flag).
    incr = sorted(
        (r.q_id, r.doc_id, r.score_milli, r.rn)
        for r in _q("llm_bm25_index_incremental", spark, sf_dir).collect()
    )
    full = sorted(
        tuple(r) for r in _q("llm_bm25_index", spark, sf_dir).collect()
    )
    assert incr == full


def test_bm25_incremental_scan_still_bucket_prunes(spark, sf_dir):
    # Appended part-files land in the SAME token-bucket layout, so the
    # postings scan keeps pruning to the query terms' buckets.
    import re

    plan = _plan(_q("llm_bm25_index_incremental", spark, sf_dir))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) <= int(m.group(2))


def test_bm25_append_is_batch_only_and_appends_partials(spark, sf_dir, tmp_path):
    # append_to_bm25_index must never rewrite existing index files
    # (ingest cost is the BATCH scan only), and stats/corpus gain
    # per-batch partial files whose SUM equals the full-corpus stats.
    from distributed_query_engine_spark.operators import sparse as SP

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    old, new = d.filter("doc_id % 3 != 0"), d.filter("doc_id % 3 = 0")
    base, tbl = tmp_path / "idx", "bm25_incr_unit_test"
    try:
        SP.write_bm25_index(spark, old, base, tbl)
        before = {
            p: p.stat().st_mtime_ns for p in (base / "postings").rglob("*.parquet")
        }
        SP.append_to_bm25_index(spark, new, base, tbl)
        after = {
            p: p.stat().st_mtime_ns for p in (base / "postings").rglob("*.parquet")
        }
        for p, m in before.items():
            assert after[p] == m, f"existing index file rewritten: {p}"
        assert len(after) > len(before)
        # summed partials == full-corpus stats
        from pyspark.sql import functions as F

        got = (
            spark.read.parquet(str(base / "corpus"))
            .agg(F.sum("n_docs"), F.sum("a_tok"))
            .first()
        )
        rel = SP.tf_dl_relation(d)
        want = rel.agg(
            F.countDistinct("doc_id"), F.sum("tf")
        ).first()
        assert tuple(got) == tuple(want)
        merged_df = (
            spark.read.parquet(str(base / "stats"))
            .groupBy("tok").agg(F.sum("df").alias("df"))
        )
        full_df = rel.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        assert sorted(map(tuple, merged_df.collect())) == sorted(
            map(tuple, full_df.collect())
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bm25_compaction_one_file_per_bucket_same_results(spark, sf_dir, tmp_path):
    """Compaction contract: post-compact postings hold exactly one file
    per non-empty bucket (appends had accumulated one per bucket per
    batch), search results are bit-identical, and the compacted stats
    fold to single-partial relations with unchanged totals."""
    from pyspark.sql import functions as F

    from distributed_query_engine_spark.operators import sparse as SP
    from distributed_query_engine_spark.plans.retrieval import _Q_IDS, _BM25_K

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    old, new = d.filter("doc_id % 4 != 0"), d.filter("doc_id % 4 = 0")
    base, tbl = tmp_path / "idx", "bm25_cmp_unit_test"
    try:
        SP.write_bm25_index(spark, old, base, tbl)
        SP.append_to_bm25_index(spark, new, base, tbl)
        files_before = len(list((base / "postings").glob("part-*.parquet")))
        ctbl = SP.compact_bm25_index(spark, base, tbl)
        files_after = len(
            list((base / "postings_compact").glob("part-*.parquet"))
        )
        assert files_after < files_before
        assert files_after <= SP.N_BUCKETS
        # one file per bucket id present (bucket id = the _NNNNN suffix
        # of a bucketed part file, not the leading task id)
        import re

        buckets = [
            re.search(r"_(\d{5})\.c", p.name).group(1)
            for p in (base / "postings_compact").glob("part-*.parquet")
        ]
        assert len(buckets) == len(set(buckets))
        qterms = [
            (r["q_id"], r["tok"])
            for r in SP.tf_dl_relation(d.filter(F.col("doc_id").isin(_Q_IDS)))
            .select(F.col("doc_id").alias("q_id"), "tok")
            .collect()
        ]
        before = sorted(
            tuple(r)
            for r in SP.bm25_search_index(
                spark, sf_dir, qterms, k=_BM25_K, base=base, tbl=tbl
            ).collect()
        )
        after = sorted(
            tuple(r)
            for r in SP.bm25_search_index(
                spark, sf_dir, qterms, k=_BM25_K, base=base, tbl=ctbl,
                compacted=True,
            ).collect()
        )
        assert before == after
        # folded stats: single partial, same totals
        assert len(list((base / "stats_compact").glob("part-*.parquet"))) == 1
        tot = spark.read.parquet(str(base / "corpus_compact")).collect()
        assert len(tot) == 1
        raw = (
            spark.read.parquet(str(base / "corpus"))
            .agg(F.sum("n_docs"), F.sum("a_tok"))
            .first()
        )
        assert (tot[0]["n_docs"], tot[0]["a_tok"]) == tuple(raw)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_compact")


def test_bm25_compact_search_still_bucket_prunes(spark, sf_dir):
    import re

    plan = _plan(_q("llm_bm25_index_compact", spark, sf_dir))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan


def test_stream_bm25_ingest_multibatch_and_matches_batch_index(spark, sf_dir):
    """The streaming ingest must run genuinely multi-batch (4 slices)
    and its final index search must equal the batch scan-everything
    BM25 — the append-order-independence contract."""
    from distributed_query_engine_spark.streaming import ops

    got = sorted(
        tuple(r) for r in _q("stream_bm25_ingest", spark, sf_dir).collect()
    )
    assert ops.LAST_RUN_BATCHES.get("bm25_ingest") == 4
    want = sorted(
        tuple(r) for r in _q("llm_bm25_topk", spark, sf_dir).collect()
    )
    assert got == want


def test_bm25_ingest_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: replaying a batch under the same
    batch_id must be a no-op (marker guard), never a double-append that
    inflates df/n_docs/a_tok."""
    from distributed_query_engine_spark.streaming.ops import _bm25_ingest_batch

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    b0, b1 = d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1")
    base, tbl = tmp_path / "idx", "bm25_replay_unit_test"
    try:
        _bm25_ingest_batch(spark, b0, 0, base, tbl)
        _bm25_ingest_batch(spark, b1, 1, base, tbl)
        n_post = spark.table(tbl).count()
        n_corpus = spark.read.parquet(str(base / "corpus")).count()
        # replay both batches (same ids) — nothing may change
        _bm25_ingest_batch(spark, b0, 0, base, tbl)
        _bm25_ingest_batch(spark, b1, 1, base, tbl)
        assert spark.table(tbl).count() == n_post
        assert spark.read.parquet(str(base / "corpus")).count() == n_corpus
        # a NEW batch id still applies
        _bm25_ingest_batch(spark, b0.limit(3), 2, base, tbl)
        assert spark.table(tbl).count() > n_post
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
