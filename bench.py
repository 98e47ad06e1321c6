#!/usr/bin/env python
"""Headline benchmark: runs the flagship query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol (BASELINE.md): one discarded warm-up run per query, then the
median of 3 timed runs; results are fully consumed via a count+collect of
a bounded head, never a full driver materialization.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributed_query_engine_spark.registry import all_queries
from distributed_query_engine_spark.session import get_spark

BENCH_QUERIES = [
    "flagship",
    "join_inner_equi",
    "join_broadcast",
    "agg_count_distinct",
    "topk_per_group",
    "agg_rollup",
    "join_asof_event",
    "dedup_exact",
    "window_running_sum_frame",
    "scalar_string",
    "tpch_q5_region_revenue",
    "subquery_correlated",
    "window_sessionize_batch",
    "llm_dedup_minhash",
    "llm_similarity_topk",
    "llm_similarity_ann_lsh",
    "stream_tumbling_window_agg",
    # r11 (VERDICT r10 item 7): the recommended production ANN path —
    # a regression in the two-level compressed index design must be
    # driver-visible, not just oracle-correct.
    "llm_similarity_ivfpq",
    # r12 (VERDICT r11 item 8): the production corpus-ingest loop —
    # multi-batch streaming dedup against the mutating signature store.
    # Dominated by the per-batch verify of the twin-heavy synthetic
    # corpus (quadratic pair OUTPUT within twin groups — a data
    # property, see PLANS.md r11 ngram profile), so its absolute time
    # dwarfs the batch lines; benched to catch regressions in the
    # foreachBatch/store design, compared per-line, not in the total.
    "stream_ingest_dedup",
    # r13: the index-SERVING path — bucket-pruned BM25 search against
    # the materialized postings (the content-addressed build is a
    # fingerprint hit after the warm-up run, so the timed runs measure
    # search, which is what a deployment pays per query). A regression
    # here means bucket pruning or the broadcast-stats plan broke.
    "llm_bm25_index",
]

# Lines added after the r1 self-baseline (17 lines): excluded from the
# like-for-like legacy17 subtotal.
_POST_BASELINE_LINES = {
    "llm_similarity_ivfpq",
    "stream_ingest_dedup",
    "llm_bm25_index",
}


# Multi-batch STREAMING lines: walltime carries micro-batch scheduling
# and checkpoint-commit idle gaps on top of the actual work — measured
# +-20% run-to-run at sf0.1 (BASELINE.md r12), which blinded regression
# detection on the heaviest line. For these, the timing is the sum of
# per-batch triggerExecution durations reported by the engine
# (ops.LAST_RUN_EXEC_MS) — the deterministic work component; the
# protocol change and its measured band are documented in BASELINE.md
# r13. Maps bench name -> ops sink name.
_EXEC_MS_LINES = {"stream_ingest_dedup": "ingest_dedup"}


def run_once(fn, spark, sf_dir, name: str | None = None) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # Force full execution without shipping the whole result to the driver.
    n = df.count()
    assert n >= 0
    wall = time.perf_counter() - t0
    if name in _EXEC_MS_LINES:
        from distributed_query_engine_spark.streaming import ops

        exec_ms = ops.LAST_RUN_EXEC_MS.get(_EXEC_MS_LINES[name])
        if exec_ms:
            return exec_ms / 1000.0
    return wall


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="dqe-bench")
    queries = all_queries()
    names = [n for n in BENCH_QUERIES if n in queries]
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        # progress on stderr (stdout stays the one JSON line); printed
        # BEFORE the runs so an abort's last line names the query that
        # died, and again after with its timing
        print(f"bench: {name} ...", file=sys.stderr, flush=True)
        run_once(fn, spark, sf_dir, name)  # discarded warm-up
        timings[name] = round(
            statistics.median(run_once(fn, spark, sf_dir, name) for _ in range(3)), 4
        )
        print(f"bench: {name} {timings[name]}s", file=sys.stderr, flush=True)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_median_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # the r1 self-baseline total covers the original 17
                # lines; llm_similarity_ivfpq joined in r11 and
                # stream_ingest_dedup in r12, so this subtotal is the
                # like-for-like comparison against BASELINE.md (the
                # full `value` includes the new lines by construction).
                "legacy17_total_sec": round(
                    sum(
                        v
                        for n, v in timings.items()
                        if n not in _POST_BASELINE_LINES
                    ),
                    4,
                ),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
