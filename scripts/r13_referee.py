#!/usr/bin/env python
"""r13 quiet-box referee (VERDICT r12 items 5/6/7): run on an otherwise
idle box.

1. stream_ingest_dedup at sf0.1 x5: wall vs per-batch triggerExecution
   sum — documents the tightened referee band (target <=10%).
2. llm_dedup_minhash at sf0.1 x5 isolated: the r12 drift check
   (band 2.8-3.6, r12 driver read 4.03).
3. kNN-graph refinement rung: latency + recall vs plain IVF at the
   given SF (pass .tmp/sf1 as argv[1] for the sf1 ladder point).
4. llm_bm25_index_incremental timing (build 90% + ingest 10% + search).

Usage: python scripts/r13_referee.py [SF_DIR]
"""
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from distributed_query_engine_spark.session import get_spark
from distributed_query_engine_spark.registry import all_queries
from distributed_query_engine_spark.streaming import ops
from distributed_query_engine_spark.operators import similarity as S

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("r13-referee")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()


def timed(fn, *a):
    t0 = time.perf_counter()
    r = fn(*a)
    n = r.count() if hasattr(r, "count") else r
    return time.perf_counter() - t0, n


def passes(name, k=5):
    walls, execs = [], []
    fn = qs[name]
    timed(fn, spark, SF)  # warm-up
    for _ in range(k):
        w, _n = timed(fn, spark, SF)
        walls.append(w)
        execs.append(ops.LAST_RUN_EXEC_MS.get("ingest_dedup", 0) / 1000.0)
    return walls, execs


def band(xs):
    lo, hi, med = min(xs), max(xs), statistics.median(xs)
    return f"median {med:.2f}s  range [{lo:.2f}, {hi:.2f}]  band +-{(hi - lo) / 2 / med * 100:.1f}%"


print(f"== referee at {SF} ==", flush=True)

if "0.1" in SF:
    walls, execs = passes("stream_ingest_dedup")
    print("[1] stream_ingest_dedup wall:", band(walls), flush=True)
    print("[1] stream_ingest_dedup exec:", band(execs), flush=True)

    fn = qs["llm_dedup_minhash"]
    timed(fn, spark, SF)
    ts = [timed(fn, spark, SF)[0] for _ in range(5)]
    print("[2] llm_dedup_minhash:", band(ts), flush=True)

e = spark.read.parquet(f"{SF}/embeddings.parquet")
panel = list(range(25))
k = 5
# cosine-exact truth for the cosine rungs; L2-exact truth (numpy over
# the same integer-scaled vectors) for the L2-metric ivfpq_rerank rung
# — each rung graded against ITS metric's brute-force top-k.
exact_cos = {(r.q_id, r.vec_id) for r in S.topk_cosine(e, panel, k=k).collect()}
import numpy as np

from distributed_query_engine_spark.functions.vectors import SCALE

rows_np = e.select("vec_id", "embedding").collect()
ids = np.array([r.vec_id for r in rows_np])
mat = np.rint(
    np.array([r.embedding for r in rows_np], dtype=np.float64) * SCALE
).astype(np.int64)
by_id = {int(v): i for i, v in enumerate(ids)}
exact_l2 = set()
for q in panel:
    dif = mat - mat[by_id[q]]
    d2 = (dif * dif).sum(axis=1)
    order = sorted(
        (int(d2[i]), int(ids[i])) for i in range(len(ids)) if int(ids[i]) != q
    )
    exact_l2 |= {(q, vid) for _, vid in order[:k]}
for label, fn, truth in (
    ("ivf", lambda: S.topk_cosine_ivf(e, panel, k=k), exact_cos),
    ("ivf_graph", lambda: S.topk_cosine_ivf_graph(e, panel, k=k), exact_cos),
    ("ivfpq_rerank", lambda: S.topk_l2_ivfpq_rerank(e, panel, k=k), exact_l2),
):
    try:
        fn().count()  # warm
        ts, hits = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn().collect()
            ts.append(time.perf_counter() - t0)
            hits = {(r.q_id, r.vec_id) for r in rows}
        rec = len(hits & truth) / len(truth)
        print(f"[3] {label}: recall@5 {rec:.3f}  median {statistics.median(ts):.2f}s", flush=True)
    except Exception as ex:
        print(f"[3] {label}: ERR {str(ex)[:120]}", flush=True)

t, n = timed(qs["llm_bm25_index_incremental"], spark, SF)
print(f"[4] llm_bm25_index_incremental: {t:.2f}s ({n} rows)", flush=True)
t, n = timed(qs["llm_bm25_index"], spark, SF)
print(f"[4] llm_bm25_index (full build): {t:.2f}s ({n} rows)", flush=True)
spark.stop()
