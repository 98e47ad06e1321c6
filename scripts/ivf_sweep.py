#!/usr/bin/env python
"""r9 IVF knob sweep (VERDICT r8 item 2): measure recall@5 and candidate
fraction of the IVF path over the 25-query panel for a grid of
(n_cells, n_probe) at each SF, lowest_id strategy / lloyd 0 (the
oracle-replayable configuration). Goal: recall >= 0.8 at all three SFs
with candidate fraction <= ~35%.

Usage: python scripts/ivf_sweep.py [sf ...]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from pyspark.sql import functions as F

from distributed_query_engine_spark.session import get_spark
from distributed_query_engine_spark.operators import similarity as S

QIDS = list(range(25))
K = 5

spark = get_spark("ivf-sweep")
spark.sparkContext.setLogLevel("ERROR")

sfs = sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]
GRID = [(8, 2), (8, 3), (16, 4), (16, 5), (16, 6), (32, 8), (32, 10), (32, 12), (64, 16), (64, 20)]

for sf in sfs:
    emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
    n = emb.count()
    exact = S.topk_cosine(emb, QIDS, k=K).select("q_id", "vec_id").cache()
    exact.count()
    for n_cells, n_probe in GRID:
        scored = S.ivf_scored(emb, QIDS, n_cells=n_cells, n_probe=n_probe)
        ann = S.topk_with_count(scored, K)
        j = exact.join(ann.select("q_id", "vec_id"), ["q_id", "vec_id"], "inner")
        hits = j.count()
        cand = (
            S.ivf_candidate_counts(emb, QIDS, n_cells=n_cells, n_probe=n_probe)
            .agg(F.sum("n_candidates"))
            .collect()[0][0]
        ) or 0
        recall = hits / (len(QIDS) * K)
        frac = cand / (len(QIDS) * (n - 1))
        print(
            f"{sf} n={n} cells={n_cells:3d} probe={n_probe:3d} "
            f"recall={recall:.3f} cand_frac={frac:.3f}",
            flush=True,
        )
    exact.unpersist()
