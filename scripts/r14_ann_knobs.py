#!/usr/bin/env python
"""ANN recall at DEPLOYMENT knobs (VERDICT r13 item 5).

The oracle-replayable queries pin n_cells=32 / n_probe=8 (25% probe
ratio) for determinism; the stated production regime is
suggest_n_cells ~ sqrt(corpus) with a 1-2% probe ratio, where the
graph hop's bridge edges are the recall-recovery mechanism. That
regime was an argument, not a measurement — this harness measures it
harness-side (no oracle needed): recall@5 vs exact cosine truth
(numpy, same integer-scaled vectors) for IVF vs IVF+graph across
probe ratios at sqrt-corpus cells.

Deployment shape throughout: the IVF and graph indexes are
MATERIALIZED ONCE per SF (build_ivf_index / build_graph_index — the
build-once/search-many economics the index queries establish) and
every (ratio, rung) cell is a search against the stored artifact, so
the per-cell cost is what a deployment pays per query batch.

Usage: python scripts/r14_ann_knobs.py [SF_DIR ...]
Defaults: .tmp/sf1 .tmp/sf3
Output: one markdown table per SF for BASELINE.md.
"""
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import numpy as np

from distributed_query_engine_spark.functions.vectors import SCALE
from distributed_query_engine_spark.operators import similarity as S
from distributed_query_engine_spark.session import get_spark

K = 5
PANEL = list(range(25))

spark = get_spark("r14-ann-knobs")
spark.sparkContext.setLogLevel("ERROR")

sfs = sys.argv[1:] or [
    str(Path(__file__).resolve().parents[1] / ".tmp" / "sf1"),
    str(Path(__file__).resolve().parents[1] / ".tmp" / "sf3"),
]

CLUSTERED = os.environ.get("DQE_ANN_CLUSTERED") == "1"

for SF in sfs:
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    if CLUSTERED:
        # the planted-cluster reshape (plans/llm/vector.py::
        # _clustered_embeddings) — the corpus family where low-probe
        # IVF actually MISSES (cluster mates scatter across quantizer
        # cells), i.e. where the graph hop has headroom; the uniform
        # corpus is recall-1.0 at even 1% probe at sqrt-cells. Staged
        # to parquet so both index builds read one stable source.
        from distributed_query_engine_spark.plans.llm.vector import (
            _clustered_embeddings,
        )

        staged = str(
            Path(__file__).resolve().parents[1]
            / ".tmp" / "annknobs" / f"{Path(SF).name}_clustered"
        )
        _clustered_embeddings(spark, SF).write.mode("overwrite").parquet(staged)
        e = spark.read.parquet(staged)
    n = e.count()
    n_cells = S.suggest_n_cells(n)
    # exact cosine truth over the SAME integer-scaled vectors
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.rint(
        np.array([r.embedding for r in rows], dtype=np.float64) * SCALE
    ).astype(np.int64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    by_id = {int(v): i for i, v in enumerate(ids)}
    truth = set()
    for q in PANEL:
        cos = (mat @ mat[by_id[q]]) / (nrm * nrm[by_id[q]])
        order = sorted(
            (-cos[i], int(ids[i])) for i in range(len(ids)) if int(ids[i]) != q
        )
        truth |= {(q, vid) for _, vid in order[:K]}

    tag = Path(SF).name + ("_clust" if CLUSTERED else "")
    scratch = Path(__file__).resolve().parents[1] / ".tmp" / "annknobs"
    scratch.mkdir(parents=True, exist_ok=True)
    idx_ivf = str(scratch / f"{tag}_ivf")
    idx_graph = str(scratch / f"{tag}_graph")
    t0 = time.perf_counter()
    S.build_ivf_index(e, idx_ivf, n_cells=n_cells)
    t_ivf_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    S.build_graph_index(e, idx_graph, n_cells=n_cells)
    t_graph_build = time.perf_counter() - t0

    print(
        f"\n== {SF}: corpus {n}, sqrt-cells {n_cells}, "
        f"index builds: ivf {t_ivf_build:.0f}s graph {t_graph_build:.0f}s =="
    )
    print("| probe ratio | n_probe | IVF recall@5 | +graph recall@5 | "
          "IVF med s | +graph med s |")
    print("|---|---|---|---|---|---|")
    for ratio in (0.01, 0.02, 0.05, 0.10):
        n_probe = max(1, round(ratio * n_cells))
        line = [f"{ratio:.0%}", str(n_probe)]
        times = {}
        for label, fn in (
            ("ivf", lambda: S.topk_cosine_ivf_index(
                spark, idx_ivf, PANEL, k=K, n_probe=n_probe)),
            ("graph", lambda: S.topk_cosine_graph_index(
                spark, idx_graph, PANEL, k=K, n_probe=n_probe)),
        ):
            fn().count()  # warm
            ts, hits = [], None
            # 2 timed passes: recall is deterministic (same plan, same
            # index) and local latency here is 138-partition task
            # overhead on a tiny corpus, not a deployment signal
            for _ in range(2):
                t0 = time.perf_counter()
                got = fn().collect()
                ts.append(time.perf_counter() - t0)
                hits = {(r.q_id, r.vec_id) for r in got}
            rec = len(hits & truth) / len(truth)
            line.append(f"{rec:.3f}")
            times[label] = statistics.median(ts)
        line += [f"{times['ivf']:.2f}", f"{times['graph']:.2f}"]
        print("| " + " | ".join(line) + " |", flush=True)

spark.stop()
