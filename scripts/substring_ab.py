#!/usr/bin/env python
"""r9 A/B (VERDICT r8 item 3): time the substring-dedup family at sf1
(50k docs). A = lineage recompute of the gram fan-out (r8 shipped);
B = single materialized fan-out (localCheckpoint on the narrow
(doc_id, pos, gid) relation). Prints wall seconds per query.

Usage: python scripts/substring_ab.py [repeats]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from distributed_query_engine_spark.session import get_spark
from distributed_query_engine_spark.catalog import Tables
from distributed_query_engine_spark.operators import dedup as D

SF = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark("substring-ab")
spark.sparkContext.setLogLevel("ERROR")
docs = Tables(spark, SF).documents

for label, fn in [
    ("report", lambda: D.duplicated_span_report(docs)),
    ("top", lambda: D.top_duplicated_spans(docs)),
    ("mask", lambda: D.mask_duplicated_spans(docs)),
]:
    times = []
    for _ in range(REPS):
        t0 = time.time()
        n = fn().count()
        times.append(time.time() - t0)
    times.sort()
    print(f"{label}: median {times[REPS // 2]:.2f}s rows={n} all={[round(t,2) for t in times]}",
          flush=True)
