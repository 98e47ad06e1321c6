#!/usr/bin/env python
"""Per-action decomposition of the stream_ingest_dedup foreachBatch
body (guide §1): reproduces process() for each staged slice with a
timer around every eager action (gn checkpoint, pairs checkpoint, sink
write, store append), so each driver job's cost is attributed to a
specific code line in streaming/ops.py / operators/dedup.py.

Usage: python scripts/r16_ingest_decomp.py
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

spark = get_spark("r16-ingest-decomp")
spark.sparkContext.setLogLevel("ERROR")

d_all = Tables(spark, SF).documents
corpus = d_all.filter(F.col("doc_id") % 5 != 0)
tmp = Path(tempfile.mkdtemp(prefix="r16_decomp_"))
store = str(tmp / "store")
sink = tmp / "sink"
THRESHOLD = 0.5

t0 = time.perf_counter()
D.build_signature_store(spark, corpus, str(Path(store) / "b_init"), hashed=True)
print(f"store build: {time.perf_counter() - t0:.2f}s (outside timed region)")

slices = ops._stage_docs_sliced(spark, SF, 4)
slice_files = sorted((slices / "flat").glob("*.parquet"))
print(f"{len(slice_files)} slice files")


def timed(label, f):
    t = time.perf_counter()
    r = f()
    sec = time.perf_counter() - t
    print(f"  {label:34s} {sec:7.3f}s", flush=True)
    return r, sec


totals: dict[str, float] = {}
for bi, sf_file in enumerate(slice_files):
    print(f"batch {bi}:")
    batch_df = spark.read.schema(ops._DOCS_SCHEMA).parquet(str(sf_file))
    sink_b = sink / f"b{bi}"
    store_b = Path(store) / f"b{bi}"
    secs: dict[str, float] = {}

    _, secs["store_write"] = timed(
        "gn write to store_b (parquet)",
        lambda: D.signature_groups(
            D.signatures_rowlocal(batch_df, spread=False)
        ).write.mode("overwrite").parquet(str(store_b)),
    )
    gn = spark.read.parquet(str(store_b))
    prior = sorted(
        str(p) for p in Path(store).iterdir()
        if p.is_dir() and p != store_b and not p.name.startswith("_")
    )
    report = D.incremental_dedup_from_store(
        spark, store, d_all, batch_df, threshold=THRESHOLD, hashed=True,
        batch_groups=gn, store_dirs=prior,
    )
    both_batch = F.col("dup_of") % 5 == 0
    normalized = report.select(
        F.when(both_batch, F.greatest("new_doc", "dup_of"))
        .otherwise(F.col("new_doc"))
        .alias("new_doc"),
        F.when(both_batch, F.least("new_doc", "dup_of"))
        .otherwise(F.col("dup_of"))
        .alias("dup_of"),
        "jaccard",
        "is_dup",
    )
    _, secs["sink_write"] = timed(
        "sink write (verify)",
        lambda: normalized.write.mode("overwrite").parquet(str(sink_b)),
    )
    print(f"  {'batch total':34s} {sum(secs.values()):7.3f}s")
    for k, v in secs.items():
        totals[k] = totals.get(k, 0.0) + v

print("totals over 4 batches:")
for k, v in totals.items():
    print(f"  {k:34s} {v:7.3f}s")
print(f"  {'TOTAL':34s} {sum(totals.values()):7.3f}s")
shutil.rmtree(tmp, ignore_errors=True)
