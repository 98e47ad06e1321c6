#!/usr/bin/env python
"""Capture the per-batch ingest report plan (the foreachBatch body's
candidate+verify DAG) as .explain("formatted") for plans/r16 — the
bench's stream_ingest_dedup registry entry only exposes the sink read,
so the plan the optimization actually changed is captured here.

Usage: python scripts/r16_capture_ingest_plan.py <tag>
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
import os  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "after"

from pyspark.sql import functions as F  # noqa: E402

from distributed_query_engine_spark.catalog import Tables  # noqa: E402
from distributed_query_engine_spark.operators import dedup as D  # noqa: E402
from distributed_query_engine_spark.session import get_spark  # noqa: E402
from distributed_query_engine_spark.streaming import ops  # noqa: E402

spark = get_spark("r16-capture-ingest")
spark.sparkContext.setLogLevel("ERROR")

d_all = Tables(spark, SF).documents
corpus = d_all.filter(F.col("doc_id") % 5 != 0)
tmp = Path(tempfile.mkdtemp(prefix="r16_cap_"))
store = str(tmp / "store")
slices = ops._stage_docs_sliced(spark, SF, 4)
slice_files = sorted((slices / "flat").glob("*.parquet"))
b0 = spark.read.schema(ops._DOCS_SCHEMA).parquet(str(slice_files[0]))
batch_df = spark.read.schema(ops._DOCS_SCHEMA).parquet(str(slice_files[1]))

new_layout = "store_dirs" in D.incremental_dedup_from_store.__code__.co_varnames
if new_layout:
    D.build_signature_store(
        spark, corpus, str(Path(store) / "b_init"), hashed=True
    )
    D.signature_groups(D.signatures_rowlocal(b0, spread=False)).write.mode(
        "overwrite"
    ).parquet(str(Path(store) / "b0"))
    D.signature_groups(
        D.signatures_rowlocal(batch_df, spread=False)
    ).write.mode("overwrite").parquet(str(Path(store) / "b1"))
    gn = spark.read.parquet(str(Path(store) / "b1"))
    prior = [str(Path(store) / "b_init"), str(Path(store) / "b0")]
    report = D.incremental_dedup_from_store(
        spark, store, d_all, batch_df, threshold=0.5, hashed=True,
        batch_groups=gn, store_dirs=prior,
    )
else:  # r15 layout: flat store + per-batch localCheckpointed gn
    D.build_signature_store(spark, corpus, store, hashed=True)
    g0 = D.signature_groups(D.signatures_rowlocal(b0, spread=False))
    g0.write.mode("overwrite").parquet(str(Path(store) / "b0"))
    gn = D.signature_groups(
        D.signatures_rowlocal(batch_df, spread=False)
    ).localCheckpoint()
    report = D.incremental_dedup_from_store(
        spark, store, d_all, batch_df, threshold=0.5, hashed=True,
        batch_groups=gn,
    )

plan = report._sc._jvm.PythonSQLUtils.explainString(
    report._jdf.queryExecution(), "formatted"
)
out = ROOT / "plans" / "r16" / f"ingest_report_{TAG}.txt"
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(plan)
import re  # noqa: E402

print(f"wrote {out}")
for pat in ("Exchange", "LocalCheckpoint|ExistingRDD", "Scan parquet",
            "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "ReusedExchange"):
    n = len(re.findall(pat, plan))
    print(f"  {pat}: {n}")
shutil.rmtree(tmp, ignore_errors=True)
