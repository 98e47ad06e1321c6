#!/usr/bin/env python
"""A/B the AQE skew-join rescue (r13): session.py enables
spark.sql.adaptive.skewJoin by default — measure what it actually buys
on a deliberately skewed sort-merge join at the sf1 slice, instead of
citing it as folklore.

Shape: events (1M rows) with 70% of rows collapsed onto ONE join key,
sort-merge-joined (broadcast disabled) to a 200k-row build side keyed
the same way. Without skew handling, one task sorts/joins ~700k rows
while 31 idle; with it, AQE splits the hot partition into multiple
tasks. Wall time median of 3 per arm, same session, conf toggled per
run (AQE reads it at execution).

Usage: python scripts/skew_ab.py [SF_DIR]
"""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from distributed_query_engine_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else str(
    Path(__file__).resolve().parents[1] / ".tmp" / "sf1"
)
spark = get_spark("skew-ab")
spark.sparkContext.setLogLevel("ERROR")

ev = spark.read.parquet(f"{SF}/events.parquet")
# 70% of fact rows collapse onto key 0; the rest spread
fact = ev.select(
    F.when(F.pmod("event_id", F.lit(10)) < 7, F.lit(0))
    .otherwise(F.col("user_id"))
    .alias("k"),
    "value",
)
dim = (
    ev.limit(200_000)
    .select(
        F.when(F.pmod("event_id", F.lit(10)) < 7, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.col("event_type").alias("d"),
    )
    .groupBy("k")
    .agg(F.count(F.lit(1)).alias("d_n"))
)


def run() -> float:
    t0 = time.perf_counter()
    n = (
        fact.join(dim.hint("merge"), "k")
        .groupBy()
        .agg(F.count(F.lit(1)))
        .first()[0]
    )
    assert n > 0
    return time.perf_counter() - t0


spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
for arm, skew in (("skewJoin OFF", "false"), ("skewJoin ON", "true")):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
    run()  # warm-up
    med = statistics.median(run() for _ in range(3))
    print(f"{arm}: median {med:.2f}s", flush=True)
spark.stop()
