#!/usr/bin/env python
"""A/B the r11 de-globalized prefix scan against the single-partition
global window it replaced (VERDICT r11 item 6): same values by
construction (strict total orders), so this measures only the PLAN —
``partitioned_running`` (range exchange + per-partition window +
broadcast offsets) vs ``Window.orderBy`` with no partition (Exchange
SinglePartition + one-task sort).

Three shapes, mirroring the three consumers:
  pareto   — global running sum over orders (o_totalprice desc order)
  interval — sweep-line running sum over the exploded events endpoints
  rfm      — global rank over the customer-grain aggregate, x3 metrics

Usage: python scripts/prefix_ab.py [sf_dir ...]   (default .tmp/sf1)
Protocol: one discarded warm-up, median of 3, results count()-consumed.
The prefix cache is released between runs so every timing pays its own
materialization.
"""
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_query_engine_spark.catalog import Tables
from distributed_query_engine_spark.operators.prefix import (
    partitioned_running,
    release_prefix_cache,
)
from distributed_query_engine_spark.session import get_spark

spark = get_spark("prefix-ab")
spark.sparkContext.setLogLevel("ERROR")

sfs = sys.argv[1:] or [str(Path(__file__).resolve().parents[1] / ".tmp" / "sf1")]


def shapes(sf_dir):
    t = Tables(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def pareto_new():
        o = t.orders.select(
            "o_orderkey", cents.alias("cents"), "o_totalprice"
        )
        return partitioned_running(
            o,
            [F.col("o_totalprice").desc(), F.col("o_orderkey")],
            sum_cols=[("cents", "run_cents")],
        )

    def pareto_old():
        o = t.orders.select(
            "o_orderkey", cents.alias("cents"), "o_totalprice"
        )
        w = (
            Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return o.withColumn("run_cents", F.sum("cents").over(w))

    def _endpoints():
        e = t.events.select("event_id", "ts")
        return e.select(
            F.col("ts").alias("p"), F.lit(1).alias("d"), "event_id"
        ).unionByName(
            e.select(
                (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("p"),
                F.lit(-1).alias("d"),
                "event_id",
            )
        )

    def interval_new():
        return partitioned_running(
            _endpoints(),
            [F.col("p"), F.col("d"), F.col("event_id")],
            sum_cols=[("d", "concurrency")],
        )

    def interval_old():
        w = Window.orderBy("p", "d", "event_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return _endpoints().withColumn("concurrency", F.sum("d").over(w))

    def _rfm_base():
        return t.orders.groupBy("o_custkey").agg(
            F.unix_timestamp(F.max("o_orderdate")).cast("long").alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("m"),
        )

    def rfm_new():
        df = _rfm_base()
        for col, rk in (("r", "r_rk"), ("f", "f_rk"), ("m", "m_rk")):
            df = partitioned_running(
                df, [F.col(col).desc(), F.col("o_custkey")], rank_col=rk
            )
        return df

    def rfm_old():
        df = _rfm_base()
        for col, rk in (("r", "r_rk"), ("f", "f_rk"), ("m", "m_rk")):
            df = df.withColumn(
                rk,
                F.row_number().over(
                    Window.orderBy(F.col(col).desc(), "o_custkey")
                ),
            )
        return df

    return [
        ("pareto", pareto_new, pareto_old, ["run_cents"]),
        ("interval", interval_new, interval_old, ["concurrency"]),
        ("rfm", rfm_new, rfm_old, ["r_rk", "f_rk", "m_rk"]),
    ]


def timed(build, out_cols) -> float:
    """Consume by CHECKSUMMING the computed columns — a bare count()
    lets the optimizer prune the unused Window node entirely (the
    global-window arm then measures a scan, not the sort)."""
    release_prefix_cache()
    t0 = time.perf_counter()
    row = build().select(
        [F.expr(f"bit_xor(xxhash64({c}))").alias(c) for c in out_cols]
    ).first()
    assert row is not None
    return time.perf_counter() - t0


for sf_dir in sfs:
    for name, new, old, out_cols in shapes(sf_dir):
        timed(new, out_cols)  # warm-up (JIT/scan-cache symmetric)
        t_new = statistics.median(timed(new, out_cols) for _ in range(3))
        timed(old, out_cols)
        t_old = statistics.median(timed(old, out_cols) for _ in range(3))
        print(
            f"{Path(sf_dir).name} {name}: partitioned_running "
            f"{t_new:.2f}s vs global window {t_old:.2f}s "
            f"({t_old / t_new:.2f}x)",
            flush=True,
        )
spark.stop()
