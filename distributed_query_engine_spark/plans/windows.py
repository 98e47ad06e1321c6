"""Window functions (SURVEY.md §2.3 — no reference evidence; part of the
full Spark-grade surface the north star demands).

Scale note: every window here declares a PARTITION BY, so Spark plans one
shuffle on the partition key and sorts within partitions — the shape that
survives 100 TB. A window with no PARTITION BY collapses to a single
partition and is only acceptable on already-reduced data; global-order
statistics over fact-grain rows go through the two-pass prefix scan
instead (``window_ntile_percent`` below, on ``operators/prefix.py``).

Cross-engine type discipline: ranking functions return INT in Spark but
BIGINT in DuckDB — Spark results are cast to long so the driver's schema
comparison sees identical types.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_query_engine_spark.catalog import Tables
from distributed_query_engine_spark.functions.deterministic import DEC
from distributed_query_engine_spark.registry import query


@query(
    "window_rank_rownum_denserank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_rownum_denserank(spark, sf_dir):
    o = Tables(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark, sf_dir):
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_running_sum_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS VARCHAR) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_sum_frame(spark, sf_dir):
    # Running sum in exact decimal (see functions/deterministic.py): a
    # double prefix-sum would accumulate engine-specific rounding.
    o = Tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w)
        .cast("string")
        .cast("double")
        .alias("running_total"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, event_type, value,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY value
                          RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW)
             AS peers_within_10
    FROM events
    """,
)
def window_range_frame(spark, sf_dir):
    # RANGE frame over a numeric ordering: frame membership is defined by
    # value distance, so ties are handled identically by any engine (all
    # peers included) — no tiebreak column needed. The Python
    # Window.rangeBetween API only accepts integer offsets, so the
    # fractional-capable SQL frame syntax is used instead.
    e = Tables(spark, sf_dir).events
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.expr(
            "count(*) OVER (PARTITION BY event_type ORDER BY value "
            "RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW)"
        ).alias("peers_within_10"),
    )


@query(
    "window_time_rolling",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS cents_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_time_rolling(spark, sf_dir):
    """TIME-interval rolling window (the ops-dashboard staple: per-user
    activity over the trailing hour at every event). RANGE over the
    timestamp ordering makes frame membership a time predicate — ties
    include all peers, so results are engine-independent without a
    tiebreak column; the sum is integer cents, exact under any
    evaluation order. One shuffle on user_id; within a partition the
    frame is a sliding two-pointer over the sorted run, so cost is
    O(rows), not O(rows × frame)."""
    e = Tables(spark, sf_dir).events
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(f"count(*) {frame}").alias("n_last_hour"),
        F.expr(
            f"sum(cast(round(value * 100) as bigint)) {frame}"
        ).alias("cents_last_hour"),
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_percent(spark, sf_dir):
    """Global NTILE / PERCENT_RANK / CUME_DIST WITHOUT the unpartitioned
    window (which plans ``Exchange SinglePartition`` + a one-task sort —
    customer is SF-proportional, ~15 M rows at sf100, so the old
    dimension-table excuse did not hold; VERDICT r11 item 1). The
    distributed form: one global rank from the two-pass prefix scan
    (range exchange + per-partition row_number + broadcast offsets,
    :func:`~distributed_query_engine_spark.operators.prefix
    .partitioned_running`), then every output is pure arithmetic over
    (rank, n) — the order is strict (c_custkey tiebreak), so
    rank = row_number, percent_rank = (rk−1)/(n−1), cume_dist = rk/n,
    and ntile(4) is :func:`exact_ntile`'s integer CASE, byte-identical
    to the oracle's window ntile over the same total order. ``n`` is a
    scalar aggregate broadcast onto the ranked rows."""
    from distributed_query_engine_spark.operators.prefix import (
        exact_ntile,
        partitioned_running,
    )

    c = Tables(spark, sf_dir).customer.select("c_custkey", "c_acctbal")
    ranked = partitioned_running(
        c, ["c_acctbal", "c_custkey"], rank_col="_rk"
    )
    nrow = c.agg(F.count(F.lit(1)).alias("_n"))
    rk, n = F.col("_rk"), F.col("_n")
    return ranked.crossJoin(F.broadcast(nrow)).select(
        "c_custkey",
        exact_ntile(rk, n, 4).cast("long").alias("quartile"),
        F.when(n > 1, (rk - 1) / (n - 1)).otherwise(F.lit(0.0)).alias(
            "pct_rank"
        ),
        (rk / n).alias("cume"),
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id, value,
           median(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS rolling_median
    FROM events
    WHERE user_id < 8
    """,
)
def window_rolling_median(spark, sf_dir):
    """ROLLING MEDIAN over a trailing 5-row frame. Spark has no median
    window aggregate, and a Python UDAF would serialize every frame —
    instead the frame is collected with collect_list OVER the frame
    (bounded: 5 doubles of state), sorted, and the middle picked with
    pure array expressions; the even-count case averages the two middle
    values exactly as DuckDB's median does, so the oracle is the native
    window median. All JVM expression code — the pattern generalizes to
    any exact order statistic over BOUNDED frames at 100 TB (unbounded
    frames need a different algorithm; that's agg_median's job)."""
    ev = Tables(spark, sf_dir).events.filter(F.col("user_id") < 8)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        ((mid_lo + mid_hi) / 2).alias("rolling_median"),
    )
