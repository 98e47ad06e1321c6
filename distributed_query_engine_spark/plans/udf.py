"""Python UDF surface (SURVEY.md §2.3): the four tiers, slowest to
fastest, each with an oracle where the computation is SQL-expressible so
the UDF machinery itself is what's being validated.

100 TB guidance encoded here: row-at-a-time ``@udf`` exists for API
completeness but the library position is that hot paths use built-ins
first, then Arrow-batched ``@pandas_udf`` (10-100× less serialization
overhead), then ``applyInPandas`` for whole-group logic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import StringType

from distributed_query_engine_spark.catalog import Tables
from distributed_query_engine_spark.registry import query


@query(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 10000 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def udf_python_scalar(spark, sf_dir):
    # Row-at-a-time Python UDF: one Python call per row, rows pickled
    # across the JVM↔Python boundary. Correct but the slow path — kept
    # as the API-parity demo; scalar_conditional is the codegen twin.
    @udf(returnType=StringType())
    def bucket(price: float) -> str:
        if price > 100000:
            return "big"
        if price > 10000:
            return "mid"
        return "small"

    o = Tables(spark, sf_dir).orders
    return o.select("o_orderkey", bucket("o_totalprice").alias("bucket"))


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
)
def udf_pandas_vectorized(spark, sf_dir):
    # Arrow-batched vectorized UDF: whole columns cross the boundary as
    # Arrow buffers, computation is numpy-vectorized. Same IEEE double
    # ops as the SQL expression → bit-identical to the oracle.
    @pandas_udf("double")
    def revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    l = Tables(spark, sf_dir).lineitem
    return l.select(
        "l_orderkey",
        "l_linenumber",
        revenue("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "udaf_pandas_grouped",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           MIN(l_quantity) AS qty_min,
           MAX(l_quantity) AS qty_max,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas_grouped(spark, sf_dir):
    # Whole-group custom aggregation via applyInPandas: each group
    # arrives as one pandas DataFrame. Sums are done in integer cents —
    # order-independent and exact — because a float sum inside pandas
    # would depend on post-shuffle row order. cents_sum rounds half away
    # from zero like DuckDB round() / Spark F.round (pandas .round() is
    # banker's and diverges on exact x.5 cents). At 100 TB the caveat is
    # group size: one group must fit in one executor's memory.
    from distributed_query_engine_spark.functions.deterministic import cents_sum

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "cnt": [len(pdf)],
                "qty_min": [pdf["l_quantity"].min()],
                "qty_max": [pdf["l_quantity"].max()],
                "price_cents": [cents_sum(pdf["l_extendedprice"])],
            }
        )

    l = Tables(spark, sf_dir).lineitem
    return l.groupBy("l_returnflag").applyInPandas(
        agg,
        "l_returnflag string, cnt long, qty_min double, qty_max double, price_cents long",
    )


@query(
    "udtf_python",
    oracle="""
    SELECT o.o_orderkey, t.seq
    FROM orders o
    JOIN (SELECT unnest(generate_series(1, 3)) AS seq) t
      ON t.seq <= mod(o.o_orderkey, 3) + 1
    """,
)
def udtf_python(spark, sf_dir):
    # Python UDTF (Spark ≥3.5): one input row → many output rows with a
    # declared schema (the generator analog of RAW's unnest).
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, seq bigint")
    class ExpandByKey:
        def eval(self, o_orderkey: int):
            for i in range(1, o_orderkey % 3 + 2):
                yield o_orderkey, i

    o = Tables(spark, sf_dir).orders
    o.select("o_orderkey").createOrReplaceTempView("_udtf_orders")
    spark.udtf.register("expand_by_key", ExpandByKey)
    return spark.sql(
        "SELECT t.o_orderkey, t.seq FROM _udtf_orders o, "
        "LATERAL expand_by_key(o.o_orderkey) t"
    )


@query(
    "udf_cogrouped_pandas",
    oracle="""
    WITH e AS (
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM events GROUP BY user_id
    ),
    o AS (
      SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS order_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(e.user_id, o.user_id) AS user_id,
           COALESCE(e.n_events, 0) AS n_events,
           COALESCE(e.value_cents, 0) AS value_cents,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.order_cents, 0) AS order_cents
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
)
def udf_cogrouped_pandas(spark, sf_dir):
    # Cogrouped applyInPandas — the two-relation custom-operator API:
    # both sides shuffle on the key once, then each (key, left-group,
    # right-group) pair arrives as a pandas DataFrame pair in one Python
    # worker call. This is the escape hatch for per-key merge logic no
    # join expresses (as-of interleave, sequence alignment, per-key
    # reconciliation); here the merged output is deliberately a
    # full-outer aggregate so DuckDB can state it exactly. Sums in
    # integer cents — order-independent and exact (see
    # udaf_pandas_grouped). At 100 TB the constraint is the same as any
    # grouped-UDF path: one key's pair of groups must fit in one worker.
    from distributed_query_engine_spark.functions.deterministic import cents_sum

    def merge(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(ev)],
                "value_cents": [cents_sum(ev["value"]) if len(ev) else 0],
                "n_orders": [len(od)],
                "order_cents": [cents_sum(od["o_totalprice"]) if len(od) else 0],
            }
        )

    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "value")
    od = t.orders.select(F.col("o_custkey").alias("user_id"), "o_totalprice")
    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id long, n_events long, value_cents long, "
            "n_orders long, order_cents long",
        )
    )


@query(
    "udtf_polymorphic",
    oracle="""
    SELECT n_nationkey,
           string_split(n_name, '_')[1] AS c0,
           string_split(n_name, '_')[2] AS c1
    FROM nation
    """,
)
def udtf_polymorphic(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark ≥4.0): the output schema is not
    declared statically but computed by a static ``analyze`` method
    from the call-site arguments — here ``split_cols(n_name, 2)``
    yields columns c0..c{n-1} for literal n, so the same UDTF serves
    any width. analyze() runs at PLAN time on the driver; eval() runs
    distributed — the contract that makes table functions schema-safe
    without per-use wrapper classes."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class SplitCols:
        @staticmethod
        def analyze(text, n):
            width = int(n.value)
            schema = StructType()
            for i in range(width):
                schema = schema.add(f"c{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            parts = (text or "").split("_")
            row = [parts[i] if i < len(parts) else None for i in range(n)]
            yield tuple(row)

    split_cols = udtf(SplitCols)
    spark.udtf.register("split_cols", split_cols)
    t = Tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("_udtf_nation")
    return spark.sql(
        "SELECT n.n_nationkey, t.c0, t.c1 FROM _udtf_nation n, "
        "LATERAL split_cols(n.n_name, 2) t"
    )


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                THEN 'expedite' ELSE 'standard' END AS lane
    FROM orders
    """,
)
def udf_arrow_scalar(spark, sf_dir):
    # The Spark 4 middle tier between row-Python and pandas_udf:
    # ``@udf(useArrow=True)`` keeps the per-row Python function
    # signature (no pandas required in user code) but ships batches as
    # Arrow buffers instead of pickled rows — the drop-in migration for
    # legacy row UDFs. Arithmetic mirrors the HALF_UP cents contract
    # (functions/deterministic.cents_sum) so the oracle is exact.
    @udf(returnType="cents long, lane string", useArrow=True)
    def classify(price: float, prio: str):
        import math

        cents = int(math.floor(abs(price * 100.0) + 0.5)) * (
            1 if price >= 0 else -1
        )
        lane = "expedite" if prio[:2] in ("1-", "2-") else "standard"
        return (cents, lane)

    o = Tables(spark, sf_dir).orders
    out = o.select(
        "o_orderkey", classify("o_totalprice", "o_orderpriority").alias("c")
    )
    return out.select("o_orderkey", "c.cents", "c.lane")


# ---------------------------------------------------------------------------
# SQL UDFs (Spark 4): CREATE FUNCTION ... RETURN <expr|query>. The fifth
# tier, and at 100 TB the PREFERRED one for any logic SQL can express:
# the body inlines into the plan at analysis time — no Python boundary,
# no serialization, full whole-stage codegen — while still giving users
# the reusable-function packaging the Python tiers provide. The plan
# tests assert the inlining (no BatchEvalPython / ArrowEvalPython node).
# ---------------------------------------------------------------------------


@query(
    "sql_udf_scalar",
    oracle="""
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS tier,
           CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY tier
    """,
)
def sql_udf_scalar(spark, sf_dir):
    """Scalar SQL UDFs (disc_price, qty_tier) applied in an aggregate
    over lineitem. The oracle inlines the bodies — which is exactly what
    Catalyst does with the UDF, so the equivalence IS the feature. The
    decimal-cast sum keeps the double aggregate order-independent
    (functions/deterministic.py discipline)."""
    Tables(spark, sf_dir).lineitem.createOrReplaceTempView("li_sqludf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_tier(q DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN q < 10 THEN 'low' WHEN q < 30 THEN 'mid' "
        "ELSE 'high' END"
    )
    return spark.sql(
        """
        SELECT qty_tier(l_quantity) AS tier,
               CAST(CAST(SUM(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM li_sqludf
        GROUP BY qty_tier(l_quantity)
        """
    )


@query(
    "sql_udf_table",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-01'
    GROUP BY l_returnflag
    """,
)
def sql_udf_table(spark, sf_dir):
    """Table-valued SQL UDF: a parameterized revenue report
    (``revenue_report(cutoff DATE) RETURNS TABLE``), invoked in the FROM
    clause. Catalyst inlines the body as a subquery against the view, so
    the cutoff predicate still pushes into the parquet scan — asserted
    in the plan test."""
    Tables(spark, sf_dir).lineitem.createOrReplaceTempView("li_sqltvf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION revenue_report(cutoff DATE)
        RETURNS TABLE(l_returnflag STRING, revenue DOUBLE, n_lines BIGINT)
        RETURN
          SELECT l_returnflag,
                 CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS revenue,
                 CAST(count(*) AS BIGINT) AS n_lines
          FROM li_sqltvf
          WHERE l_shipdate <= cutoff
          GROUP BY l_returnflag
        """
    )
    return spark.sql("SELECT * FROM revenue_report(DATE '1998-09-01')")
