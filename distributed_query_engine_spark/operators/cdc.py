"""CDC merge/upsert: apply a change batch (update/delete/insert ops) to
a dimension snapshot — the MERGE statement's semantics without a table
format, shaped for scale: the snapshot is scanned ONCE and joined to the
(tiny) batch via broadcast, never shuffled (the naive full-outer MERGE
plan exchanges the whole snapshot).

Shared by the batch query (plans/analytic.merge_upsert_cdc) and the
streaming maintenance loop (streaming/ops.stream_cdc_apply): both build
the change batch with :func:`cdc_batch` and apply it with
:func:`apply_cdc`, so the one-shot merge is provably the same
computation the micro-batch loop folds over — which is what makes an
exact oracle possible for the streaming variant (batches partition the
key space, merges on disjoint keys commute, so the final snapshot is
order-independent and equal to the one-shot result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Insert keys live in fresh key-space above any tested snapshot's max.
INSERT_OFFSET = 1_000_000

# The DuckDB twin of cdc_batch + apply_cdc over the `customer` view —
# the oracle for BOTH the batch query and the streaming loop.
MERGE_ORACLE_SQL = """
    WITH cdc AS (
      SELECT c_custkey AS k, 'U' AS op, c_acctbal + 100.0 AS new_bal
      FROM customer WHERE c_custkey % 97 = 0
      UNION ALL
      SELECT c_custkey, 'D', NULL
      FROM customer WHERE c_custkey % 89 = 3 AND c_custkey % 97 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, 'I', 0.0
      FROM customer WHERE c_custkey % 101 = 5
    )
    SELECT s.c_custkey, s.c_name, s.c_nationkey,
           CASE WHEN c.op = 'U' THEN c.new_bal ELSE s.c_acctbal END
             AS c_acctbal,
           s.c_mktsegment
    FROM customer s LEFT JOIN cdc c ON s.c_custkey = c.k
    WHERE c.op IS NULL OR c.op = 'U'
    UNION ALL
    SELECT k, 'Customer#' || CAST(k AS VARCHAR),
           CAST(k % 25 AS INTEGER), 0.0, 'NEW'
    FROM cdc WHERE op = 'I'
    """


def cdc_batch(snapshot: DataFrame) -> DataFrame:
    """Derive a deterministic change batch (k, op, new_bal) from the
    snapshot itself, so the oracle can replay the identical merge:
    updates (keys % 97, balance +100), deletes (% 89, made disjoint
    from updates), inserts (% 101, keys offset into fresh key-space).
    The op classes are mutually exclusive per key by construction."""
    k = F.col("c_custkey")
    updates = snapshot.filter(k % 97 == 0).select(
        k.alias("k"),
        F.lit("U").alias("op"),
        (F.col("c_acctbal") + 100.0).alias("new_bal"),
    )
    deletes = snapshot.filter((k % 89 == 3) & (k % 97 != 0)).select(
        k.alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_bal"),
    )
    inserts = snapshot.filter(k % 101 == 5).select(
        (k + INSERT_OFFSET).alias("k"),
        F.lit("I").alias("op"),
        F.lit(0.0).alias("new_bal"),
    )
    return updates.unionByName(deletes).unionByName(inserts)


def apply_cdc(snapshot: DataFrame, cdc: DataFrame) -> DataFrame:
    """ONE snapshot scan + broadcast left join against the batch
    (deletes filtered, updates coalesced in the projection) + a union
    of synthesized insert rows. The snapshot never shuffles; at 100 TB
    this is the whole point (plan-asserted in tests/test_plans.py)."""
    merged = (
        snapshot.join(
            F.broadcast(cdc.filter(F.col("op") != "I")),
            snapshot["c_custkey"] == F.col("k"),
            "left",
        )
        .filter(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.when(F.col("op") == "U", F.col("new_bal"))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    new_rows = cdc.filter(F.col("op") == "I").select(
        F.col("k").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("k").cast("string")).alias("c_name"),
        (F.col("k") % 25).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return merged.unionByName(new_rows)
