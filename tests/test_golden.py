"""Golden collection-literal result tests — the reference's test entry
point compares query output against a nested-collection LITERAL
(``x should evaluateTo("collection()")``,
DistributedQueryEngine.diff:285-287, over the two-table Hive fixture at
diff:262-277). Same pattern here: run a nested-aggregation plan, compare
the COMPLETE result against an inline literal value, not an oracle
engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_query_engine_spark.catalog import Tables


def test_join_groupby_collect_matches_literal(spark):
    # The reference fixture shape (diff:262-277): table1/table2 with
    # (id, name) rows John/Jane/Doe, joined and nested.
    table1 = spark.createDataFrame(
        [(1, "John"), (2, "Jane")], "id int, name string"
    )
    table2 = spark.createDataFrame(
        [(1, "Doe"), (2, "Doe")], "id int, name string"
    )
    result = (
        table1.join(table2.withColumnRenamed("name", "surname"), "id")
        .groupBy("surname")
        .agg(F.sort_array(F.collect_list("name")).alias("names"))
        .collect()
    )
    # evaluateTo(collection(...)): one literal, whole value.
    assert [r.asDict() for r in result] == [
        {"surname": "Doe", "names": ["Jane", "John"]}
    ]


def test_nested_collection_golden_literal_sf0001(spark, sf_dir):
    # Deterministic testdata (seed=42) → the full nested result is a
    # stable literal: regions with their sorted nation collections.
    t = Tables(spark, sf_dir)
    rows = (
        t.region.join(t.nation, t.nation.n_regionkey == t.region.r_regionkey)
        .groupBy("r_name")
        .agg(F.sort_array(F.collect_list("n_name")).alias("nations"))
        .orderBy("r_name")
        .collect()
    )
    assert [(r.r_name, r.nations) for r in rows] == [
        ("AFRICA", ["NATION_0", "NATION_10", "NATION_15", "NATION_20", "NATION_5"]),
        ("AMERICA", ["NATION_1", "NATION_11", "NATION_16", "NATION_21", "NATION_6"]),
        ("ASIA", ["NATION_12", "NATION_17", "NATION_2", "NATION_22", "NATION_7"]),
        ("EUROPE", ["NATION_13", "NATION_18", "NATION_23", "NATION_3", "NATION_8"]),
        ("MIDDLE EAST", ["NATION_14", "NATION_19", "NATION_24", "NATION_4", "NATION_9"]),
    ]
