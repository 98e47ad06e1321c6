"""transformWithStateInPandas — the genuine TWS path (VERDICT r14 item 6).

Through r14 ``stream_stateful_tws`` silently fell back to the
applyInPandasWithState twin because no ``google.protobuf`` was
importable. r15 wires the container's Google Cloud SDK bundled
pure-Python protobuf runtime into the session's spawned workers
(ops.enable_tws: sc.environment PYTHONPATH + protobuf's own
TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK escape hatch for the
6.33-gencode/6.32-runtime skew) and pins the RocksDB provider the
operator requires. These tests pin that the REAL API is exercised and
that its results are exactly the batch aggregate — under both state
providers for the GWS twin, and under RocksDB (mandatory) for TWS.
"""

from __future__ import annotations

import pytest

from distributed_query_engine_spark.streaming import ops


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tws_available_in_this_container():
    """The capability pin: if this starts failing the environment lost
    its protobuf runtime and stream_stateful_tws is silently exercising
    the fallback — the CORRECTNESS row would stay green but stop
    witnessing the TWS protocol."""
    assert ops.tws_available()


def test_tws_runs_the_real_operator_and_matches_batch(spark, sf_dir):
    """End-to-end TWS == GWS == batch aggregate, and the executed plan
    is genuinely TransformWithStateInPySpark (not the fallback)."""
    from pyspark.sql import functions as F

    assert ops.enable_tws(spark)
    ev = ops.read_events_stream(spark, sf_dir)
    tws_op = ops.stateful_type_stats_tws(ev)
    # the streaming frame's plan carries the TWS node
    assert "TransformWithStateInPySpark" in tws_op._jdf.queryExecution().toString()
    with ops._rocksdb_state_store(spark):
        got = _rows(
            ops.run_to_memory(tws_op, "mem_tws_test", "update")
        )
    gws = _rows(
        ops.run_to_memory(
            ops.stateful_type_stats_gws(ops.read_events_stream(spark, sf_dir)),
            "mem_gws_test",
            "update",
        )
    )
    from distributed_query_engine_spark.catalog import Tables

    batch = _rows(
        Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
    )
    assert got == gws == batch


def test_gws_twin_provider_parity(spark, sf_dir):
    """The GWS twin is provider-agnostic: identical rows under the
    HDFS-backed default and RocksDB (TWS itself cannot run under HDFS —
    typed handles need multiple column families, pinned below)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    from distributed_query_engine_spark.session import _STATE_STORE_PROVIDERS

    results = {}
    prev = spark.conf.get(key, None)
    try:
        for provider in ("hdfs", "rocksdb"):
            spark.conf.set(key, _STATE_STORE_PROVIDERS[provider])
            results[provider] = _rows(
                ops.run_to_memory(
                    ops.stateful_type_stats_gws(
                        ops.read_events_stream(spark, sf_dir)
                    ),
                    f"mem_gws_{provider}",
                    "update",
                )
            )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert results["hdfs"] == results["rocksdb"]


def test_tws_requires_rocksdb_provider(spark, sf_dir):
    """Pin the REQUIREMENT the _rocksdb_state_store context encodes:
    under the HDFS provider the TWS operator fails with the
    multiple-column-families error, not a silent wrong answer."""
    key = "spark.sql.streaming.stateStore.providerClass"
    from distributed_query_engine_spark.session import _STATE_STORE_PROVIDERS

    assert ops.enable_tws(spark)
    prev = spark.conf.get(key, None)
    spark.conf.set(key, _STATE_STORE_PROVIDERS["hdfs"])
    try:
        with pytest.raises(Exception, match="COLUMN_FAMILIES|column famil"):
            ops.run_to_memory(
                ops.stateful_type_stats_tws(
                    ops.read_events_stream(spark, sf_dir)
                ),
                "mem_tws_hdfs",
                "update",
            )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
