"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over :mod:`distributed_query_engine_spark`: the operator
inventory (SURVEY.md §2.3) registers itself in
``distributed_query_engine_spark.registry``; this module exposes it in the
driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributed_query_engine_spark import registry  # noqa: E402
from distributed_query_engine_spark.session import tune_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary: scan → filter → hash agg → sort)
    on sf0.001; the driver smoke-checks rows ≥ 0 and a stable schema."""
    tune_session(spark)
    return registry.all_queries()["flagship"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return registry.all_oracles()
