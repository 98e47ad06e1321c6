"""Query/operator registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2.3 registers itself here with a name, a
``(spark, sf_dir) -> DataFrame`` builder, and (where SQL-expressible) a
DuckDB oracle SQL string — the modern form of the reference's golden-value
matcher (``x should evaluateTo("collection()")``,
``DistributedQueryEngine.diff:285-287``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query. ``oracle`` is ANSI SQL DuckDB runs over the
    same parquet tables (views: region nation customer supplier part
    orders lineitem events documents embeddings). Omit ``oracle`` only for
    genuinely non-SQL-expressible operators (driver then records a weaker
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver invokes queries with ITS OWN vanilla session;
            # apply our runtime-settable defaults (UTC timezone, AQE,
            # Arrow) so results don't depend on the caller's conf.
            from distributed_query_engine_spark.session import tune_session

            tune_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import distributed_query_engine_spark.plans  # noqa: F401 — populates registry

    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    import distributed_query_engine_spark.plans  # noqa: F401

    return dict(_ORACLES)
