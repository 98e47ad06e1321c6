"""Order-independent (hence engine-reproducible) aggregates over doubles.

Floating-point ``SUM`` is order-dependent: Spark's partial/final hash
aggregation over 32+ partitions and DuckDB's sequential scan sum the same
doubles in different orders and disagree in low-order bits, which breaks
exact value-hash comparison. Casting to a wide decimal *before* summing
makes the aggregate exact and order-independent in both engines, so both
produce bit-identical results.

The final decimal→double cast goes THROUGH A STRING on both sides
(r15). Once a total carries more significant digits than double's ~16
(first seen at the sf10 rung: 4.4e11 summed at 6 decimals = 18
digits), the direct casts diverge: DuckDB's decimal→double runs the
scaled int128 through double arithmetic and lands 1 ulp off the
correctly-rounded value (measured: 437890060870.53 → …52997), while
Spark/Java converts exactly — the same last-ulp cast-divergence class
as r7's pareto fix. Both engines' decimal→string is exact and their
string→double is a correctly-rounded strtod, so the string route makes
the conversion identical bit-for-bit at ANY magnitude the decimal can
hold — no int64-micros ceiling, unlike the r7 fix's accumulator swap.

Every Spark-side helper here has a documented DuckDB twin (used inside the
``oracle=`` strings) so the pair stays in lock-step:

    dsum(c)    ≡  CAST(CAST(SUM(CAST(c AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
    davg(c)    ≡  sql_dsum(c) / COUNT(c)

For products of doubles (e.g. ``l_extendedprice * (1 - l_discount)``) the
multiplication itself is IEEE-deterministic given identical inputs, so we
multiply in double then cast the *product* to decimal for the sum; doing
the arithmetic in decimal would instead hit Spark-vs-DuckDB differences in
decimal precision/scale promotion rules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double column (exact decimal internally)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("string").cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("string").cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def cents_sum(values) -> int:
    """Half-away-from-zero integer-cents sum for the pandas (Arrow) paths.

    pandas ``.round()`` is banker's half-to-even, but DuckDB ``round()``
    and Spark ``F.round`` are HALF_UP (away from zero for positives) —
    for values where ``value*100`` is exactly x.5 (e.g. 0.125, exactly
    representable) the three engines would disagree. This mirrors
    half-away-from-zero explicitly so every pandas-side cents aggregate
    matches the ``CAST(round(value * 100) AS BIGINT)`` oracle twin.
    """
    import numpy as np

    x = np.asarray(values, dtype="float64") * 100.0
    return int(np.sum(np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("int64"))


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` for use in oracle strings."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"


def sparksql_dsum(expr: str) -> str:
    """:func:`dsum` for SPARK-SQL query text (``spark.sql`` bodies):
    same string-routed conversion, but Spark's parser rejects bare
    ``VARCHAR`` — its unparameterized string type is ``STRING``."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS STRING) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"{sql_dsum(expr)} / COUNT({expr})"
