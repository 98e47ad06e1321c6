"""Order-independent (hence engine-reproducible) aggregates over doubles.

Floating-point ``SUM`` is order-dependent: Spark's partial/final hash
aggregation over 32+ partitions and DuckDB's sequential scan sum the same
doubles in different orders and disagree in low-order bits, which breaks
exact value-hash comparison. Casting to a wide decimal *before* summing
makes the aggregate exact and order-independent in both engines, so both
produce bit-identical results; the final cast back to double is exact at
our magnitudes (< 2**53 / 10**6).

Every Spark-side helper here has a documented DuckDB twin (used inside the
``oracle=`` strings) so the pair stays in lock-step:

    dsum(c)    ≡  CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE)
    davg(c)    ≡  CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) / COUNT(c)

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
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
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
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"{sql_dsum(expr)} / COUNT({expr})"
