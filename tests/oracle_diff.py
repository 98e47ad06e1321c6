"""Order-insensitive Spark-vs-DuckDB result comparison, mirroring the
driver's check (row count + schema width + sorted-values comparison).

Floats are compared exactly by default — our deterministic-aggregation
discipline (functions/deterministic.py) is supposed to make both engines
produce bit-identical doubles; a tolerance would hide regressions in that
discipline. Tests for genuinely approximate ops pass ``rel``.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pyarrow as pa
from pyspark.sql import types as T


def _canon(v, rel: float):
    if v is None:
        return (0, None)
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, float):
        if math.isnan(v):
            return (2, "nan")
        return (2, round(v, 12) if rel == 0.0 else v)
    if isinstance(v, (list, tuple)):
        return (3, tuple(_canon(x, rel) for x in v))
    if isinstance(v, dict):
        return (4, tuple(sorted((k, _canon(x, rel)) for k, x in v.items())))
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return (5, v.isoformat())
    if isinstance(v, int):
        return (6, v)
    if isinstance(v, (bytes, bytearray)):
        return (7, bytes(v))
    return (9, type(v).__name__, repr(v))


def spark_canon_type(dt: T.DataType) -> str:
    """Spark DataType → canonical Arrow-level type string (what the driver's
    type-sensitive value hash sees after Spark→Arrow conversion)."""
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.DecimalType):
        # decimal128 bytes are identical for equal scale regardless of
        # declared precision — precision differences don't change the hash.
        return f"decimal128(s={dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_canon_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_canon_type(dt.keyType)},{spark_canon_type(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name.lower()}:{spark_canon_type(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return f"?spark:{dt.simpleString()}"


def arrow_canon_type(t: pa.DataType) -> str:
    """pyarrow DataType (DuckDB ``.arrow()`` output) → canonical string."""
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_unsigned_integer(t):
        return f"u{t}"  # Spark can't produce these — always a mismatch
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_decimal(t):
        return f"decimal128(s={t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_canon_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{arrow_canon_type(t.key_type)},{arrow_canon_type(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name.lower()}:{arrow_canon_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return f"?arrow:{t}"


def assert_same_types(spark_df, duck_rel):
    """The driver's value hash is type-sensitive (DuckDB HUGEINT hashes
    differently from Spark BIGINT even for equal values) — compare the two
    engines' result types at the Arrow level, per column name."""
    s_types = {
        f.name.lower(): spark_canon_type(f.dataType) for f in spark_df.schema.fields
    }
    d_schema = duck_rel.arrow().schema
    d_types = {f.name.lower(): arrow_canon_type(f.type) for f in d_schema}
    mism = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if c in d_types and s_types[c] != d_types[c]
    }
    assert not mism, f"type mismatch (spark vs duckdb/arrow): {mism}"


def rows_key(rows, cols, rel: float = 0.0):
    """Sort columns by name then rows canonically → comparable list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_canon(vals[i], rel) for i in order))
    return sorted(out, key=repr)


def assert_driver_sortable(rows, cols):
    """Mirror the driver's ``_canon``: pandas ``sort_values`` over every
    column. Array/map/struct cells arrive as numpy arrays / lists / dicts
    — all unhashable — and raise TypeError from pandas' factorize, which
    is exactly how the driver killed ``scalar_string`` and
    ``agg_collect_nested`` in round 4. Running it here makes that a
    pre-commit failure instead of a driver-only one."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(cols))
    try:
        pdf.sort_values(list(pdf.columns))
    except TypeError as ex:
        raise AssertionError(
            "output not driver-canonicalizable (pandas sort_values raised "
            f"{ex!r}) — a top-level array/map/struct column must be "
            "serialized to a scalar (e.g. concat_ws / to_json)"
        ) from ex


def assert_same_result(spark_df, duck_rel, rel: float = 0.0):
    s_cols = [c.lower() for c in spark_df.columns]
    d_cols = [c.lower() for c in duck_rel.columns]
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert_same_types(spark_df, duck_rel)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = duck_rel.fetchall()
    assert_driver_sortable(s_rows, s_cols)
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs {len(d_rows)}"
    sk = rows_key(s_rows, s_cols, rel)
    dk = rows_key(d_rows, d_cols, rel)
    if rel > 0.0:
        for a, b in zip(sk, dk):
            _assert_close(a, b, rel)
    else:
        mism = [i for i, (a, b) in enumerate(zip(sk, dk)) if a != b]
        assert not mism, (
            f"{len(mism)} mismatched rows; first: {sk[mism[0]]} vs {dk[mism[0]]}"
        )


def _assert_close(a, b, rel):
    assert type(a) is type(b), f"{a!r} vs {b!r}"
    if isinstance(a, tuple):
        assert len(a) == len(b), f"{a!r} vs {b!r}"
        for x, y in zip(a, b):
            _assert_close(x, y, rel)
    elif isinstance(a, float):
        assert math.isclose(a, b, rel_tol=rel, abs_tol=rel), f"{a} vs {b}"
    else:
        assert a == b, f"{a!r} vs {b!r}"
