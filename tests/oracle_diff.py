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
    return (9, str(type(v).__name__)), v


def rows_key(rows, cols, rel: float = 0.0):
    """Sort columns by name then rows canonically → comparable list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_canon(vals[i], rel) for i in order))
    return sorted(out, key=repr)


def assert_same_result(spark_df, duck_rel, rel: float = 0.0):
    s_cols = [c.lower() for c in spark_df.columns]
    d_cols = [c.lower() for c in duck_rel.columns]
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = duck_rel.fetchall()
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
