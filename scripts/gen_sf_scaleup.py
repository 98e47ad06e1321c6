#!/usr/bin/env python
"""Deterministic scale-up of the driver's testdata (VERDICT r6 item 6).

The sf-generator itself lives driver-side (TESTDATA.md: seed=42,
read-only), so an sf1 slice is synthesized here by exact K-fold
replication of sf0.1 with key-space shifting: copy c adds c·STRIDE to
every entity key (order, customer, supplier, part, event, doc, vec),
preserving the schema, the value distributions, every FK relationship,
and the orders↔lineitem fan-out — which is exactly what the physical
plans stress (shuffle widths, broadcast sizes, state populations,
LSH bucket geometry). Region/nation stay fixed (they are fixed-size
dimensions at every TPC-H SF). Events keep their timestamps (the
streaming/windowing key population is time × key; copies widen the key
axis the way a bigger deployment would).

Caveat recorded in BASELINE.md: replication makes every document/
embedding an exact K-plicate, so dedup-family RESULTS are degenerate
at sf1 (every doc has K−1 exact twins) — fine for throughput
measurement, meaningless for recall/selectivity tuning. The text/
vector payloads are left byte-identical on purpose: synthesizing novel
text here would silently diverge from the driver's distribution.

Usage: python scripts/gen_sf_scaleup.py [K] [SRC] [DST]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=<repo>/.tmp/sf1
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

STRIDE = 10_000_000  # > any key in any source table

# table -> columns shifted by c*STRIDE (entity keys + their FKs)
SHIFTED: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = {"region", "nation"}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = Path(
        sys.argv[3]
        if len(sys.argv) > 3
        else Path(__file__).resolve().parent.parent / ".tmp" / "sf1"
    )
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTED.items():
        src_file = f"{src}/{table}.parquet"
        out = dst / f"{table}.parquet"
        if table in FIXED:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{out}'"
                f" (FORMAT PARQUET)"
            )
        else:
            # STRIDE must exceed every source key or copies collide
            # (silent duplicate PKs / cross-copy FK aliasing) — e.g.
            # re-scaling an already-scaled output. Fail loudly instead.
            for kcol in keys:
                mx = con.sql(
                    f"SELECT max({kcol}) FROM read_parquet('{src_file}')"
                ).fetchone()[0]
                if mx is not None and mx >= STRIDE:
                    raise SystemExit(
                        f"{table}.{kcol} max {mx} >= STRIDE {STRIDE}: "
                        f"key ranges of adjacent copies would overlap"
                    )
            cols = con.sql(f"DESCRIBE SELECT * FROM read_parquet('{src_file}')")
            names = [r[0] for r in cols.fetchall()]
            proj = ", ".join(
                f"CAST(t.{n} + c.c * {STRIDE} AS BIGINT) AS {n}"
                if n in keys
                else f"t.{n}"
                for n in names
            )
            con.execute(
                f"COPY (SELECT {proj} FROM read_parquet('{src_file}') t, "
                f"(SELECT unnest(range({k})) AS c) c) TO '{out}'"
                f" (FORMAT PARQUET)"
            )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
