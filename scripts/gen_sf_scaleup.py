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

Usage: python scripts/gen_sf_scaleup.py [--skew] [K] [SRC] [DST]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=<repo>/.tmp/sf1
(DST default becomes .tmp/sf1skew under --skew)

--skew (r14, VERDICT r13 item 3): every prior scale sweep ran on the
near-uniform seed-42 corpus, which is exactly the distribution the
salting/banding paths were tuned on. Skew mode deforms the SOURCE
before replication, so each copy carries the same hot pattern
(text/vector payloads are NOT key-shifted, so duplicate classes DO
merge across copies; shifted FK keys stay per-copy — see the hot-key
note below):

- hot join keys: 30% of orders remap o_custkey to 8 hot customers with
  geometrically decaying shares; same for lineitem.l_suppkey and
  events.user_id. NOTE the key-shift interaction: these FK columns are
  key-shifted per copy, so each copy carries its OWN 8 hot keys (copy
  c's hottest = c*STRIDE + 0 at ~15% of that copy = ~1.5% of the
  global table at K=10) — K*8 hot keys total, each vastly hotter than
  the uniform 1/|dim| baseline. FK validity preserved (keys 0..7 exist
  in every dimension copy).
- heavy-tailed duplication: 5% of documents take the TEXT of doc_id%97
  — ~97 duplicate classes of ~n/2000 members each on top of the K-fold
  twins, the heavy-tailed cluster-size profile real crawls show.
- heavy-tailed lengths: ~1% of docs get text repeated 16x, a further
  ~4% repeated 4x (n_chars recomputed) — skews dl in BM25 and token
  fan-outs in the dedup families.
- hot ANN cells: 10% of embeddings become exact copies of vec_id%53 —
  heavy-tailed IVF/LSH cell populations + giant embcos dup groups.

All deformations are pure deterministic integer hashing (Knuth
multiplicative on the entity key), so re-running the generator is
byte-stable and any engine/oracle comparison on the skewed slice stays
exact.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

STRIDE = 10_000_000  # > any key in any source table

_H = 2654435761  # Knuth multiplicative hash; deterministic, engine-agnostic


def _h(expr: str, mod: int) -> str:
    return f"(({expr}) * {_H}) % 4294967296 % {mod}"


def _hot_rank(expr: str, n: int = 8) -> str:
    """Geometric hot-key rank: uniform hash u in [0,256) -> rank r with
    share 2^-(r+1) (rank 0 takes half the hot mass)."""
    u = f"(({expr}) * 40503) % 4294967296 % 256"
    cases = " ".join(
        f"WHEN {u} < {256 - 256 // (2 ** (r + 1))} THEN {r}"
        for r in range(n - 1)
    )
    return f"(CASE {cases} ELSE {n - 1} END)"

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


# Per-table skewed projections over the SOURCE alias ``t`` (applied
# before key shifting). ``h`` is a self-join alias for tables whose skew
# borrows another row's payload (documents text, embeddings vector).
def _skew_select(table: str, names: list[str]) -> tuple[str, str]:
    """(select-list override or '', extra JOIN clause or '')."""
    if table == "orders":
        hot = f"{_h('t.o_orderkey', 1000)} < 300"
        remap = f"CASE WHEN {hot} THEN {_hot_rank('t.o_orderkey')} ELSE t.o_custkey END"
        sel = ", ".join(
            f"CAST({remap} AS BIGINT) AS o_custkey" if n == "o_custkey" else f"t.{n}"
            for n in names
        )
        return sel, ""
    if table == "lineitem":
        key = "t.l_orderkey * 7 + t.l_linenumber"
        hot = f"{_h(key, 1000)} < 300"
        remap = f"CASE WHEN {hot} THEN {_hot_rank(key)} ELSE t.l_suppkey END"
        sel = ", ".join(
            f"CAST({remap} AS BIGINT) AS l_suppkey" if n == "l_suppkey" else f"t.{n}"
            for n in names
        )
        return sel, ""
    if table == "events":
        hot = f"{_h('t.event_id', 10)} < 3"
        remap = f"CASE WHEN {hot} THEN {_hot_rank('t.event_id')} ELSE t.user_id END"
        sel = ", ".join(
            f"CAST({remap} AS BIGINT) AS user_id" if n == "user_id" else f"t.{n}"
            for n in names
        )
        return sel, ""
    if table == "documents":
        hu = _h("t.doc_id", 1000)
        text = (
            f"CASE WHEN {hu} < 50 THEN h.text "
            f"WHEN {hu} < 60 THEN repeat(t.text || ' ', 16) "
            f"WHEN {hu} < 100 THEN repeat(t.text || ' ', 4) "
            f"ELSE t.text END"
        )
        sel = ", ".join(
            f"{text} AS text"
            if n == "text"
            else f"CAST(strlen({text}) AS BIGINT) AS n_chars"
            if n == "n_chars"
            else f"t.{n}"
            for n in names
        )
        return sel, " LEFT JOIN src h ON h.doc_id = t.doc_id % 97"
    if table == "embeddings":
        emb = f"CASE WHEN {_h('t.vec_id', 10)} = 0 THEN h.embedding ELSE t.embedding END"
        sel = ", ".join(
            f"{emb} AS embedding" if n == "embedding" else f"t.{n}"
            for n in names
        )
        return sel, " LEFT JOIN src h ON h.vec_id = t.vec_id % 53"
    return "", ""


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    k = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    dst = Path(
        args[2]
        if len(args) > 2
        else Path(__file__).resolve().parent.parent
        / ".tmp"
        / ("sf1skew" if skew else "sf1")
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
            base = f"read_parquet('{src_file}') t"
            join = ""
            if skew:
                sel, join = _skew_select(table, names)
                if sel:
                    # skew the SOURCE first (CTE), then shift keys over
                    # the skewed relation — each copy carries the same
                    # hot pattern, so the union amplifies it K-fold
                    base = (
                        f"(WITH src AS (SELECT * FROM read_parquet('{src_file}')) "
                        f"SELECT {sel} FROM src t{join}) t"
                    )
            proj = ", ".join(
                f"CAST(t.{n} + c.c * {STRIDE} AS BIGINT) AS {n}"
                if n in keys
                else f"t.{n}"
                for n in names
            )
            con.execute(
                f"COPY (SELECT {proj} FROM {base}, "
                f"(SELECT unnest(range({k})) AS c) c) TO '{out}'"
                f" (FORMAT PARQUET)"
            )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
