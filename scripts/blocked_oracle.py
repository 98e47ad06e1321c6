"""Blocked oracles for the quadratic-output dedup family (r15, VERDICT
r14 item 3).

At 10x+ twin-replicated slices the scored-pairs dedup oracles are
inherently quadratic on the DuckDB side (K-fold replication makes every
candidate set K^2 per source pair), so they sat on verify_at_scale's
SKIP list — the one family with no exact scale verification. The fix
exploits that these queries are PAIR-LOCAL: every output row is a
function of its two member docs alone (row-local signatures / buckets /
token sets; no global statistics, vocabularies-by-rank, or cluster
representatives), so

    full-corpus output restricted to pairs with BOTH members in a
    deterministic doc block  ==  output computed on the block-only corpus.

The ENGINE therefore runs at FULL scale (which is what the sweep is
for) and only the ORACLE replays on the blocked corpus — linear-sized
under twin replication (a 1/97 block cuts each twin class ~97x, so the
class-quadratic pair count drops ~9400x). The block predicate is plain
``key % 97 == 0``: under gen_sf_scaleup's key-shifting (copy c adds
c*STRIDE), consecutive copies of a doc land in different residues, so
the block samples ACROSS twin classes rather than whole classes.

The pair-locality assumption is NOT taken on faith: every name here is
pinned at sf0.01 by tests/test_blocked_oracle.py (engine-full-filtered
repr-equals oracle-on-block), and the scale sweeps re-check the same
equality at sf1/sf10. Queries with global decisions (semdedup's
corpus-seeded centroids, cluster representatives, recall aggregates)
are NOT blockable and stay on the skip list.
"""

from __future__ import annotations

BLOCK_MOD = 97

# name -> (engine output pair columns, {table: key column} to block)
BLOCKED: dict[str, tuple[tuple[str, str], dict[str, str]]] = {
    "llm_dedup_minhash": (("doc_a", "doc_b"), {"documents": "doc_id"}),
    "llm_dedup_simhash": (("doc_a", "doc_b"), {"documents": "doc_id"}),
    "llm_dedup_simhash_multiband": (
        ("doc_a", "doc_b"),
        {"documents": "doc_id"},
    ),
    "llm_dedup_ngram": (("doc_a", "doc_b"), {"documents": "doc_id"}),
    "llm_dedup_containment": (("doc_a", "doc_b"), {"documents": "doc_id"}),
    "llm_dedup_incremental": (("new_doc", "dup_of"), {"documents": "doc_id"}),
    "llm_dedup_signature_store": (
        ("new_doc", "dup_of"),
        {"documents": "doc_id"},
    ),
    "llm_dedup_embcos": (("vec_a", "vec_b"), {"embeddings": "vec_id"}),
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def blocked_connection(sf_dir: str, mod: int = BLOCK_MOD):
    """A DuckDB connection whose blockable tables are restricted to the
    deterministic key block; all other tables are the full slice."""
    import duckdb

    blocked_keys = {}
    for _, tabs in BLOCKED.values():
        blocked_keys.update(tabs)
    con = duckdb.connect()
    for t in TABLES:
        pred = (
            f" WHERE {blocked_keys[t]} % {mod} = 0" if t in blocked_keys else ""
        )
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet'){pred}"
        )
    return con


def filter_engine_block(df, cols: tuple[str, str], mod: int = BLOCK_MOD):
    """Restrict a full-scale engine result to pairs with BOTH members in
    the block — the engine-side half of the blocked compare."""
    from pyspark.sql import functions as F

    a, b = cols
    return df.filter((F.col(a) % mod == 0) & (F.col(b) % mod == 0))


def materialize_block_dir(sf_dir: str, mod: int = BLOCK_MOD) -> str:
    """A corpus directory whose BLOCKABLE tables are restricted to the
    deterministic key block (others symlink to the full slice) — the
    100x-rung home of the blocked family. At K=100 twin replication
    the ENGINE side of a scored-pairs query is K^2-inflated (~10,000x
    the source pair count): fine on a 1000-executor cluster, not on
    one box — measured: llm_dedup_containment alone passed 25 min at
    26 cores before being cut. At that rung both engine AND oracle run
    on the block (pair-locality makes block-corpus output == blocked
    full-corpus output — the SAME equality, proven at sf0.01 by
    tests/test_blocked_oracle.py and at FULL engine scale by the sf1
    sweep, K=10, 229M pairs green)."""
    import os
    from pathlib import Path

    import duckdb

    src = Path(sf_dir).resolve()
    dst = src.parent / f"{src.name}block{mod}"
    marker = dst / "_BLOCKED"
    if marker.is_file():
        return str(dst)
    dst.mkdir(parents=True, exist_ok=True)
    blocked_keys: dict[str, str] = {}
    for _, tabs in BLOCKED.values():
        blocked_keys.update(tabs)
    con = duckdb.connect()
    for t in TABLES:
        out = dst / f"{t}.parquet"
        if t in blocked_keys:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
                f"WHERE {blocked_keys[t]} % {mod} = 0) TO '{out}' "
                "(FORMAT PARQUET)"
            )
        elif not out.exists():
            os.symlink(src / f"{t}.parquet", out)
    marker.write_text(f"{src}\n{mod}\n")
    return str(dst)
