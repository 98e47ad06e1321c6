"""Iterative graph computation on DataFrames: fixed-point PageRank.

Companion to the connected-components operator (operators/dedup.py) —
together they cover the two shapes of iterative distributed algorithms
the reference's host-engine family runs over relational data: label
propagation to a fixpoint (CC) and damped score diffusion for a fixed
iteration count (PageRank).

Determinism discipline: PageRank is usually computed in floating point,
where the per-target contribution sum is order-dependent and can never
hash-match a sequential oracle. Here ranks are BIGINT micro-units
(UNIT = 1e12): contributions are integer divisions (``rank div deg``),
the damping update is integer multiply/divide, and every aggregate is an
exact integer sum — bit-identical in any engine and under any
partitioning, so a DuckDB oracle replays the identical 5 iterations as
chained CTEs.

Scale: each iteration is one join of the rank relation with the edge
relation on ``src`` plus one aggregation by ``dst`` — the textbook
distributed PageRank step. Edges and degrees are iteration-invariant:
``prepared_edges`` hash-partitions them by ``src`` ONCE and caches, so
every iteration's join reuses the same shuffle-free build side and only
the (node-sized) rank relation moves. At 100 TB add a ``checkpoint``
every ~10 iterations to cut lineage (same knob as connected_components,
operators/dedup.py) — with a fixed 5 iterations the plan tree stays
shallow enough that no cut is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNIT = 1_000_000_000_000  # 1e12 micro-rank units
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 in exact rationals


def pagerank_fixed_point(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """PageRank over a directed edge list (``src``, ``dst``) in exact
    fixed-point arithmetic; every node must have out-degree >= 1 (feed a
    symmetrized edge list for undirected graphs — that also guarantees
    every node receives mass, so no dangling-mass redistribution term is
    needed). Returns (node, r) with r in UNIT micro-units."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = (
        deg.crossJoin(F.broadcast(nn))
        .select(
            F.col("src").alias("node"),
            F.expr(f"CAST({UNIT} AS BIGINT) div n").alias("r"),
        )
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("contrib"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({(DAMP_DEN - DAMP_NUM) * UNIT} AS BIGINT)"
                    f" div ({DAMP_DEN} * n)"
                    f" + ({DAMP_NUM} * s) div {DAMP_DEN}"
                ).alias("r"),
            )
        )
    return ranks


def prepared_edges(edges: DataFrame, partitions: int | None = None) -> DataFrame:
    """Hash-partition the iteration-invariant edge relation by ``src``
    once and cache it, so each iteration's rank-join reuses the same
    layout instead of re-shuffling the (much larger) edge side."""
    e = edges.repartition(*( [partitions, "src"] if partitions else ["src"] ))
    return e.persist()


def bfs_hop_distance(
    edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Bounded-hop BFS: minimum hop distance from a source set — the
    third iterative shape next to CC (fixpoint label propagation) and
    PageRank (fixed-count diffusion): frontier expansion with a HOP
    BOUND, the pattern behind k-hop neighborhoods and landmark-distance
    features.

    ``sources`` has one ``node`` column; returns (node, dist) for every
    node within ``max_hops``. Exact integer labels, so results are
    bit-identical under any partitioning.

    Scale shape: per hop, ONE join of the frontier with the (src-
    partitioned, reused) edge relation plus a min-aggregate; the settled
    relation is node-sized, never edge-sized. The settled/frontier
    DataFrames are localCheckpoint-ed per hop to cut lineage (cluster
    scale: ``checkpoint``). Unlike an unbounded fixpoint there is no
    convergence test — the hop bound is the contract, so the oracle can
    replay it as a depth-bounded recursion."""
    # Dedup the seed set: a duplicated landmark would otherwise ride the
    # settled union as duplicate (node, dist) rows (r12 ADVICE) — the
    # per-hop left_anti guard only protects NEW nodes, never the seeds.
    dist = sources.select("node", F.lit(0).alias("dist")).distinct().localCheckpoint()
    frontier = dist
    for _hop in range(1, max_hops + 1):
        expanded = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # new frontier = nodes not already settled with a smaller label
        frontier = (
            expanded.join(dist.select(F.col("node").alias("s_node")),
                          expanded["node"] == F.col("s_node"), "left_anti")
            .localCheckpoint()
        )
        dist = dist.unionByName(frontier).localCheckpoint()
    return dist
