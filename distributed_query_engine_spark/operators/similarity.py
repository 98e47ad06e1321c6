"""Similarity search over embedding columns: exact top-k (baseline) and
LSH-bucketed ANN (the scale path), plus cosine near-duplicate pairs.

All cosine math goes through the fixed-point integer scaling in
:mod:`distributed_query_engine_spark.functions.vectors` — exact,
order-independent, hence oracle-reproducible (see that module's
docstring).

100 TB design notes:

- Exact top-k: broadcast the (small) query set, per-partition partial
  top-k via the window rank — the corpus never shuffles; cost is one
  scan × |queries| vector ops.
- ANN: random-hyperplane LSH — hyperplane weights are *arithmetically
  defined* (deterministic ±1 from a mod-prime mix of (plane, dim)), so
  bucket assignment is reproducible anywhere. The corpus shuffles once
  on bucket id; queries probe only their bucket. Recall/cost is tuned by
  N_PLANES (buckets = 2^N_PLANES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_query_engine_spark.functions.vectors import (
    cosine_from_ints,
    dot_long,
    int_vec,
    norm_sq_long,
)

N_PLANES = 8
MIX = 2_654_435_761  # Knuth multiplicative constant
M32 = 1 << 32
# Multi-probe radius: a query probes every bucket whose sign pattern
# differs in <= MULTIPROBE_H planes (1 + 8 + 28 = 37 of 256 buckets at
# H=2). Single-bucket probing scans 1/2^N_PLANES of the corpus and was
# MEASURED at recall@5 = 0.04-0.08 on the synthetic embeddings (PLANS.md
# records the sweep) — near-uniform vectors put true neighbors at wide
# angles, so sign agreement on all 8 planes is rare. Multi-probe is the
# standard recall/cost knob: candidates grow to ~14% of the corpus and
# recall becomes competitive while the corpus side still never reshuffles
# (the probe set expands on the tiny broadcast query side).
MULTIPROBE_H = 2
PROBE_MASKS = [
    m for m in range(1 << N_PLANES) if bin(m).count("1") <= MULTIPROBE_H
]
# Mixing stride between planes in the (plane, dim) → ±1 hash. A fixed
# constant of the hash definition — NOT the embedding dimensionality;
# both the Spark and oracle sides iterate the actual vector length.
PLANE_STRIDE = 64


def plane_sign(j, d):
    """Deterministic ±1 weight for hyperplane j, dimension d (Column
    in, Column out): sign of a 32-bit multiplicative mix."""
    mixed = ((j * PLANE_STRIDE + d + 1) * MIX) % M32
    return F.when(mixed < M32 // 2, 1).otherwise(-1)


def with_int_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("ivec", int_vec(vec_col)).withColumn(
        "nsq", norm_sq_long(F.col("ivec"))
    )


def lsh_bucket(df: DataFrame) -> DataFrame:
    """Add an int bucket id: bit j = sign(v · h_j).

    Computed entirely PER ROW with `zip_with` + `aggregate` (8 plane dots
    × 64 dims of exact integer arithmetic inside codegen) — zero
    shuffles. The previous formulation exploded a (vec, dim, plane)
    relation and re-aggregated it twice: a 512× row blow-up plus three
    shuffles, per corpus scan, for something that is a pure row-local
    function of the vector."""
    dims = F.sequence(F.lit(0), F.size("ivec") - 1)
    bucket = F.lit(0).cast("long")
    for j in range(N_PLANES):
        pdot = F.aggregate(
            F.zip_with(
                F.col("ivec"), dims, lambda x, d: x * plane_sign(F.lit(j), d).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(pdot > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("bucket", bucket)


def topk_cosine(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k for the given query vec_ids.
    Deterministic tiebreak on candidate vec_id."""
    base = with_int_vec(emb).select("vec_id", "ivec", "nsq")
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("ivec").alias("q_ivec"),
        F.col("nsq").alias("q_nsq"),
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine_from_ints(
                dot_long(F.col("q_ivec"), F.col("ivec")),
                F.col("q_nsq"),
                F.col("nsq"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "cosine", "rn")
    )


def topk_cosine_ann(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """LSH-bucketed ANN top-k with MULTI-PROBE: each query searches
    every bucket within Hamming distance MULTIPROBE_H of its own sign
    pattern (probe buckets = q_bucket XOR mask). The probe expansion
    happens on the broadcast query side (|queries| × |PROBE_MASKS| tiny
    rows); the corpus is still scanned once and hash-joined on its
    bucket id — no index shuffles. Each (query, candidate) pair meets at
    exactly one mask, so no dedup pass is needed. Approximate (may miss
    beyond-radius neighbors) but every step is deterministic, so results
    are still oracle-exact."""
    base = lsh_bucket(with_int_vec(emb).select("vec_id", "ivec", "nsq"))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("ivec").alias("q_ivec"),
        F.col("nsq").alias("q_nsq"),
        F.col("bucket").alias("q_bucket"),
    )
    probes = q.select(
        "q_id",
        "q_ivec",
        "q_nsq",
        "q_bucket",
        F.explode(F.array(*[F.lit(m) for m in PROBE_MASKS])).alias("mask"),
    ).select(
        "q_id",
        "q_ivec",
        "q_nsq",
        F.col("q_bucket").bitwiseXOR(F.col("mask")).alias("probe_bucket"),
    )
    scored = (
        base.join(F.broadcast(probes), F.col("bucket") == F.col("probe_bucket"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine_from_ints(
                dot_long(F.col("q_ivec"), F.col("ivec")),
                F.col("q_nsq"),
                F.col("nsq"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "cosine", "rn")
    )


N_CELLS = 16
N_PROBE = 4


def ivf_assign(emb: DataFrame) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid
    cell by cosine (ties → lowest cell id).

    Centroids are the N_CELLS lowest-vec_id vectors — a deterministic
    "init" chosen so the oracle can reproduce the index arithmetically;
    a production index would run a few Lloyd iterations (each one is the
    same broadcast-join + argmax pass as here) before freezing centroids.
    At 100 TB: centroids broadcast, the corpus is scanned once, and the
    only shuffle is the per-vector argmax (bounded at |corpus| × N_CELLS
    rows pre-aggregation)."""
    base = with_int_vec(emb).select("vec_id", "ivec", "nsq")
    cents = base.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("ivec").alias("c_ivec"),
        F.col("nsq").alias("c_nsq"),
    )
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "ivec",
        "nsq",
        "cell_id",
        cosine_from_ints(
            dot_long(F.col("ivec"), F.col("c_ivec")), F.col("nsq"), F.col("c_nsq")
        ).alias("c_cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cell_id"))
    return (
        scored.withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") == 1)
        .select("vec_id", "ivec", "nsq", "cell_id")
    )


def topk_cosine_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF ANN top-k: each query probes its n_probe nearest cells and
    ranks exactly within them. Approximate (misses neighbors assigned to
    unprobed cells) but fully deterministic, so the oracle is exact.
    Search cost scales with n_probe/N_CELLS of the corpus instead of all
    of it — the knob a 100 TB deployment turns."""
    assigned = ivf_assign(emb)
    base = with_int_vec(emb).select("vec_id", "ivec", "nsq")
    cents = base.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("ivec").alias("c_ivec"),
        F.col("nsq").alias("c_nsq"),
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("ivec").alias("q_ivec"),
        F.col("nsq").alias("q_nsq"),
    )
    pw = Window.partitionBy("q_id").orderBy(F.col("p_cos").desc(), F.col("cell_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "cell_id",
            cosine_from_ints(
                dot_long(F.col("q_ivec"), F.col("c_ivec")), F.col("q_nsq"), F.col("c_nsq")
            ).alias("p_cos"),
        )
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= n_probe)
        .select("q_id", "cell_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell_id")
        .join(F.broadcast(q), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine_from_ints(
                dot_long(F.col("q_ivec"), F.col("ivec")), F.col("q_nsq"), F.col("nsq")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "cosine", "rn")
    )


def semdedup(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public): coarse-quantize the corpus into cells
    (:func:`ivf_assign`, the same deterministic centroid assignment the
    IVF index uses), then compare EXACT cosine only within cells; a
    vector is a semantic duplicate when a LOWER-id vector in its cell is
    at/above ``threshold`` cosine (keep-lowest, the deterministic
    keeper). Returns one row per vector: (vec_id, cell_id, kept).

    Scale shape — the reason SemDeDup works at corpus scale: the
    quadratic pairwise comparison is confined to one cell, and cell
    count grows with the corpus (N_CELLS ∝ corpus size in production,
    fixed here for oracle determinism), so per-cell work stays bounded.
    One broadcast (centroids), one shuffle on cell_id for the
    within-cell self-join, one anti-join-shaped left join for the kept
    flag. Popular cells skew the pair production; at 100 TB the same
    salting applied in dedup.candidate_pairs drops in (the cell id is
    the band key analog)."""
    assigned = ivf_assign(emb).select("vec_id", "cell_id", "ivec", "nsq")
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), "cell_id",
        F.col("ivec").alias("ivec_a"), F.col("nsq").alias("nsq_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), "cell_id",
        F.col("ivec").alias("ivec_b"), F.col("nsq").alias("nsq_b"),
    )
    removed = (
        a.join(b, "cell_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(
            cosine_from_ints(
                dot_long(F.col("ivec_a"), F.col("ivec_b")),
                F.col("nsq_a"),
                F.col("nsq_b"),
            )
            >= threshold
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        assigned.join(removed, "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("kept"),
        )
    )


def cosine_near_dup_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Embedding near-duplicate pairs, blocked by the random-hyperplane
    LSH bucket (:func:`lsh_bucket` — the same per-row, zero-shuffle
    bucketing the ANN path uses): exact cosine within buckets,
    (a < b) ordering.

    Scale: an earlier version blocked on the ``label`` column — within-
    label all-pairs, quadratic in label popularity and dead on a real
    corpus where one label dominates. Hyperplane buckets are bounded by
    construction (2^N_PLANES keys whose population tracks the cosine
    geometry, not a metadata column), so the self-join is a hash join on
    a high-cardinality key and each bucket's pair production is small.
    Like every LSH block, same-bucket candidacy is approximate (cosine-
    close pairs land together with probability (1 - θ/π)^N_PLANES); the
    cosine itself is exact.

    Zero-length embeddings are excluded up front: cosine against them is
    undefined (0/0), and the SQL oracle's exploded bucket computation
    drops them naturally — filtering here keeps both engines on the same
    contract (an empty vector is a near-duplicate of nothing)."""
    base = lsh_bucket(
        with_int_vec(emb).filter(F.size("ivec") > 0).select("vec_id", "ivec", "nsq")
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"), "bucket",
        F.col("ivec").alias("ivec_a"), F.col("nsq").alias("nsq_a"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), "bucket",
        F.col("ivec").alias("ivec_b"), F.col("nsq").alias("nsq_b"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.col("bucket"),
            cosine_from_ints(
                dot_long(F.col("ivec_a"), F.col("ivec_b")),
                F.col("nsq_a"),
                F.col("nsq_b"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
