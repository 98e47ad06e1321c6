"""LLM-training-data pipeline queries (BASELINE.json north star):
text analysis, fingerprinting, four dedup families, similarity search,
multimodal plumbing — over the driver's ``documents`` / ``embeddings``
tables.

Every fuzzy operator here (MinHash, SimHash, LSH buckets, cosine) is
built on deterministic integer arithmetic (see operators/dedup.py and
functions/vectors.py), which is why each has an EXACT DuckDB oracle —
the oracle replays the same arithmetic in SQL rather than settling for a
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_query_engine_spark.catalog import Tables
from distributed_query_engine_spark.functions import text as T
from distributed_query_engine_spark.functions.vectors import SCALE
from distributed_query_engine_spark.operators import dedup as D
from distributed_query_engine_spark.operators.chunking import chunk_documents
from distributed_query_engine_spark.operators import multimodal as M
from distributed_query_engine_spark.operators import similarity as S
from distributed_query_engine_spark.registry import query

# ---------------------------------------------------------------------------
# Shared oracle-SQL fragments (mirror the Python specs arithmetically)
# ---------------------------------------------------------------------------

_WORD_LIST = "string_split(text, ' ')"
_BIGRAM_LIST = (
    "list_transform(generate_series(1, len(string_split(text,' ')) - 1), "
    "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])"
)


def _tokens_cte(tok_list_expr: str = _WORD_LIST, hashed: bool = False) -> str:
    """tokens/tt CTEs over any per-doc token-list expression (word split
    or bigram transform) — mirrors operators/dedup.py::tokenize plus
    either the row_number dictionary (token_ids + tid join) or, with
    ``hashed=True``, the row-local md5-prefix-mod-P id
    (hashed_token_ids)."""
    tokens = f"""
tokens AS (
  SELECT doc_id, unnest(list_distinct({tok_list_expr})) AS tok
  FROM documents
)"""
    if hashed:
        return f"""{tokens},
tt AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {D.P} AS tid
  FROM tokens
)
"""
    return f"""{tokens},
dict AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS tid
  FROM (SELECT DISTINCT tok FROM tokens)
),
tt AS (SELECT t.doc_id, d.tid FROM tokens t JOIN dict d USING (tok))
"""


_TOKENS_CTE = _tokens_cte()

_SIG_EXPRS = ", ".join(
    f"min((tid*{a}+{b})%{D.P}) AS m{i}"
    for i, (a, b) in ((i, D.hash_params(i)) for i in range(D.N_HASHES))
)

_SIG_COLS = ", ".join(f"m{i}" for i in range(D.N_HASHES))


def _band_selects(rel: str = "sigs") -> str:
    return "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS band_key FROM {rel}".format(
            b=b,
            cols=", ".join(
                f"m{b * D.ROWS_PER_BAND + r}" for r in range(D.ROWS_PER_BAND)
            ),
            rel=rel,
        )
        for b in range(D.N_BANDS)
    )


_BAND_SELECTS = _band_selects()


def _jaccard_cte(threshold: float, token_rel: str = "tokens") -> str:
    # Every candidate is verified (zero-overlap pairs get jaccard 0 via
    # the left join + COALESCE, mirroring exact_jaccard's contract);
    # callers decide what to report — the pair queries keep only
    # `verified WHERE is_dup` so the OUTPUT stays linear even when the
    # candidate set is quadratic in a signature group's size.
    return f"""
sizes AS (SELECT doc_id, count(*) AS n_tok FROM {token_rel} GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN {token_rel} ta ON ta.doc_id = c.doc_a
  JOIN {token_rel} tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
           / CAST(sa.n_tok + sb.n_tok - COALESCE(i.n_inter, 0) AS DOUBLE) AS jaccard,
         (CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
           / CAST(sa.n_tok + sb.n_tok - COALESCE(i.n_inter, 0) AS DOUBLE))
           >= {threshold} AS is_dup
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
)
"""


_IVEC_CTE = f"""
iv AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS ivec
  FROM embeddings
),
nv AS (
  SELECT vec_id, label, ivec,
         list_dot_product(ivec, ivec) AS nsq
  FROM iv
)
"""

# Random-hyperplane LSH bucket per vector (operators/similarity.py::
# lsh_bucket replayed in SQL). Zipped unnest iterates the ACTUAL vector
# length — PLANE_STRIDE is the hash's mixing stride, a constant of the
# plane_sign definition, not a dimensionality assumption. Requires the
# nv CTE; yields buckets(vec_id, bucket). The final left join from nv
# keeps zero-length vectors at bucket 0, matching the Spark side
# (lsh_bucket's null pdots fail `pdot > 0`, leaving bucket = 0) — an
# unnest-only derivation would silently drop such rows from the oracle.
_LSH_BUCKET_CTES = f"""
    ex AS (
      SELECT vec_id, unnest(range(len(ivec))) AS d, unnest(ivec) AS x
      FROM nv
    ),
    pdots AS (
      SELECT vec_id, p.j,
             sum(x * (CASE WHEN ((p.j*{S.PLANE_STRIDE} + d + 1) * {S.MIX}) % {S.M32}
                           < {S.M32 // 2} THEN 1 ELSE -1 END)) AS pdot
      FROM ex, generate_series(0, {S.N_PLANES - 1}) p(j)
      GROUP BY vec_id, p.j
    ),
    nonempty_buckets AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN pdot > 0 THEN (1::BIGINT << j) ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM pdots GROUP BY vec_id
    ),
    buckets AS (
      SELECT nv.vec_id, COALESCE(b.bucket, 0) AS bucket
      FROM nv LEFT JOIN nonempty_buckets b ON b.vec_id = nv.vec_id
    )
"""


# Multi-probe mask list (operators/similarity.py::PROBE_MASKS): all
# N_PLANES-bit patterns with popcount <= MULTIPROBE_H.
_PROBE_MASKS_SQL = ", ".join(str(m) for m in S.PROBE_MASKS)


def _sql_lang_hits(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
    return (
        "len(list_intersect(list_distinct(string_split(text, ' ')), "
        f"[{markers}]))"
    )


def _sql_lang_predict() -> str:
    whens = []
    for idx, lg in enumerate(T.LANG_ORDER):
        conds = []
        for jdx, other in enumerate(T.LANG_ORDER):
            if other == lg:
                continue
            op = ">" if jdx < idx else ">="
            conds.append(f"h_{lg} {op} h_{other}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    return "CASE " + " ".join(whens) + f" ELSE '{T.LANG_ORDER[0]}' END"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "llm_text_stats",
    oracle="""
    SELECT doc_id, lang,
           length(text) AS n_chars_calc,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE), 9) AS mean_tok_len
    FROM documents
    """,
)
def llm_text_stats(spark, sf_dir):
    d = Tables(spark, sf_dir).documents
    w = T.words(F.col("text"))
    n_tok = F.size(w).cast("long")
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_tokens"),
        F.round(
            (F.length("text").cast("long") - (n_tok - 1)).cast("double")
            / n_tok.cast("double"),
            9,
        ).alias("mean_tok_len"),
    )


@query(
    "llm_lang_id",
    oracle=lambda: f"""
    SELECT doc_id, lang,
           {_sql_lang_hits('en')} AS h_en, {_sql_lang_hits('es')} AS h_es,
           {_sql_lang_hits('de')} AS h_de, {_sql_lang_hits('fr')} AS h_fr,
           {_sql_lang_hits('zh')} AS h_zh,
           {_sql_lang_predict()} AS predicted
    FROM (SELECT doc_id, lang, text,
                 {_sql_lang_hits('en')} AS h_en, {_sql_lang_hits('es')} AS h_es,
                 {_sql_lang_hits('de')} AS h_de, {_sql_lang_hits('fr')} AS h_fr,
                 {_sql_lang_hits('zh')} AS h_zh
          FROM documents)
    """,
)
def llm_lang_id(spark, sf_dir):
    # Marker-stopword language ID (the n-gram-heuristic family): emit the
    # per-language evidence AND the deterministic argmax.
    d = Tables(spark, sf_dir).documents
    t = F.col("text")
    return d.select(
        "doc_id",
        "lang",
        T.lang_hits(t, "en").alias("h_en"),
        T.lang_hits(t, "es").alias("h_es"),
        T.lang_hits(t, "de").alias("h_de"),
        T.lang_hits(t, "fr").alias("h_fr"),
        T.lang_hits(t, "zh").alias("h_zh"),
        T.lang_predict(t).alias("predicted"),
    )


# DuckDB twin of functions/text.py::quality_score, shared by
# llm_quality_score and llm_corpus_curation.
_QUALITY_SQL = """round((
             (CASE WHEN length(text) >= 100 AND length(text) <= 1000
                   THEN 1.0 ELSE 0.0 END)
             + (CASE WHEN
                  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
                    / CAST(len(string_split(text,' ')) AS DOUBLE) >= 3.0
                 AND
                  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
                    / CAST(len(string_split(text,' ')) AS DOUBLE) <= 10.0
                 THEN 1.0 ELSE 0.0 END)
             + CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE)
           ) / 3.0, 9)"""


@query(
    "llm_quality_score",
    oracle=lambda: f"SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents",
)
def llm_quality_score(spark, sf_dir):
    d = Tables(spark, sf_dir).documents
    return d.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


@query(
    "llm_token_count",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]', 0))
             AS n_bpe_ish_tokens
    FROM documents
    """,
)
def llm_token_count(spark, sf_dir):
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        T.token_count_ws(F.col("text")).alias("n_ws_tokens"),
        T.token_count_bpe_ish(F.col("text")).alias("n_bpe_ish_tokens"),
    )


@query(
    "llm_bpe_pair_stats",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    pairs AS (
      SELECT substr(w, i, 2) AS pair
      FROM words, unnest(range(1, length(w))) AS t(i)
      WHERE length(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def llm_bpe_pair_stats(spark, sf_dir):
    """BPE MERGE-PAIR STATISTICS — the counting core of tokenizer
    training: for every in-word adjacent character pair, its corpus
    frequency; the top pair IS the first BPE merge decision, and
    iterating this count-merge-recount loop is the whole algorithm.
    Expressed as pure JVM expressions: lowercase split to words, each
    word explodes its length−1 adjacent pairs via a sequence
    transform, then ONE partial-aggregated shuffle keyed on the pair
    (alphabet², a tiny key space, so map-side combine collapses almost
    everything before the exchange). Top-20 with a full (count, pair)
    tiebreak plans as TakeOrderedAndProject.

    100 TB: the explode fans out ~|chars| rows but they collapse into
    ≤ |alphabet|² partial-agg cells per task before shuffling — the
    canonical word-count shape; subsequent BPE iterations re-run the
    same plan over the re-tokenized corpus (the merge table itself is
    a broadcast-sized artifact)."""
    d = Tables(spark, sf_dir).documents
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


# Ordered BPE merge table applied by llm_bpe_encode — the artifact a
# llm_bpe_pair_stats training loop would produce (rank order matters:
# later merges consume tokens earlier merges created, e.g. t+h -> th,
# then th+e -> the). Single source of truth for BOTH the Spark plan and
# the DuckDB oracle.
_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("i", "n"),
    ("a", "n"),
    ("r", "e"),
    ("o", "n"),
    ("e", "r"),
    ("th", "e"),
    ("an", "d"),
    ("o", "u"),
    ("s", "t"),
)


def _bpe_encode_oracle() -> str:
    # Same delimiter-string trick as the Spark side (see docstring):
    # '||a||b||' with pattern '|a||b|' -> '|ab|' keeps the double-pipe
    # frame intact, so one non-overlapping left-to-right replace() per
    # merge IS the greedy BPE merge application.
    s = "'|' || regexp_replace(w, '(.)', '|\\1|', 'g') || '|'"
    for a, b in _BPE_MERGES:
        s = f"replace({s}, '|{a}||{b}|', '|{a}{b}|')"
    return f"""
    WITH words AS (
      SELECT w FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE regexp_matches(w, '^[a-z]+$')
    ),
    enc AS (SELECT {s} AS s FROM words),
    toks AS (
      SELECT unnest(string_split(trim(s, '|'), '||')) AS token FROM enc
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks GROUP BY token ORDER BY n DESC, token LIMIT 30
    """


@query("llm_bpe_encode", oracle=_bpe_encode_oracle)
def llm_bpe_encode(spark, sf_dir):
    """BPE ENCODE — apply a learned, ordered merge table to the corpus
    (the other half of tokenizer training next to llm_bpe_pair_stats,
    which COUNTS candidate merges). Output: the resulting token
    vocabulary's top-30 frequency table, which pins every merge's
    application exactly.

    Each word becomes a delimiter-framed character string
    ``||c1||c2||...||`` and each merge (a, b) -> ab is ONE literal
    ``replace('|a||b|' -> '|ab|')``. Because the pattern consumes only
    the INNER pipes, adjacent matches keep their frames and a single
    non-overlapping left-to-right replace() reproduces greedy BPE merge
    semantics exactly — including hierarchical merges (th+e) over
    tokens produced by earlier ranks. The whole merge loop is K chained
    string functions per row: row-local, zero shuffles, inside
    whole-stage codegen; only the final vocab count shuffles (keyed on
    a vocab-sized space, so map-side combine collapses it).

    100 TB: encode is scan + project (IO-bound, the ideal shape); the
    merge table is a driver-side constant exactly as a real trained
    tokenizer ships its merges file to every executor."""
    d = Tables(spark, sf_dir).documents
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$"))
    toks = words.select(
        F.explode(T.bpe_encode(F.col("w"), _BPE_MERGES)).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(30)
    )


# Number of merges llm_bpe_train learns. Small because each iteration
# is a full corpus re-tokenization (the canonical BPE training loop);
# a production run batches more merges per scan.
_BPE_TRAIN_K = 6


def _bpe_train_ctes() -> list[str]:
    # The data-dependent training loop as a CTE chain: iteration k's
    # encode uses scalar subqueries over best{k-1} inside replace(), so
    # the oracle learns its merges from the data exactly like the
    # engine does — no hardcoded expected pairs. Shared by the train
    # oracle (selects the best{k} rows) and the pack_sequences_bpe
    # oracle (applies best1..bestK to per-doc words).
    ctes = [
        "words AS (SELECT w FROM (SELECT unnest(string_split(lower(text),"
        " ' ')) AS w FROM documents) WHERE regexp_matches(w, '^[a-z]+$'))",
        "enc0 AS (SELECT '|' || regexp_replace(w, '(.)', '|\\1|', 'g')"
        " || '|' AS s FROM words)",
    ]
    selects = []
    for k in range(1, _BPE_TRAIN_K + 1):
        prev = f"enc{k - 1}"
        ctes.append(
            f"toks{k} AS (SELECT string_split(trim(s, '|'), '||') AS ts"
            f" FROM {prev})"
        )
        ctes.append(
            f"""pairs{k} AS (
              SELECT t.p[1] AS a, t.p[2] AS b FROM (
                SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                       i -> [ts[i], ts[i + 1]])) AS p
                FROM toks{k} WHERE len(ts) >= 2) t)"""
        )
        ctes.append(
            f"""best{k} AS (
              SELECT a, b, CAST(count(*) AS BIGINT) AS n
              FROM pairs{k} GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)"""
        )
        if k < _BPE_TRAIN_K:
            ctes.append(
                f"""enc{k} AS (
                  SELECT replace(s,
                    '|' || (SELECT a FROM best{k}) || '||'
                        || (SELECT b FROM best{k}) || '|',
                    '|' || (SELECT a || b FROM best{k}) || '|') AS s
                  FROM {prev})"""
            )
    return ctes


def _bpe_train_oracle() -> str:
    ctes = _bpe_train_ctes()
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS merge_rank, a AS pair_left,"
        f" b AS pair_right, a || b AS merged, n FROM best{k}"
        for k in range(1, _BPE_TRAIN_K + 1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects) + "\nORDER BY merge_rank"
    )


def _train_bpe_merges(d) -> list[tuple[int, str, str, str, int]]:
    """The BPE training loop shared by llm_bpe_train (returns the merge
    table) and llm_pack_sequences_bpe (consumes the learned merges):
    K rounds of count-pairs → argmax (ties lexical) → merge everywhere.
    Each iteration collects exactly ONE row; the corpus stays on
    executors. Returns (rank, a, b, merged, n) rows.

    DELTA RE-ENCODE (VERDICT r9 item 2): the loop used to re-tokenize
    every word from scratch through the k−1 merges learned so far — K
    full corpus scans each dragging a k-deep replace() chain (O(K²)
    replace applications, 68 s at sf1). Iteration k only CHANGES words
    containing the just-learned pair, so instead we keep the corpus in
    bpe_encode's delimiter-string form (``|a||b||c|``) as a PERSISTED
    relation and apply each new merge as ONE literal ``replace()`` over
    it — a no-op on non-containing rows, which is strictly cheaper than
    a filter + union (that shape scans the cached relation twice and
    shuffles the union). ``replace(replace(enc0, m1), m2, …)`` is
    literally the same expression chain bpe_encode builds, just
    materialized between steps, so the learned table is identical by
    construction (property-pinned vs the pure-Python trainer in
    tests/test_properties.py; oracle unchanged). Per-iteration cost
    drops from corpus-scan × k replaces to cached-scan × 1 replace; the
    previous iteration's cache is released as soon as its successor is
    materialized, so at most two vocab-bounded string relations are
    ever pinned. The raw scan is spread first (_spread_narrow_scan) so
    the encode/count work of every iteration runs at session
    parallelism — a compact corpus arrives in ONE split (r9 lesson)."""
    from pyspark import StorageLevel

    from distributed_query_engine_spark.operators.dedup import (
        _spread_narrow_scan,
    )

    words = (
        _spread_narrow_scan(d.select("doc_id", "text"))
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
    )
    enc = words.select(
        F.concat(
            F.lit("|"), F.regexp_replace("w", "(.)", "|$1|"), F.lit("|")
        ).alias("s")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    prev = None
    rows_out: list[tuple[int, str, str, str, int]] = []
    try:
        for k in range(1, _BPE_TRAIN_K + 1):
            # sliding_windows, not element_at(ts, i): a lambda-body
            # reference re-evaluates per PAIR — the window form
            # evaluates the split O(1) times per word (r9 audit).
            toks = F.split(
                F.regexp_replace("s", r"^\|\||\|\|$", ""), r"\|\|"
            )
            tok_df = enc.select(toks.alias("ts")).filter(F.size("ts") >= 2)
            pairs = tok_df.select(
                F.explode(T.sliding_windows(F.col("ts"), 2)).alias("p")
            ).select(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
            top = (
                pairs.groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            # this collect materialized `enc`, so its parent's cache
            # (consumed only to build `enc`) can be dropped now
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                # degenerate corpus ran out of adjacent pairs before K
                # merges: stop with the merges learned so far. The
                # oracle degrades identically — its empty best{k} makes
                # every later enc/best CTE empty, so both sides emit
                # rows only for the learnable ranks.
                break
            best = top[0]
            rows_out.append((k, best.a, best.b, best.a + best.b, best.n))
            if k < _BPE_TRAIN_K:
                prev = enc
                enc = enc.select(
                    F.replace(
                        "s",
                        F.lit(f"|{best.a}||{best.b}|"),
                        F.lit(f"|{best.a}{best.b}|"),
                    ).alias("s")
                ).persist(StorageLevel.MEMORY_AND_DISK)
    finally:
        enc.unpersist()
        if prev is not None:
            prev.unpersist()
    return rows_out


@query("llm_bpe_train", oracle=_bpe_train_oracle)
def llm_bpe_train(spark, sf_dir):
    """BPE TRAINING — learn a merge table from the corpus: K rounds of
    count-all-adjacent-pairs → take the most frequent (ties: lexical)
    → merge it everywhere → recount. This is the actual BPE algorithm,
    closing the tokenizer story: llm_bpe_pair_stats is one iteration's
    counting step, llm_bpe_encode applies a learned table, this LEARNS
    the table. Output: the merge table itself (rank, pair, merged
    token, frequency) — the broadcast-sized artifact a tokenizer ships.

    Driver loop legitimacy: each iteration collects exactly ONE row
    (the argmax pair — a scalar aggregate, same pattern as pagerank's
    per-iteration convergence check); the corpus never leaves
    executors. Each iteration re-tokenizes from the raw words through
    the merges learned so far (functions/text.py::bpe_encode — K
    chained row-local replaces, zero shuffles), then ONE
    partial-aggregated pair count over a vocab-sized key space.

    100 TB: K full corpus scans is the canonical trade of iterative
    training; production batches many merges per scan and/or trains on
    a sample — both are this same loop with different constants. The
    oracle replays the identical data-dependent loop in SQL (scalar
    subqueries select each round's argmax), so the learned table is
    exact-checked without hardcoding what it learns."""
    d = Tables(spark, sf_dir).documents
    rows_out = _train_bpe_merges(d)
    return spark.createDataFrame(
        rows_out,
        "merge_rank bigint, pair_left string, pair_right string, "
        "merged string, n bigint",
    )


@query(
    "llm_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp_full,
           md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' '))
             AS fp_prefix
    FROM documents
    """,
)
def llm_fingerprint(spark, sf_dir):
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        T.fingerprint_md5(F.col("text")).alias("fp_full"),
        T.fingerprint_prefix(F.col("text"), 5).alias("fp_prefix"),
    )


@query(
    "llm_repetition_stats",
    # Gopher-style repetition signals, computed ROW-LOCALLY with
    # higher-order array functions (zero shuffles — the whole query is
    # scan + project inside codegen; at 100 TB it is IO-bound, the ideal
    # shape for a per-doc quality filter).
    oracle="""
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tok,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
           CAST(list_max(list_transform(list_distinct(ws),
                    t -> len(list_filter(ws, x -> x = t)))) AS DOUBLE)
             / CAST(len(ws) AS DOUBLE) AS top_tok_frac,
           CASE WHEN len(ws) >= 2
                THEN CAST(len(bs) - len(list_distinct(bs)) AS DOUBLE)
                     / CAST(len(bs) AS DOUBLE)
                ELSE 0.0 END AS dup_bigram_frac
    FROM (
      SELECT doc_id, string_split(text, ' ') AS ws,
             list_transform(generate_series(1, len(string_split(text,' ')) - 1),
                 i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])
               AS bs
      FROM documents)
    """,
)
def llm_repetition_stats(spark, sf_dir):
    """Per-document repetition metrics (the Gopher rules' signals):
    token counts, most-frequent-token fraction, duplicate-bigram
    fraction. Everything is a per-row array expression — no explode, no
    shuffle, no UDF."""
    d = Tables(spark, sf_dir).documents
    ws = F.split(F.col("text"), " ")
    # sliding_windows (ws evaluated O(1)/row) — the element_at(ws, i)
    # form re-ran split() per bigram (r9 re-eval audit)
    grams = F.transform(
        T.sliding_windows(ws, 2), lambda s: F.concat_ws(" ", s["0"], s["1"])
    )
    # max token frequency as the longest run of the SORTED array — one
    # O(n log n) sort + one aggregate pass, vs the previous
    # distinct×filter double scan (O(n²) compares with ws re-split per
    # distinct token). aggregate()'s argument evaluates once per row.
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    run = lambda acc, x: F.when(  # noqa: E731
        x == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1))
    # `best` folds in the PREVIOUS step's run, so the run CASE is
    # spliced exactly once per element (r10 ADVICE — the old form
    # evaluated it twice, once for `run` and once inside greatest);
    # the final run is folded in by the finish lambda.
    top_cnt = F.aggregate(
        F.array_sort(ws),
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], acc["run"]).alias("best"),
        ),
        lambda acc: F.greatest(acc["best"], acc["run"]),
    )
    dup_bigram = F.when(
        F.size(ws) >= 2,
        (F.size(grams) - F.size(F.array_distinct(grams))).cast("double")
        / F.size(grams).cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tok"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_uniq"),
        (top_cnt.cast("double") / F.size(ws).cast("double")).alias("top_tok_frac"),
        dup_bigram.alias("dup_bigram_frac"),
    )


@query(
    "llm_tfidf_topterms",
    # score = tf * N / df as ONE double division of exact integers —
    # no ln(), so both engines produce bit-identical doubles and the
    # ranking (score DESC, tok ASC) is engine-exact.
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT doc_id, tok, tf, df, tfidf, rn FROM (
      SELECT t.doc_id, t.tok, t.tf, d.df,
             CAST(t.tf * n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE) AS tfidf,
             CAST(row_number() OVER (PARTITION BY t.doc_id ORDER BY
                 CAST(t.tf * n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE) DESC,
                 t.tok) AS BIGINT) AS rn
      FROM tf t JOIN dfreq d USING (tok), n)
    WHERE rn <= 3
    """,
)
def llm_tfidf_topterms(spark, sf_dir):
    """Top-3 TF-IDF terms per document. Scale shape: the document-
    frequency table is vocabulary-sized (broadcast to the tf relation),
    the corpus count is one scalar, and the only data-sized shuffles are
    the (doc, tok) aggregate and the per-doc top-k window — which Spark
    4 executes as a partial WindowGroupLimit before the shuffle."""
    from pyspark.sql.window import Window

    d = Tables(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(T.words(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            (
                (F.col("tf") * F.col("n_docs")).cast("double")
                / F.col("df").cast("double")
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "llm_decontaminate",
    # Benchmark decontamination: training docs sharing any word 5-gram
    # with the (broadcast-small) eval set are flagged with their
    # distinct-collision count. Eval set here = doc_id < 10 (stand-in
    # for a benchmark suite; the mechanism is the point).
    oracle="""
    WITH tg AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
          generate_series(1, len(string_split(text,' ')) - 4),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
            || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3]
            || ' ' || string_split(text,' ')[i+4]))) AS tok
      FROM documents WHERE doc_id >= 10
    ),
    eg AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
          generate_series(1, len(string_split(text,' ')) - 4),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
            || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3]
            || ' ' || string_split(text,' ')[i+4]))) AS tok
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tg JOIN eg USING (tok)
    GROUP BY doc_id
    """,
)
def llm_decontaminate(spark, sf_dir):
    """Training-vs-benchmark n-gram contamination check: the eval set's
    distinct 5-grams broadcast to the training scan; one shuffle (the
    per-doc collision count) of only the COLLIDING rows. At 100 TB the
    eval suite is tiny by construction, so the corpus never reshuffles
    on content — the canonical decontamination shape."""
    d = Tables(spark, sf_dir).documents
    train = d.filter(F.col("doc_id") >= 10)
    holdout = d.filter(F.col("doc_id") < 10)
    tg = D.word_ngrams(train, 5)
    eg = D.word_ngrams(holdout, 5).select("tok").distinct()
    return (
        tg.join(F.broadcast(eg), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "llm_text_normalize",
    # DuckDB regexp_replace is first-match-only without the 'g' flag;
    # Spark's replaces all occurrences — the oracle passes 'g' so both
    # engines apply the same global rewrite.
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
    FROM documents
    """,
)
def llm_text_normalize(spark, sf_dir):
    """Canonical text normalization for dedup/tokenization: lowercase,
    non-alphanumerics to spaces, whitespace collapsed, trimmed. Pure
    codegen string expressions — scan-bound at any scale."""
    d = Tables(spark, sf_dir).documents
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return d.select("doc_id", norm.alias("norm"))


@query(
    "llm_pii_redact",
    # The synthetic corpus carries no PII, so both engines first seed
    # deterministic markers (an email for doc_id % 3 = 0, a phone for
    # doc_id % 7 = 2) and then scrub them — the redaction mechanics are
    # what is under test, and the injection makes them observable.
    # DuckDB regexp_replace needs the 'g' flag to match Spark's
    # replace-all; counts come from len(regexp_extract_all) vs Spark's
    # regexp_count.
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com now'
                  WHEN doc_id % 7 = 2
                    THEN text || ' call +1-555-'
                         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+'))
                AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\\+1-555-[0-9]{4}'))
                AS INT) AS n_phones,
           regexp_replace(regexp_replace(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+', '[EMAIL]', 'g'),
               '\\+1-555-[0-9]{4}', '[PHONE]', 'g') AS redacted
    FROM seeded
    """,
)
def llm_pii_redact(spark, sf_dir):
    """PII scrub for corpus curation: count and redact email/phone
    patterns. Pure codegen regex over the scan — no shuffle, no UDF;
    at 100 TB this is scan-bound and embarrassingly parallel, the same
    shape as any rule-based cleaning pass."""
    d = Tables(spark, sf_dir).documents
    email = "[a-z0-9._%+-]+@[a-z0-9.-]+"
    phone = r"\+1-555-[0-9]{4}"
    seeded = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).when(
        F.col("doc_id") % 7 == 2,
        F.concat(
            F.col("text"),
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    return d.select("doc_id", seeded.alias("text")).select(
        "doc_id",
        F.regexp_count("text", F.lit(email)).alias("n_emails"),
        F.regexp_count("text", F.lit(phone)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", email, "[EMAIL]"), phone, "[PHONE]"
        ).alias("redacted"),
    )


# Chunking geometry: fixed token window with overlap (stride < window),
# the standard training-data prep shape. Integer-only chunk-count
# arithmetic so both engines enumerate identical chunk grids.
_CHUNK_W = 32
_CHUNK_S = 24


@query(
    "llm_chunk_documents",
    # DuckDB list_slice(l, b, e) is 1-based inclusive-of-e; Spark
    # slice(l, b, length) takes a length — both sides below produce the
    # window [start+1, start+W] clipped to n.
    oracle=lambda: f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    grid AS (
      SELECT doc_id, t, n,
             unnest(generate_series(0,
                 (greatest(n - {_CHUNK_W}, 0) + {_CHUNK_S} - 1)
                   // {_CHUNK_S})) AS chunk_id
      FROM toks
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(least({_CHUNK_W}, n - chunk_id * {_CHUNK_S}) AS INT)
             AS n_tokens,
           array_to_string(list_slice(t, chunk_id * {_CHUNK_S} + 1,
               least(chunk_id * {_CHUNK_S} + {_CHUNK_W}, n)), ' ')
             AS chunk_text
    FROM grid
    """,
)
def llm_chunk_documents(spark, sf_dir):
    """Overlapping fixed-size token chunks (window 32, stride 24) for
    tokenization/context packing — see operators/chunking.py for the
    scale rationale (one explode, no shuffle, linear output)."""
    d = Tables(spark, sf_dir).documents
    return chunk_documents(d, _CHUNK_W, _CHUNK_S)


# ---------------------------------------------------------------------------
# Deduplication family
# ---------------------------------------------------------------------------


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' '))
             AS fp_prefix,
           min(doc_id) AS keep_doc,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def llm_dedup_exact(spark, sf_dir):
    # Hash-groupBy dedup: one shuffle on the fingerprint, deterministic
    # keeper (min doc_id). Keyed on the prefix fingerprint because the
    # synthetic corpus has no full-text duplicates (it does have
    # shared-prefix near-dups).
    d = Tables(spark, sf_dir).documents
    return (
        d.select("doc_id", T.fingerprint_prefix(F.col("text"), 5).alias("fp_prefix"))
        .groupBy("fp_prefix")
        .agg(F.min("doc_id").alias("keep_doc"), F.count(F.lit(1)).alias("n_copies"))
    )


_MINHASH_ORACLE = f"""
    WITH {_TOKENS_CTE},
    sigs AS (SELECT doc_id, {_SIG_EXPRS} FROM tt GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    {_jaccard_cte(0.5)}
    SELECT doc_a, doc_b, jaccard, is_dup FROM verified WHERE is_dup
    """

# Star-edge near-duplicate EDGES (operators/dedup.py::minhash_dup_edges
# replayed in SQL): identical-signature groups contribute k−1
# (rep, member) star edges instead of k² pairs; cross-group candidates
# band-join group REPRESENTATIVES only. Both edge families are exact-
# Jaccard-verified. Yields dups(doc_a, doc_b). Token ids use the
# dictionary-FREE md5-mod-P path (hashed=True), mirroring
# minhash_dup_edges' 100 TB default — no global vocabulary sort on
# either engine.
_STAR_EDGE_CTES = f"""
    {_tokens_cte(hashed=True)},
    sigs AS (SELECT doc_id, {_SIG_EXPRS} FROM tt GROUP BY doc_id),
    grp AS (SELECT {_SIG_COLS}, min(doc_id) AS rep
            FROM sigs GROUP BY {_SIG_COLS}),
    star AS (
      SELECT g.rep AS doc_a, s.doc_id AS doc_b
      FROM sigs s JOIN grp g USING ({_SIG_COLS})
      WHERE s.doc_id > g.rep
    ),
    repsigs AS (SELECT rep AS doc_id, {_SIG_COLS} FROM grp),
    bands AS ({_band_selects("repsigs")}),
    crossc AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    cand AS (SELECT doc_a, doc_b FROM star
             UNION ALL SELECT doc_a, doc_b FROM crossc),
    {_jaccard_cte(0.5)},
    dups AS (SELECT doc_a, doc_b FROM verified WHERE is_dup)
    """


@query(
    "llm_dedup_minhash",
    # Headline minhash dedup on the DICTIONARY-FREE token ids
    # (operators/dedup.py::hashed_token_ids): tid is a row-local
    # md5-prefix-mod-P hash, so there is no global vocabulary sort — the
    # one scale-sensitive step of the dictionary path. The oracle replays
    # the identical hash (md5 is byte-identical across engines).
    oracle=lambda: f"""
    WITH {_tokens_cte(hashed=True)},
    sigs AS (SELECT doc_id, {_SIG_EXPRS} FROM tt GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    {_jaccard_cte(0.5)}
    SELECT doc_a, doc_b, jaccard, is_dup FROM verified WHERE is_dup
    """,
)
def llm_dedup_minhash(spark, sf_dir):
    """Scored near-dup pair report on the 100 TB token-id path: no token
    dictionary, no global sort — ids are computed per row; banded-minhash
    candidates, exact-Jaccard verify, thresholded output (sub-threshold
    candidates are verified but not reported — the report would otherwise
    be quadratic in signature-group size; see minhash_dedup_pairs)."""
    d = Tables(spark, sf_dir).documents
    return D.minhash_dedup_pairs(d, threshold=0.5)


@query("llm_dedup_minhash_dict", oracle=_MINHASH_ORACLE)
def llm_dedup_minhash_dict(spark, sf_dir):
    """DICTIONARY-variant minhash dedup — the row_number-arithmetic
    demo: token ids come from a lexicographic vocabulary (broadcast
    dictionary join; operators/dedup.py::token_ids), which the oracle
    replays exactly via row_number() OVER (ORDER BY tok). Output
    contract identical to llm_dedup_minhash (candidate recall can differ
    marginally where 31-bit hashed ids collide; verification is exact
    either way). Kept as the demo of exact cross-engine id arithmetic;
    the hashed path is the scale default."""
    d = Tables(spark, sf_dir).documents
    return D.minhash_dedup_pairs(d, threshold=0.5, hashed=False)


def incremental_dedup_oracle() -> str:
    """The ONE oracle replay shared by all three incremental-dedup
    surfaces (llm_dedup_incremental, llm_dedup_signature_store,
    stream_ingest_dedup — they produce the identical result set by
    contract, so their oracles must never drift apart): incoming docs
    (doc_id % 5 = 0) band-join the corpus (cross) and each other
    (in-batch, later-arrival-is-new orientation), then the standard
    exact-Jaccard verification over the full token relation."""
    return f"""
    WITH {_tokens_cte(hashed=True)},
    sigs AS (SELECT doc_id, {_SIG_EXPRS} FROM tt GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    candx AS (
      SELECT DISTINCT b.doc_id AS doc_a, a.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
    ),
    candn AS (
      SELECT DISTINCT b.doc_id AS doc_a, a.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
      WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 = 0
    ),
    cand AS (SELECT doc_a, doc_b FROM candx
             UNION ALL SELECT doc_a, doc_b FROM candn),
    {_jaccard_cte(0.5)}
    SELECT doc_a AS new_doc, doc_b AS dup_of, jaccard, is_dup
    FROM verified WHERE is_dup
    """


@query("llm_dedup_incremental", oracle=incremental_dedup_oracle)
def llm_dedup_incremental(spark, sf_dir):
    """INCREMENTAL near-dup detection — a new ingestion batch (docs with
    doc_id % 5 = 0, ~20% of the table, standing in for today's crawl)
    checked against the existing corpus (the other 80%) WITHOUT
    re-pairing the corpus against itself: the batch's band relation
    broadcasts, the corpus never shuffles, in-batch pairs go through the
    salted self-join. This is the steady-state production shape of
    dedup at 100 TB — per-batch cost scales with the batch, not the
    corpus (operators/dedup.py::incremental_minhash_dedup)."""
    d = Tables(spark, sf_dir).documents
    incoming = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    return D.incremental_minhash_dedup(corpus, incoming, threshold=0.5)


@query(
    "llm_dedup_signature_store",
    # Stored signatures are bit-identical to recomputed ones, so the
    # oracle is the shared incremental replay.
    oracle=incremental_dedup_oracle,
)
def llm_dedup_signature_store(spark, sf_dir):
    """Incremental dedup against a PERSISTED signature store — the
    production mechanics made real: corpus signatures are materialized
    to parquet (the per-batch-appended store artifact) and the batch
    dedups against the STORE, never re-tokenizing the corpus; the
    exact-Jaccard verify fetches only candidate-hit corpus docs by id
    (semi-join), so verify scan cost tracks the batch too. Identical
    output to llm_dedup_incremental — same signatures, same candidates,
    same verification (operators/dedup.py::incremental_dedup_from_store)."""
    from distributed_query_engine_spark.plans.sources import _tmp

    d = Tables(spark, sf_dir).documents
    incoming = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    store = _tmp(sf_dir, "minhash_sig_store")
    D.build_signature_store(spark, corpus, store, hashed=True)
    return D.incremental_dedup_from_store(
        spark, store, corpus, incoming, threshold=0.5
    )


@query(
    "llm_dedup_clusters",
    oracle=lambda: f"""
    WITH RECURSIVE {_STAR_EDGE_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dups
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM dups
    ),
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id, min(lbl) AS component FROM walk GROUP BY node
    """,
)
def llm_dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: star-edge dup graph (minhash_dup_edges —
    edge count linear in signature-group size, not k²) → connected
    components by iterative min-label propagation (operators/dedup.py::
    connected_components); every document appears, singletons label
    themselves. The oracle states the same fixpoint as a recursive CTE
    (min reachable label) over the same star+representative edges."""
    d = Tables(spark, sf_dir).documents
    edges = D.minhash_dup_edges(d, threshold=0.5)
    comp = D.connected_components(edges)
    return d.select("doc_id").join(
        comp, F.col("doc_id") == F.col("node"), "left"
    ).select(
        "doc_id", F.coalesce("comp", F.col("doc_id")).alias("component")
    )


@query(
    "llm_corpus_curation",
    oracle=lambda: f"""
    WITH RECURSIVE {_STAR_EDGE_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dups
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM dups
    ),
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS component FROM walk GROUP BY node),
    scored AS (
      SELECT doc_id, lang, {_QUALITY_SQL} AS quality, md5(text) AS fp
      FROM documents
    ),
    pass AS (SELECT * FROM scored WHERE quality >= 0.5),
    uniq AS (
      SELECT * FROM pass
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT u.doc_id, u.lang, u.quality, c.component
    FROM uniq u JOIN comp c USING (doc_id)
    QUALIFY row_number() OVER (PARTITION BY c.component ORDER BY u.doc_id) = 1
    """,
)
def llm_corpus_curation(spark, sf_dir):
    """End-to-end training-corpus curation — the composition the
    individual LLM ops exist for:

      quality gate (functions/text.py::quality_score ≥ 0.5)
      → exact dedup (md5 fingerprint, keep lowest doc_id)
      → near-dup dedup (minhash → star-edge dup graph → connected
        components; keep each cluster's lowest surviving doc_id).

    Every stage is the already-oracle-checked operator; the pipeline
    itself is one declarative plan — Catalyst fuses the scalar stages
    into the scans, and the only shuffles are the operators' own."""
    from pyspark.sql.window import Window

    d = Tables(spark, sf_dir).documents
    comp = D.connected_components(D.minhash_dup_edges(d, threshold=0.5)).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    comp_all = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    scored = d.select(
        "doc_id",
        "lang",
        T.quality_score(F.col("text")).alias("quality"),
        T.fingerprint_md5(F.col("text")).alias("fp"),
    )
    passed = scored.filter(F.col("quality") >= 0.5)
    uniq = (
        passed.withColumn(
            "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )
    return (
        uniq.join(comp_all, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("component").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "quality", "component")
    )


_SIMHASH_A, _SIMHASH_B = D.hash_params(0)
_SIMHASH_SUMS = ", ".join(
    f"sum(CASE WHEN (((tid*{_SIMHASH_A}+{_SIMHASH_B})%{D.P}) >> {j}) & 1 = 1 "
    f"THEN 1 ELSE -1 END) AS s{j}"
    for j in range(D.SIMHASH_BITS)
)
_SIMHASH_VALUE = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
    for j in range(D.SIMHASH_BITS)
)


@query(
    "llm_dedup_simhash",
    # hashed=True tokens CTE: simhash shares the dictionary-free
    # md5-mod-P token ids with the minhash default (r6) — no global
    # vocabulary sort on either engine.
    oracle=lambda: f"""
    WITH {_tokens_cte(hashed=True)},
    sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM tt GROUP BY doc_id),
    sh AS (SELECT doc_id, {_SIMHASH_VALUE} AS simhash FROM sums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b
      ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def llm_dedup_simhash(spark, sf_dir):
    d = Tables(spark, sf_dir).documents
    return D.simhash_near_pairs(d, max_hamming=6)


@query(
    "llm_dedup_simhash_multiband",
    # The multiband blocker (8 bands x 4 bits) has GUARANTEED recall for
    # hamming <= 7 by pigeonhole, so the oracle is the UNRESTRICTED
    # hamming self-join -- exact completeness stated as SQL (the prefix
    # variant's oracle must replicate its own blocking instead).
    oracle=lambda: f"""
    WITH {_tokens_cte(hashed=True)},
    sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM tt GROUP BY doc_id),
    sh AS (SELECT doc_id, {_SIMHASH_VALUE} AS simhash FROM sums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def llm_dedup_simhash_multiband(spark, sf_dir):
    """Complete-recall simhash near-dup pairs: multi-band LSH blocking
    (operators/dedup.simhash_near_pairs_multiband) whose candidate set
    provably contains EVERY pair within hamming 6 -- the all-pairs
    oracle is the completeness proof, while the engine never runs an
    all-pairs join (banded + salted + group-collapsed, same skew
    discipline as the minhash pipeline)."""
    d = Tables(spark, sf_dir).documents
    return D.simhash_near_pairs_multiband(d, max_hamming=6)


@query(
    "llm_dedup_ngram",
    # Mirrors operators/dedup.py::ngram_jaccard_pairs — the SAME banded-
    # minhash LSH as the word-token pipeline, run over distinct word
    # BIGRAMS with dictionary-FREE md5-mod-P token ids (hashed=True on
    # both sides: the bigram vocabulary is too wide to sort globally).
    # candidate_pairs_grouped is pair-set-identical to the plain
    # distinct band self-join (identical-signature members share every
    # band with their representative), so the oracle states the simple
    # form.
    oracle=lambda: f"""
    WITH {_tokens_cte(_BIGRAM_LIST, hashed=True)},
    sigs AS (SELECT doc_id, {_SIG_EXPRS} FROM tt GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    {_jaccard_cte(0.3)}
    SELECT doc_a, doc_b, jaccard, is_dup FROM verified WHERE is_dup
    """,
)
def llm_dedup_ngram(spark, sf_dir):
    d = Tables(spark, sf_dir).documents
    return D.ngram_jaccard_pairs(d, threshold=0.3)


@query(
    "llm_dedup_embcos",
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    nb AS (SELECT nv.vec_id, nv.ivec, nv.nsq, b.bucket
           FROM nv JOIN buckets b USING (vec_id))
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
           list_dot_product(a.ivec, b.ivec)
             / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
    FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.ivec, b.ivec)
             / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.35
    """,
)
def llm_dedup_embcos(spark, sf_dir):
    """Embedding-cosine near-dup pairs, LSH-bucket-blocked (no raw-label
    blocking — see operators/similarity.py::cosine_near_dup_pairs for
    the scale rationale)."""
    e = Tables(spark, sf_dir).embeddings
    return S.cosine_near_dup_pairs(e, threshold=0.35)


# Shared CTEs of the substring-span family (report / top / mask): the
# 0-based span positions (DuckDB's 1-based generate_series shifted by 1),
# the span text, the md5-prefix-60-bit span id, and the duplicated-gid
# set. generate_series(1, len-k+1) is empty for short docs, matching the
# engine's empty-window slices in operators/dedup._span_gids.
_K1 = D.SPAN_K - 1  # DuckDB's inclusive 1-based slice: tl[i:i+_K1] = K tokens

_SPAN_CTES = f"""
    base AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
    grams AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             array_to_string(tl[i:i+{_K1}], ' ') AS span,
             CAST(('0x' || substr(md5(array_to_string(tl[i:i+{_K1}], ' ')), 1, 15))
               AS BIGINT) AS gid
      FROM base, LATERAL unnest(generate_series(1, len(tl) - {_K1})) AS g(i)
    ),
    dupg AS (SELECT gid FROM grams GROUP BY gid HAVING count(*) >= 2)
"""


@query(
    "llm_dedup_substring",
    # Mirrors operators/dedup.py::duplicated_span_report arithmetically:
    # the same span ids, the same interval-union walk (first span
    # contributes k, later ones min(k, pos - prev)), integer floor-div
    # permille.
    oracle=lambda: f"""
    WITH {_SPAN_CTES},
    steps AS (
      SELECT g.doc_id, g.pos,
             lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
      FROM grams g JOIN dupg USING (gid)
    ),
    cov AS (
      SELECT doc_id, count(*) AS dup_spans,
             sum(CASE WHEN prev IS NULL THEN {D.SPAN_K}
                      ELSE least({D.SPAN_K}, pos - prev) END) AS dup_tokens
      FROM steps GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(greatest(len(b.tl) - {D.SPAN_K - 1}, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(c.dup_spans, 0) AS BIGINT) AS dup_spans,
           CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(c.dup_tokens, 0) * 1000 // len(b.tl) AS BIGINT)
             AS dup_token_permille
    FROM base b LEFT JOIN cov c USING (doc_id)
    """,
)
def llm_dedup_substring(spark, sf_dir):
    """Substring-span exact-dedup report: per doc, the k-token spans
    (k=8) occurring >= 2 times corpus-wide and the union of tokens they
    cover — the rolling-k-gram re-expression of suffix-array dedup (see
    operators/dedup.py::duplicated_span_report for the 100 TB shape:
    row-local span ids, one counted shuffle, dup-only join-back)."""
    d = Tables(spark, sf_dir).documents
    return D.duplicated_span_report(d)


@query(
    "llm_dedup_substring_top",
    # Shared span CTEs; the rank-20 boundary is deterministic via the
    # (count desc, gid asc) tie-break both engines share.
    oracle=lambda: f"""
    WITH {_SPAN_CTES},
    top AS (
      SELECT gid, count(*) AS n_occurrences FROM grams GROUP BY gid
      HAVING count(*) >= 2
      ORDER BY n_occurrences DESC, gid LIMIT 20
    )
    SELECT min(g.span) AS span,
           t.n_occurrences,
           count(DISTINCT g.doc_id) AS n_docs
    FROM grams g JOIN top t USING (gid)
    GROUP BY t.gid, t.n_occurrences
    """,
)
def llm_dedup_substring_top(spark, sf_dir):
    """Boilerplate report: the 20 most frequent duplicated 8-token spans
    with text, occurrence count, and distinct-doc reach (see
    operators/dedup.py::top_duplicated_spans — narrow gid count shuffle,
    TakeOrderedAndProject top-n, winners broadcast back for text)."""
    d = Tables(spark, sf_dir).documents
    return D.top_duplicated_spans(d)


@query(
    "llm_dedup_substring_mask",
    # Shared span CTEs; the masking itself is a nested list lambda on
    # both engines (token index t survives iff no dup position p has
    # p <= t < p+k).
    oracle=lambda: f"""
    WITH {_SPAN_CTES},
    dp AS (
      SELECT g.doc_id, list_sort(list(g.pos)) AS dps
      FROM grams g JOIN dupg USING (gid) GROUP BY g.doc_id
    ),
    masked AS (
      SELECT b.doc_id, b.tl,
             list_filter(
               generate_series(0, len(b.tl) - 1),
               t -> len(list_filter(COALESCE(d.dps, []),
                        p -> p <= t AND t < p + {D.SPAN_K})) = 0
             ) AS kept
      FROM base b LEFT JOIN dp d USING (doc_id)
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_transform(kept, t -> tl[t + 1]), ' '), '')
             AS clean_text,
           CAST(len(tl) AS BIGINT) AS n_tok,
           CAST(len(tl) - len(kept) AS BIGINT) AS n_removed
    FROM masked
    """,
)
def llm_dedup_substring_mask(spark, sf_dir):
    """The substring-dedup TRANSFORM: each document rewritten with every
    token covered by a corpus-duplicated 8-span removed (the cut the
    suffix-array dedup papers apply to the training set; see
    operators/dedup.py::mask_duplicated_spans — narrow gid count
    shuffle, per-doc position lists, row-local nested-lambda mask)."""
    d = Tables(spark, sf_dir).documents
    return D.mask_duplicated_spans(d)


@query(
    "llm_dedup_minhash_recall",
    # Truth and candidates share ONE arithmetic (md5-mod-P tid sets —
    # the same tt CTE the signatures hash), so the recall curve is
    # exact-checkable: the oracle replays the all-pairs tid-set join,
    # the signature/band CTEs, and the decile bucketing verbatim.
    oracle=lambda: f"""
    WITH {_tokens_cte(hashed=True)},
    td AS (SELECT DISTINCT doc_id, tid FROM tt),
    sizes AS (SELECT doc_id, count(*) AS n FROM td GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM td a JOIN td b ON a.tid = b.tid AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.doc_a, i.doc_b,
             CAST((10 * n_inter) // (sa.n + sb.n - n_inter) AS BIGINT) AS bucket
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE (10 * n_inter) // (sa.n + sb.n - n_inter) >= 1
    ),
    sigs AS (SELECT doc_id, {_SIG_EXPRS} FROM tt GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    nt AS (SELECT bucket, count(*) AS n_true FROM truth GROUP BY bucket),
    nh AS (
      SELECT t.bucket, count(*) AS n_hit
      FROM truth t JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
      GROUP BY t.bucket
    )
    SELECT t.bucket, CAST(t.n_true AS BIGINT) AS n_true,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(h.n_hit, 0) * 1000 // t.n_true AS BIGINT)
             AS recall_permille
    FROM nt t LEFT JOIN nh h USING (bucket)
    """,
)
def llm_dedup_minhash_recall(spark, sf_dir):
    """Measured MinHash-LSH recall S-curve by exact-Jaccard decile —
    for each jaccard bucket >= 0.1, the fraction of true pairs the
    banded candidate generation surfaces (see
    operators/dedup.py::minhash_recall_curve; quadratic AUDIT harness,
    production candidate path reused unchanged)."""
    d = Tables(spark, sf_dir).documents
    return D.minhash_recall_curve(d)


_SEMDEDUP_THR = 0.35

_COS = (
    "list_dot_product({a}, {b}) / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
)


@query(
    "llm_semdedup",
    # Mirrors operators/similarity.py::semdedup — the IVF assignment CTE
    # is identical to llm_similarity_ivf's; dups = vectors with a
    # lower-id same-cell neighbor at/above the threshold.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a
      JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      WHERE {_COS.format(a='a.ivec', b='b.ivec', na='a.nsq', nb='b.nsq')}
            >= {_SEMDEDUP_THR}
    )
    SELECT a.vec_id, a.cell_id, (d.vec_id IS NULL) AS kept
    FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id
    """,
)
def llm_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    exact cosine WITHIN coarse clusters only — the cluster-then-compare
    pattern that keeps the pairwise cost linear-ish at corpus scale. One
    row per vector with its cell and a kept flag (keep-lowest)."""
    e = Tables(spark, sf_dir).embeddings
    return S.semdedup(e, threshold=_SEMDEDUP_THR)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_QUERY_IDS = [0, 1, 2, 3, 4]
# The recall measurement uses a wider panel: 5 queries = 25 ground-truth
# pairs, whose recall estimate swung +-0.2 between SFs (r8 sweep); 25
# queries = 125 pairs is stable to ~+-0.05.
_RECALL_QUERY_IDS = list(range(25))
_RECALL_IDS_SQL = ", ".join(str(i) for i in _RECALL_QUERY_IDS)


@query(
    "llm_similarity_topk",
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM nv WHERE vec_id IN (0,1,2,3,4)),
    scored AS (
      SELECT q.q_id, c.vec_id,
             list_dot_product(q.q_ivec, c.ivec)
               / (sqrt(CAST(q.q_nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))
               AS cosine
      FROM q, nv c WHERE c.vec_id != q.q_id
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_topk(spark, sf_dir):
    e = Tables(spark, sf_dir).embeddings
    return S.topk_cosine(e, _QUERY_IDS, k=5)


@query(
    "llm_similarity_ann_lsh",
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    nb AS (SELECT nv.vec_id, nv.ivec, nv.nsq, b.bucket
           FROM nv JOIN buckets b USING (vec_id)),
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq, bucket AS q_bucket
          FROM nb WHERE vec_id IN (0,1,2,3,4)),
    qp AS (SELECT q_id, q_ivec, q_nsq, xor(q_bucket, m.mask) AS probe_bucket
           FROM q, (SELECT unnest([{_PROBE_MASKS_SQL}]) AS mask) m),
    scored AS (
      SELECT q.q_id, c.vec_id,
             list_dot_product(q.q_ivec, c.ivec)
               / (sqrt(CAST(q.q_nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))
               AS cosine
      FROM qp q JOIN nb c ON c.bucket = q.probe_bucket AND c.vec_id != q.q_id
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_ann_lsh(spark, sf_dir):
    e = Tables(spark, sf_dir).embeddings
    return S.topk_cosine_ann(e, _QUERY_IDS, k=5)


@query(
    "llm_similarity_ivf",
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM nv WHERE vec_id IN (0,1,2,3,4)),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id,
             {_COS.format(a='q.q_ivec', b='a.ivec', na='q.q_nsq', nb='a.nsq')} AS cosine
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id
      JOIN q ON q.q_id = p.q_id
      WHERE a.vec_id != p.q_id
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_ivf(spark, sf_dir):
    """IVF ANN (operators/similarity.py::topk_cosine_ivf): deterministic
    coarse quantizer + n_probe cell search — the scale path SURVEY.md
    §2.3 names next to the LSH variant."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_cosine_ivf(e, _QUERY_IDS, k=5)


@query(
    "llm_similarity_filtered",
    # Same coarse chain as llm_similarity_ivf, with the label riding in
    # the assignment relation and the metadata predicate (candidate
    # label = query label) applied inside the probed-cell scan.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, label, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.label, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    q AS (SELECT vec_id AS q_id, label AS q_label,
                 ivec AS q_ivec, nsq AS q_nsq
          FROM assigned WHERE vec_id IN (0,1,2,3,4)),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id, a.label,
             {_COS.format(a='q.q_ivec', b='a.ivec', na='q.q_nsq', nb='a.nsq')} AS cosine
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id
      JOIN q ON q.q_id = p.q_id
      WHERE a.vec_id != p.q_id AND a.label = q.q_label
    )
    SELECT q_id, vec_id, label, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_filtered(spark, sf_dir):
    """HYBRID (metadata-filtered) ANN — "nearest neighbors in the
    query's own category", the predicate-plus-vector search every
    production store serves. The index stays filter-agnostic (same
    quantizer/cells as llm_similarity_ivf); the label column rides
    INSIDE the assignment relation (operators/similarity.py::
    _assign_to meta_cols) so the predicate evaluates during the
    probed-cell scan — no join back to the corpus, candidate cost =
    n_probe/n_cells × label selectivity. At 100 TB this is why vector
    stores keep filterable metadata columnar next to the codes."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_cosine_ivf_filtered(e, _QUERY_IDS, k=5)


_DELETE_MOD, _DELETE_RESIDUE = 10, 7


@query(
    "llm_similarity_ivf_delete",
    # The unfiltered IVF replay with tombstoned ids excluded from the
    # SCANNED side only — queries still resolve from the full index.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM assigned WHERE vec_id IN (0,1,2,3,4)),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id,
             {_COS.format(a='q.q_ivec', b='a.ivec', na='q.q_nsq', nb='a.nsq')} AS cosine
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id
      JOIN q ON q.q_id = p.q_id
      WHERE a.vec_id != p.q_id
        AND a.vec_id % {_DELETE_MOD} != {_DELETE_RESIDUE}
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_ivf_delete(spark, sf_dir):
    """DELETE lifecycle for the vector index — the third side of the
    CRUD triangle (build = llm_similarity_ivf_index, ingest =
    llm_similarity_ivf_incremental): deletions are a TOMBSTONE
    relation, never an index rewrite. The quantizer and every
    surviving assignment are untouched; search excludes tombstoned
    ids with ONE broadcast anti-join on the probed-cell scan
    (operators/similarity.py::topk_cosine_ivf_deleted). At 100 TB a
    per-delete rewrite of the cell-partitioned codes relation would be
    write-amplification death — tombstone-at-read + threshold
    compaction is how production stores (and every LSM system) handle
    it. Tombstones here: vec_id ≡ {_DELETE_RESIDUE} (mod
    {_DELETE_MOD}) — ~10% of the corpus, disjoint from the query
    panel."""
    e = Tables(spark, sf_dir).embeddings
    tomb = e.filter(
        F.pmod(F.col("vec_id"), F.lit(_DELETE_MOD)) == _DELETE_RESIDUE
    ).select("vec_id")
    return S.topk_cosine_ivf_deleted(e, _QUERY_IDS, tomb, k=5)


_COMPACT_NUM, _COMPACT_DEN = 2, 25  # compact a cell at >= 8% tombstones


@query(
    "llm_similarity_ivf_compact",
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT n.vec_id, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    stats AS (
      SELECT cell_id,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN vec_id % {_DELETE_MOD} = {_DELETE_RESIDUE}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_tomb
      FROM assigned GROUP BY cell_id)
    SELECT cell_id, n_total, n_tomb,
           CAST(n_tomb AS DOUBLE) / n_total AS tomb_frac,
           n_tomb * {_COMPACT_DEN} >= n_total * {_COMPACT_NUM} AS compacted,
           CASE WHEN n_tomb * {_COMPACT_DEN} >= n_total * {_COMPACT_NUM}
                THEN n_total - n_tomb ELSE n_total END AS n_stored_after
    FROM stats
    """,
)
def llm_similarity_ivf_compact(spark, sf_dir):
    """COMPACTION planning for the tombstoned index — the background
    half of llm_similarity_ivf_delete's read path: per cell,
    live/tombstone counts and whether the cell's tombstone fraction
    crossed the rewrite threshold ({_COMPACT_NUM}/{_COMPACT_DEN}),
    compared in EXACT integers so boundary cells agree cross-engine
    (operators/similarity.py::ivf_compaction_report). One
    map-combined aggregate over the assignment scan with the tombstone
    set broadcast; at 100 TB only flagged cells — hive partitions of
    the codes layout — get rewritten, everyone else keeps paying the
    read-side anti-join: LSM threshold economics for a vector index."""
    e = Tables(spark, sf_dir).embeddings
    tomb = e.filter(
        F.pmod(F.col("vec_id"), F.lit(_DELETE_MOD)) == _DELETE_RESIDUE
    ).select("vec_id")
    return S.ivf_compaction_report(
        e, tomb, threshold_num=_COMPACT_NUM, threshold_den=_COMPACT_DEN
    )


def _content_addressed_index(sf_dir, name: str, knobs: str, build) -> str:
    """Build-once, content-addressed ANN index staging (r12: VERDICT
    r11 item 4 + ADVICE item 4). The generation directory is keyed by
    a hash of (build knobs, source parquet fingerprint = per-file
    path+mtime_ns+size — the same self-invalidation contract as the
    ``bucketed_*``/streaming staging): regenerating the testdata
    changes the fingerprint, so a stale index can never be served. The
    build writes into a pid-suffixed scratch dir and PUBLISHES with one
    atomic ``os.rename`` — a concurrent reader either sees the complete
    previous generation or the complete new one, never a mixed
    centroids/codebooks/codes state (plain sequential overwrites only
    converge eventually, not for in-flight readers). A lost publish
    race discards the scratch build (both builders produce identical
    content — the build is deterministic in the source). Superseded
    ``gen-*`` siblings are swept best-effort after publish; a
    fingerprint hit skips the rebuild entirely."""
    import hashlib
    import os
    import shutil
    from pathlib import Path

    from distributed_query_engine_spark.plans.sources import _tmp
    from distributed_query_engine_spark.streaming.ops import (
        _source_fingerprint,
    )

    src = Path(sf_dir) / "embeddings.parquet"
    fp = hashlib.md5(
        f"{knobs}\n{_source_fingerprint(src)}".encode()
    ).hexdigest()[:16]
    root = Path(_tmp(sf_dir, name))
    final = root / f"gen-{fp}"
    if (final / "_BUILT").is_file():
        return str(final)
    scratch = root / f".build-{fp}-{os.getpid()}"
    if scratch.exists():
        shutil.rmtree(scratch)
    build(str(scratch))
    (scratch / "_BUILT").write_text(f"{name}\n{knobs}\n{fp}\n")
    try:
        os.rename(scratch, final)
    except OSError:
        # lost the publish race — identical content already live
        shutil.rmtree(scratch, ignore_errors=True)
    for sib in root.glob("gen-*"):
        if sib != final:
            shutil.rmtree(sib, ignore_errors=True)
    return str(final)




@query(
    "llm_similarity_ivf_index",
    # The index stores exactly the relations topk_cosine_ivf derives,
    # so the oracle is the same replay as llm_similarity_ivf's.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM nv WHERE vec_id IN (0,1,2,3,4)),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id,
             {_COS.format(a='q.q_ivec', b='a.ivec', na='q.q_nsq', nb='a.nsq')} AS cosine
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id
      JOIN q ON q.q_id = p.q_id
      WHERE a.vec_id != p.q_id
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_ivf_index(spark, sf_dir):
    """IVF ANN against a PERSISTED index artifact: centroids + corpus
    assignments materialized to parquet (assignments hive-partitioned
    by cell_id, so probing n_probe cells partition-prunes the scan to
    those cells' files), then searched without touching the embeddings
    table at all — query vectors are index lookups too. Identical
    results to llm_similarity_ivf; the build-once/search-many split is
    what a 100 TB deployment actually operates
    (operators/similarity.py::build_ivf_index / topk_cosine_ivf_index).
    The index dir is content-addressed + atomically published
    (:func:`_content_addressed_index`): fingerprint hit → search only."""
    e = Tables(spark, sf_dir).embeddings
    index = _content_addressed_index(
        sf_dir,
        "ivf_index",
        f"ivf:{S.N_CELLS}:lowest_id:0",
        lambda p: S.build_ivf_index(e, p),
    )
    return S.topk_cosine_ivf_index(spark, index, _QUERY_IDS, k=5)


# PQ/ADC oracle helpers: exact-integer squared L2 between fixed-point
# subvectors (every term a long below 2^53, so DuckDB's double-internal
# list_dot_product is exact — the established nsq practice).
_PQD = (
    "CAST(list_dot_product({a}, {a}) - 2*list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b}) AS BIGINT)"
)


def _pq_ctes(ids_sql: str = "0,1,2,3,4") -> list[str]:
    """The shared PQ CTE chain — subvectors, codebook seeds, one
    exact-integer Lloyd step (with empty-code carry), corpus encoding,
    and the query panel's distance tables — ending at ``codes`` and
    ``dt``. Shared by the plain-PQ, IVF-PQ, and PQ-recall oracles
    exactly as _kmeans_cents_ctes is shared by its consumers;
    ``ids_sql`` is the query panel (the recall oracle widens it to the
    25-query panel)."""
    m, k = S.PQ_M_SUB, S.PQ_K_CODES
    d_cb = _PQD.format(a="s.sv", b="c.c_sv")
    d_dt = _PQD.format(a="q.q_sv", b="c.c_sv")
    return [
        f"""sv AS (
      SELECT vec_id, g.m AS m,
             ivec[(g.m*(len(ivec)//{m})+1):((g.m+1)*(len(ivec)//{m}))] AS sv
      FROM nv, generate_series(0, {m - 1}) g(m)
      WHERE len(ivec) > 0)""",
        f"""cb0 AS (SELECT m, vec_id AS code_id, sv AS c_sv
            FROM sv WHERE vec_id < {k})""",
        f"""a0 AS (
      SELECT vec_id, m, sv, code_id FROM (
        SELECT s.vec_id, s.m, s.sv, c.code_id,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                 {d_cb} ASC, c.code_id) AS rn
        FROM sv s JOIN cb0 c ON c.m = s.m) WHERE rn = 1)""",
        """agg0 AS (
      SELECT m, code_id, d, sum(x) AS sx, count(*) AS c
      FROM (SELECT m, code_id, unnest(sv) AS x,
                   unnest(range(len(sv))) AS d
            FROM a0)
      GROUP BY m, code_id, d)""",
        """means0 AS (
      SELECT m, code_id,
             list(CAST(CASE WHEN sx >= 0 THEN (2*sx + c) // (2*c)
                            ELSE -((2*(-sx) + c) // (2*c)) END AS BIGINT)
                  ORDER BY d) AS c_sv
      FROM agg0 GROUP BY m, code_id)""",
        """cb1 AS (
      SELECT * FROM means0
      UNION ALL
      SELECT p.m, p.code_id, p.c_sv FROM cb0 p
      WHERE NOT EXISTS (SELECT 1 FROM means0 x
                        WHERE x.m = p.m AND x.code_id = p.code_id))""",
        f"""codes AS (
      SELECT vec_id, m, code_id FROM (
        SELECT s.vec_id, s.m, c.code_id,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                 {d_cb} ASC, c.code_id) AS rn
        FROM sv s JOIN cb1 c ON c.m = s.m) WHERE rn = 1)""",
        f"""qsv AS (SELECT vec_id AS q_id, m, sv AS q_sv
            FROM sv WHERE vec_id IN ({ids_sql}))""",
        f"""dt AS (
      SELECT q.q_id, c.m, c.code_id, {d_dt} AS dist
      FROM qsv q JOIN cb1 c ON c.m = q.m)""",
    ]


def _pq_oracle() -> str:
    """DuckDB replay of the full PQ pipeline — codebook training
    (lowest-id seeds + one exact-integer Lloyd step per subspace),
    corpus encoding, per-query distance tables, and the ADC sum — the
    llm_kmeans data-dependent-oracle discipline extended with the
    subspace as a grouping column."""
    joined = ",\n    ".join(_pq_ctes())
    return f"""
    WITH {_IVEC_CTE},
    {joined},
    scored AS (
      SELECT d.q_id, kk.vec_id, CAST(sum(d.dist) AS BIGINT) AS adc_dist
      FROM codes kk JOIN dt d ON d.m = kk.m AND d.code_id = kk.code_id
      WHERE kk.vec_id != d.q_id
      GROUP BY d.q_id, kk.vec_id
    )
    SELECT q_id, vec_id, adc_dist, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY adc_dist, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """


def _ivfpq_ctes(ids_sql: str = "0,1,2,3,4") -> list[str]:
    """Coarse-quantizer CTE chain for the IVF-PQ family (composes with
    :func:`_pq_ctes`' relations): pv, integer-L2 lowest-id cells,
    argmin assignment, the query panel, per-query n_probe probe sets,
    and the probed-cells ADC sum ``ivfpq_scored``. Shared by the
    IVF-PQ search, re-rank, and recall oracles."""
    d_asg = _PQD.format(a="n.ivec", b="c.c_ivec")
    d_prb = _PQD.format(a="q.q_ivec", b="c.c_ivec")
    return [
        "pv AS (SELECT vec_id, ivec FROM nv WHERE len(ivec) > 0)",
        f"""cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec
              FROM pv WHERE vec_id < {S.N_CELLS})""",
        f"""assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT n.vec_id, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {d_asg} ASC, c.cell_id) AS rn
        FROM pv n, cents c) WHERE rn = 1)""",
        f"""qv AS (SELECT vec_id AS q_id, ivec AS q_ivec
           FROM pv WHERE vec_id IN ({ids_sql}))""",
        f"""probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {d_prb} ASC, c.cell_id) AS prn
        FROM qv q, cents c) WHERE prn <= {S.N_PROBE})""",
        """ivfpq_scored AS (
      SELECT d.q_id, kk.vec_id, CAST(sum(d.dist) AS BIGINT) AS adc_dist
      FROM codes kk
      JOIN assigned a ON a.vec_id = kk.vec_id
      JOIN probes p ON p.cell_id = a.cell_id
      JOIN dt d ON d.q_id = p.q_id AND d.m = kk.m AND d.code_id = kk.code_id
      WHERE kk.vec_id != p.q_id
      GROUP BY d.q_id, kk.vec_id)""",
    ]


def _ivfpq_oracle() -> str:
    """IVF-PQ replay: the shared PQ CTE chain plus the integer-L2
    coarse quantizer (lowest-id cells, argmin assignment, per-query
    n_probe probe set) — the ADC scan is then confined to probed
    cells' codes."""
    joined = ",\n    ".join(_pq_ctes() + _ivfpq_ctes())
    return f"""
    WITH {_IVEC_CTE},
    {joined}
    SELECT q_id, vec_id, adc_dist, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY adc_dist, vec_id) AS BIGINT) AS rn
      FROM ivfpq_scored) WHERE rn <= 5
    """


def _ivfpq_residual_ctes(
    ids_sql: str = "0,1,2,3,4",
    train_where: str = "",
    m: "int | None" = None,
    k: "int | None" = None,
) -> list[str]:
    """RESIDUAL-encoding IVF-PQ chain (FAISS IndexIVFPQ semantics):
    reuses the coarse-quantizer CTEs (pv/cents/assigned/qv/probes) and
    re-runs the PQ train/encode on x − c(x). Seeds skip the n_cells
    lowest ids (their residuals are all-zero — each IS its own coarse
    centroid). The distance table is per-(query, probed cell): the
    query is re-expressed in each cell's frame. All arithmetic stays
    within double-exact int range (components ≤ ~1.1e7, 16-dim subvec
    sums ≤ ~2e15 < 2^53), so list_dot_product replays exactly.
    ``train_where`` (an `AND ...` fragment) restricts the Lloyd
    TRAINING population only — the incremental-ingest oracle trains on
    the existing corpus while encoding everything. ``m``/``k`` override
    the registered (PQ_M_SUB, PQ_K_CODES) code budget — the
    production-width rung (llm_similarity_ivfpq_prod) replays the same
    chain at (16, 256)."""
    m = m or S.PQ_M_SUB
    k = k or S.PQ_K_CODES
    lo = S.N_CELLS
    d_cb = _PQD.format(a="s.sv", b="c.c_sv")
    d_dt = _PQD.format(a="q.q_sv", b="c.c_sv")
    return _ivfpq_ctes(ids_sql)[:5] + [
        """rv AS (
      SELECT n.vec_id,
             list_transform(range(1, len(n.ivec) + 1),
                 i -> n.ivec[i] - c.c_ivec[i]) AS ivec
      FROM pv n
      JOIN assigned a ON a.vec_id = n.vec_id
      JOIN cents c ON c.cell_id = a.cell_id)""",
        f"""rsv AS (
      SELECT vec_id, g.m AS m,
             ivec[(g.m*(len(ivec)//{m})+1):((g.m+1)*(len(ivec)//{m}))] AS sv
      FROM rv, generate_series(0, {m - 1}) g(m)
      WHERE len(ivec) > 0)""",
        f"""rcb0 AS (SELECT m, vec_id - {lo} AS code_id, sv AS c_sv
            FROM rsv WHERE vec_id >= {lo} AND vec_id < {lo + k})""",
        f"""ra0 AS (
      SELECT vec_id, m, sv, code_id FROM (
        SELECT s.vec_id, s.m, s.sv, c.code_id,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                 {d_cb} ASC, c.code_id) AS rn
        FROM rsv s JOIN rcb0 c ON c.m = s.m
        WHERE 1=1 {train_where}) WHERE rn = 1)""",
        """ragg0 AS (
      SELECT m, code_id, d, sum(x) AS sx, count(*) AS c
      FROM (SELECT m, code_id, unnest(sv) AS x,
                   unnest(range(len(sv))) AS d
            FROM ra0)
      GROUP BY m, code_id, d)""",
        """rmeans0 AS (
      SELECT m, code_id,
             list(CAST(CASE WHEN sx >= 0 THEN (2*sx + c) // (2*c)
                            ELSE -((2*(-sx) + c) // (2*c)) END AS BIGINT)
                  ORDER BY d) AS c_sv
      FROM ragg0 GROUP BY m, code_id)""",
        """rcb1 AS (
      SELECT * FROM rmeans0
      UNION ALL
      SELECT p.m, p.code_id, p.c_sv FROM rcb0 p
      WHERE NOT EXISTS (SELECT 1 FROM rmeans0 x
                        WHERE x.m = p.m AND x.code_id = p.code_id))""",
        f"""rcodes AS (
      SELECT vec_id, m, code_id FROM (
        SELECT s.vec_id, s.m, c.code_id,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                 {d_cb} ASC, c.code_id) AS rn
        FROM rsv s JOIN rcb1 c ON c.m = s.m) WHERE rn = 1)""",
        """qres AS (
      SELECT p.q_id, p.cell_id,
             list_transform(range(1, len(q.q_ivec) + 1),
                 i -> q.q_ivec[i] - c.c_ivec[i]) AS ivec
      FROM probes p
      JOIN qv q ON q.q_id = p.q_id
      JOIN cents c ON c.cell_id = p.cell_id)""",
        f"""qrsv AS (
      SELECT q_id, cell_id, g.m AS m,
             ivec[(g.m*(len(ivec)//{m})+1):((g.m+1)*(len(ivec)//{m}))] AS q_sv
      FROM qres, generate_series(0, {m - 1}) g(m))""",
        f"""rdt AS (
      SELECT q.q_id, q.cell_id, c.m, c.code_id, {d_dt} AS dist
      FROM qrsv q JOIN rcb1 c ON c.m = q.m)""",
        """ivfpqr_scored AS (
      SELECT d.q_id, kk.vec_id, CAST(sum(d.dist) AS BIGINT) AS adc_dist
      FROM rcodes kk
      JOIN assigned a ON a.vec_id = kk.vec_id
      JOIN probes p ON p.cell_id = a.cell_id
      JOIN rdt d ON d.q_id = p.q_id AND d.cell_id = p.cell_id
                AND d.m = kk.m AND d.code_id = kk.code_id
      WHERE kk.vec_id != p.q_id
      GROUP BY d.q_id, kk.vec_id)""",
    ]


def _ivfpq_residual_oracle() -> str:
    """Residual IVF-PQ replay: coarse quantizer + residual codebook
    train/encode + per-(query, cell) distance tables, top-5 by ADC."""
    joined = ",\n    ".join(_ivfpq_residual_ctes())
    return f"""
    WITH {_IVEC_CTE},
    {joined}
    SELECT q_id, vec_id, adc_dist, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY adc_dist, vec_id) AS BIGINT) AS rn
      FROM ivfpqr_scored) WHERE rn <= 5
    """


def _ivfpq_rerank_oracle() -> str:
    """IVF-PQ + exact re-rank replay: the ADC shortlist (top-C per
    query over probed cells) joined back to RAW vectors and exactly
    re-scored by squared L2 for the final top-k."""
    joined = ",\n    ".join(_pq_ctes() + _ivfpq_ctes())
    d_tru = _PQD.format(a="q.q_ivec", b="n.ivec")
    return f"""
    WITH {_IVEC_CTE},
    {joined},
    shortlist AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, vec_id) AS crn
        FROM ivfpq_scored) WHERE crn <= {S.PQ_RERANK_C}
    ),
    rr AS (
      SELECT s.q_id, s.vec_id, {d_tru} AS l2_dist
      FROM shortlist s
      JOIN pv n ON n.vec_id = s.vec_id
      JOIN qv q ON q.q_id = s.q_id
    )
    SELECT q_id, vec_id, l2_dist, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY l2_dist, vec_id) AS BIGINT) AS rn
      FROM rr) WHERE rn <= 5
    """


def _ivfpq_residual_rerank_oracle(
    m: "int | None" = None, k: "int | None" = None
) -> str:
    """Residual IVF-PQ + exact re-rank replay — the complete FAISS
    IndexIVFPQ default: residual-ADC shortlist (top-C per query over
    probed cells) joined back to RAW vectors, exactly re-scored.
    ``m``/``k`` override the code budget (production-width rung)."""
    joined = ",\n    ".join(_ivfpq_residual_ctes(m=m, k=k))
    d_tru = _PQD.format(a="q.q_ivec", b="n.ivec")
    return f"""
    WITH {_IVEC_CTE},
    {joined},
    rshort AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, vec_id) AS crn
        FROM ivfpqr_scored) WHERE crn <= {S.PQ_RERANK_C}
    ),
    rr AS (
      SELECT s.q_id, s.vec_id, {d_tru} AS l2_dist
      FROM rshort s
      JOIN pv n ON n.vec_id = s.vec_id
      JOIN qv q ON q.q_id = s.q_id
    )
    SELECT q_id, vec_id, l2_dist, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY l2_dist, vec_id) AS BIGINT) AS rn
      FROM rr) WHERE rn <= 5
    """


@query(
    "llm_similarity_ivfpq_residual_rerank",
    oracle=_ivfpq_residual_rerank_oracle,
)
def llm_similarity_ivfpq_residual_rerank(spark, sf_dir):
    """Residual IVF-PQ + EXACT RE-RANK — the assembled FAISS
    IndexIVFPQ default, end to end: data-adaptive coarse cells bound
    WHICH vectors are scanned, residual codes bound the BYTES per
    scanned vector AND survive clustered data (see
    llm_similarity_ivfpq_residual), and the exact re-rank recovers
    true-metric ordering from a C=50 shortlist whose raw vectors are
    the only per-query full-width reads. This is the rung combination
    PLANS.md r11 concludes is the only one that holds recall on BOTH
    corpus shapes — registered so the complete path, not just its
    stages, is oracle-checked."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_l2_ivfpq_rerank(e, _QUERY_IDS, k=5, residual=True)


# Production code width (VERDICT r11 item 5): FAISS's default stores
# 8-BIT codes (k_codes=256); the r11 ladder stopped at (8, 32). The r12
# sweep (scripts/pq_sweep.py, sf0.1, recall@5 adc / +re-rank):
#   (8, 128) = 7 B/vec: raw 0.18/0.91, clustered 0.39/0.98
#   (8, 256) = 8 B/vec: raw 0.20/0.94, clustered 0.42/1.00
#   (16,256) = 16 B/vec: raw 0.41/0.96, clustered 0.59/1.00
# (16, 256) — 4-dim subvectors at 8-bit codes, 16 B/vec = 16x smaller
# than the raw float vector — is the first point meeting recall >= 0.95
# on BOTH corpus shapes, so it is the registered production rung. The
# (8, 32) default ladder stays: it prices the aggressive-compression
# end (5 B/vec) the sweep showed is the knee of the curve.
_PQ_PROD_M, _PQ_PROD_K = 16, 256


@query(
    "llm_similarity_ivfpq_prod",
    oracle=lambda: _ivfpq_residual_rerank_oracle(m=_PQ_PROD_M, k=_PQ_PROD_K),
)
def llm_similarity_ivfpq_prod(spark, sf_dir):
    """Residual IVF-PQ + exact re-rank at PRODUCTION code width
    (m_sub=16, k_codes=256 — FAISS IndexIVFPQ's 8-bit default): same
    assembled ladder as llm_similarity_ivfpq_residual_rerank, bigger
    code budget. Measured recall@5 at sf0.1: 0.96 raw / 1.00 clustered
    (scripts/pq_sweep.py r12 rows) — the >= 0.95-on-both-shapes rung.
    The codebook relation grows to 16x256 rows — still broadcast-sized
    (the ONLY broadcast relations are centroids + codebooks); the
    codes relation stays a per-vector handful of small ints, so every
    100 TB property of the (8, 32) rung carries over unchanged."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_l2_ivfpq_rerank(
        e, _QUERY_IDS, k=5, m_sub=_PQ_PROD_M, k_codes=_PQ_PROD_K,
        residual=True,
    )


@query("llm_similarity_ivfpq_rerank", oracle=_ivfpq_rerank_oracle)
def llm_similarity_ivfpq_rerank(spark, sf_dir):
    """IVF-PQ with EXACT RE-RANK (operators/similarity.py::
    topk_l2_ivfpq_rerank) — the complete production ANN ladder: the
    compressed codes-only ADC scan shortlists PQ_RERANK_C candidates
    per query from the probed cells, and only those candidates' raw
    vectors are re-read and exactly re-scored by squared L2. The
    corpus-sized work never touches raw embeddings; the exact-metric
    stage is bounded at |queries| × C rows at any corpus size — how a
    100 TB deployment recovers exact-metric quality from a compressed
    index (the measured recall ladder lives in
    llm_similarity_pq_recall's rerank rows)."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_l2_ivfpq_rerank(e, _QUERY_IDS, k=5)


# Clustered-corpus slice for the recall ladder (VERDICT r10 item 2):
# the sf embeddings are near-isotropic noise, which UNDERSELLS PQ/IVF —
# quantizers exist to exploit structure. The clustered corpus is a
# deterministic, oracle-replayable transform of the SAME table: member
# vector v becomes W·center + v in exact fixed-point integers, where
# center = the embedding of vec_id % N (the N lowest ids double as the
# IVF seed rows, so the coarse quantizer can discover the planted
# clusters). W=8 separates clusters by ~8x the vector norm while
# keeping every squared-L2/dot sum far inside int64. The float
# embedding column is (W·c + x) / 2^20 — division by a power of two is
# exact in binary floating point, so int_vec round-trips to exactly
# W·c_ivec + ivec and the DuckDB oracle can build the integers
# directly.
_CLUST_N = S.N_CELLS
_CLUST_W = 8

_IVEC_CLUSTERED_CTE = f"""
iv0 AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS ivec
  FROM embeddings
),
-- len(ivec) > 0 mirrors the engine's size(ivec) > 0 pre-filter: a
-- hypothetical empty-embedding row at vec_id < _CLUST_N must drop that
-- cluster's members on BOTH sides (inner join on a missing centroid),
-- not keep them with NULL components on one (r12 ADVICE).
clcent AS (SELECT vec_id AS c_id, ivec AS c_ivec FROM iv0
           WHERE vec_id < {_CLUST_N} AND len(ivec) > 0),
iv AS (
  SELECT b.vec_id, b.label,
         list_transform(range(1, len(b.ivec) + 1),
             i -> {_CLUST_W} * c.c_ivec[i] + b.ivec[i]) AS ivec
  FROM iv0 b JOIN clcent c ON c.c_id = b.vec_id % {_CLUST_N}
  WHERE len(b.ivec) > 0
),
nv AS (
  SELECT vec_id, label, ivec,
         list_dot_product(ivec, ivec) AS nsq
  FROM iv
)
"""


def _clustered_embeddings(spark, sf_dir):
    """The embeddings table re-shaped into _CLUST_N planted clusters
    (see _IVEC_CLUSTERED_CTE): same schema (vec_id, embedding, label),
    so every similarity operator consumes it unchanged."""
    e = Tables(spark, sf_dir).embeddings
    iv = (
        S.with_int_vec(e)
        .filter(F.size("ivec") > 0)
        .select("vec_id", "ivec", "label")
    )
    cent = iv.filter(F.col("vec_id") < _CLUST_N).select(
        F.col("vec_id").alias("c_id"), F.col("ivec").alias("c_ivec")
    )
    return (
        iv.withColumn("c_id", F.pmod(F.col("vec_id"), F.lit(_CLUST_N)))
        .join(F.broadcast(cent), "c_id")
        .select(
            "vec_id",
            F.zip_with(
                "c_ivec",
                "ivec",
                lambda c, x: (F.lit(_CLUST_W) * c + x).cast("double")
                / F.lit(float(SCALE)),
            ).alias("embedding"),
            "label",
        )
    )


def _pq_recall_sql(base_cte: str) -> str:
    """Recall@5 and candidate cost of PQ, IVF-PQ, and IVF-PQ+re-rank
    against the exact squared-L2 scan, over the 25-query panel — the
    same measured-frontier discipline as llm_similarity_recall,
    replayed end to end (codebooks, codes, coarse cells, probes, ADC
    sums, the re-rank, truth, and the intersections are all
    exact-integer SQL). ``base_cte`` supplies the corpus (raw
    _IVEC_CTE, or the clustered slice) — every downstream CTE roots at
    its ``nv``."""
    joined = ",\n    ".join(
        _pq_ctes(_RECALL_IDS_SQL)
        + _ivfpq_ctes(_RECALL_IDS_SQL)
        # [5:] — the residual chain shares pv/cents/assigned/qv/probes
        # with _ivfpq_ctes; only its residual-specific CTEs are added
        + _ivfpq_residual_ctes(_RECALL_IDS_SQL)[5:]
    )
    d_tru = _PQD.format(a="q.q_ivec", b="n.ivec")
    return f"""
    WITH {base_cte},
    {joined},
    exact_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, n.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {d_tru} ASC, n.vec_id) AS rn
        FROM qv q, pv n WHERE n.vec_id != q.q_id) WHERE rn <= 5
    ),
    pq_scored AS (
      SELECT d.q_id, kk.vec_id, CAST(sum(d.dist) AS BIGINT) AS adc_dist
      FROM codes kk JOIN dt d ON d.m = kk.m AND d.code_id = kk.code_id
      WHERE kk.vec_id != d.q_id GROUP BY d.q_id, kk.vec_id
    ),
    pq_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
        FROM pq_scored) WHERE rn <= 5
    ),
    pq_cand AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
                FROM pq_scored GROUP BY q_id),
    ivfpq_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
        FROM ivfpq_scored) WHERE rn <= 5
    ),
    ivfpq_cand AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
                   FROM ivfpq_scored GROUP BY q_id),
    ivfpqr_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
        FROM ivfpqr_scored) WHERE rn <= 5
    ),
    ivfpqr_cand AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
                    FROM ivfpqr_scored GROUP BY q_id),
    shortlist AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, vec_id) AS crn
        FROM ivfpq_scored) WHERE crn <= {S.PQ_RERANK_C}
    ),
    rerank_top AS (
      SELECT q_id, vec_id FROM (
        SELECT s.q_id, s.vec_id,
               row_number() OVER (PARTITION BY s.q_id ORDER BY
                 {d_tru} ASC, s.vec_id) AS rn
        FROM shortlist s
        JOIN pv n ON n.vec_id = s.vec_id
        JOIN qv q ON q.q_id = s.q_id) WHERE rn <= 5
    ),
    rshort AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY adc_dist, vec_id) AS crn
        FROM ivfpqr_scored) WHERE crn <= {S.PQ_RERANK_C}
    ),
    rrerank_top AS (
      SELECT q_id, vec_id FROM (
        SELECT s.q_id, s.vec_id,
               row_number() OVER (PARTITION BY s.q_id ORDER BY
                 {d_tru} ASC, s.vec_id) AS rn
        FROM rshort s
        JOIN pv n ON n.vec_id = s.vec_id
        JOIN qv q ON q.q_id = s.q_id) WHERE rn <= 5
    )
    SELECT 'pq' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN pq_top l USING (q_id, vec_id)
    JOIN pq_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    UNION ALL
    SELECT 'ivfpq' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN ivfpq_top l USING (q_id, vec_id)
    JOIN ivfpq_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    UNION ALL
    SELECT 'ivfpq_residual' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN ivfpqr_top l USING (q_id, vec_id)
    JOIN ivfpqr_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    UNION ALL
    SELECT 'ivfpq_rerank' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN rerank_top l USING (q_id, vec_id)
    JOIN ivfpq_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    UNION ALL
    SELECT 'ivfpq_residual_rerank' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN rrerank_top l USING (q_id, vec_id)
    JOIN ivfpqr_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    """


def _pq_recall_oracle() -> str:
    return _pq_recall_sql(_IVEC_CTE)


def _pq_recall_clustered_oracle() -> str:
    return _pq_recall_sql(_IVEC_CLUSTERED_CTE)


@query("llm_similarity_pq_recall", oracle=_pq_recall_oracle)
def llm_similarity_pq_recall(spark, sf_dir):
    """Recall@5 and measured candidate cost of the PQ and IVF-PQ paths
    vs the exact squared-L2 scan, per query over the 25-query panel —
    the honest-frontier discipline of llm_similarity_recall extended
    to the quantized searches: PQ scans everything (n_candidates =
    corpus − 1; its recall loss is pure quantization error), IVF-PQ
    scans only probed cells (its loss adds cell misses). Both searches
    and the truth are deterministic exact integers, so the measured
    numbers themselves are oracle-exact — the M_SUB/K_CODES/N_PROBE
    knobs are graded by measurement, not folklore.

    Measured ladder (sf0.01, retuned (8, 32) knobs): PQ 0.26 mean
    recall at 100% scanned, IVF-PQ 0.34 at ~24%, **IVF-PQ + exact
    re-rank 0.92** at ~24% plus C=50 raw reads per query — consistent with the r8 isotropy
    analysis (this corpus is mean-zero NOISE, so 4×16 codebooks mostly
    encode quantization error; the r11 clustered-corpus measurement —
    llm_similarity_pq_recall_clustered — shows what structure actually
    does: it helps SMALL corpora and *collapses* raw-vector codes at
    sf0.1, which is the measured case for residual encoding, see
    PLANS.md r11). IVF-PQ beating plain PQ despite scanning 4× less is
    real, not noise: the data-dependent coarse quantizer filters out
    the spurious global ADC minimizers that displace true neighbors
    from plain PQ's top-5. The re-rank rung shows the probed cells
    CONTAIN ~86% of the truth — ADC ordering, not candidate coverage,
    is what quantization costs here, which is exactly why production
    stores always pair the compressed scan with an exact re-rank."""
    return _pq_recall_frame(Tables(spark, sf_dir).embeddings)


def _pq_recall_frame(e):
    """The shared recall-ladder computation (PQ / IVF-PQ / +re-rank vs
    exact squared L2 over the 25-query panel) on any embeddings-shaped
    relation — llm_similarity_pq_recall passes the raw table,
    llm_similarity_pq_recall_clustered the planted-cluster slice."""
    ids = _RECALL_QUERY_IDS
    base = (
        S.with_int_vec(e)
        .filter(F.size("ivec") > 0)
        .select("vec_id", "ivec", "nsq")
    )
    q = base.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("ivec").alias("q_ivec"),
        F.col("nsq").alias("q_nsq"),
    )
    from distributed_query_engine_spark.functions.vectors import dot_long

    l2 = (
        F.col("q_nsq")
        - 2 * dot_long(F.col("q_ivec"), F.col("ivec"))
        + F.col("nsq")
    )
    from pyspark.sql.window import Window

    we = Window.partitionBy("q_id").orderBy("d", "vec_id")
    exact = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", l2.alias("d"))
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id")
    )

    def rows_for(scored, name):
        cand = scored.groupBy("q_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates")
        )
        w = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
        top = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("q_id", "vec_id", F.lit(1).alias("hit"))
        )
        return (
            exact.join(top, ["q_id", "vec_id"], "left")
            .groupBy("q_id")
            .agg(F.count("hit").cast("long").alias("hits"))
            .join(cand, "q_id")
            .select(
                F.lit(name).alias("method"),
                "q_id",
                "hits",
                (F.col("hits") / F.lit(5.0)).alias("recall"),
                "n_candidates",
            )
        )

    ivfpq_scored = S.topk_l2_ivfpq(e, ids, k=None)
    ivfpqr_scored = S.topk_l2_ivfpq_residual(e, ids, k=None)
    out = (
        rows_for(S.topk_l2_pq(e, ids, k=None), "pq")
        .unionByName(rows_for(ivfpq_scored, "ivfpq"))
        .unionByName(rows_for(ivfpqr_scored, "ivfpq_residual"))
    )

    # the re-rank rungs: ADC shortlist from the probed-cells scored
    # relation (raw- or residual-encoded), exactly re-scored from raw
    # vectors; scan cost stays that rung's candidate count (re-rank
    # adds only |q| x C raw reads)
    def rerank_rows_for(scored, name):
        ws = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
        shortlist = (
            scored.withColumn("crn", F.row_number().over(ws))
            .filter(F.col("crn") <= S.PQ_RERANK_C)
            .select("q_id", "vec_id")
        )
        rr = (
            base.join(F.broadcast(shortlist), "vec_id")
            .join(F.broadcast(q), "q_id")
            .select("q_id", "vec_id", l2.alias("d"))
        )
        wr = Window.partitionBy("q_id").orderBy("d", "vec_id")
        rerank_top = (
            rr.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= 5)
            .select("q_id", "vec_id", F.lit(1).alias("hit"))
        )
        cand = scored.groupBy("q_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates")
        )
        return (
            exact.join(rerank_top, ["q_id", "vec_id"], "left")
            .groupBy("q_id")
            .agg(F.count("hit").cast("long").alias("hits"))
            .join(cand, "q_id")
            .select(
                F.lit(name).alias("method"),
                "q_id",
                "hits",
                (F.col("hits") / F.lit(5.0)).alias("recall"),
                "n_candidates",
            )
        )

    return out.unionByName(
        rerank_rows_for(ivfpq_scored, "ivfpq_rerank")
    ).unionByName(rerank_rows_for(ivfpqr_scored, "ivfpq_residual_rerank"))


@query("llm_similarity_pq_recall_clustered", oracle=_pq_recall_clustered_oracle)
def llm_similarity_pq_recall_clustered(spark, sf_dir):
    """The SAME recall ladder measured on a CLUSTERED corpus (VERDICT
    r10 item 2): the sf embeddings are near-isotropic noise, which is
    the worst case for quantizers — they exist to exploit structure,
    and the r10 rungs (PQ 0.21 / IVF-PQ 0.32 / +re-rank 0.86 mean
    recall@5 at sf0.01) undersell the machinery. This query re-runs
    the ladder on a deterministic planted-cluster transform of the
    same table (member = W·center + residual in exact
    fixed-point integers — see _IVEC_CLUSTERED_CTE), so the recall-vs-
    candidate-cost frontier is measured at BOTH corpus shapes and the
    contrast itself is oracle-exact. Measured (PLANS.md r11): the
    coarse quantizer discovers the planted cells (probe coverage →
    re-rank 0.92→1.0 at sf0.01, 0.85→0.80+ at sf0.1) — but RAW-vector
    PQ collapses on the clustered shape at sf0.1 (0.26→0.04): the
    codes per subspace get spent separating 32 cluster directions
    (the high-variance axis), leaving nothing for the residuals that
    rank WITHIN a cluster, where all the true neighbors live. That is
    the textbook argument for RESIDUAL encoding (FAISS IndexIVFPQ
    quantizes x − centroid, not x) — measured here, not folklore;
    llm_similarity_ivfpq_residual applies it (0.04 → 0.26), and the
    assembled residual+re-rank rung is the best on every shape
    (PLANS.md r11 tables, including the (m_sub, k_codes) sweep)."""
    return _pq_recall_frame(_clustered_embeddings(spark, sf_dir))


@query("llm_similarity_ivfpq", oracle=_ivfpq_oracle)
def llm_similarity_ivfpq(spark, sf_dir):
    """IVF-PQ — the composed two-level vector index a production store
    actually runs (operators/similarity.py::topk_l2_ivfpq): IVF bounds
    WHICH vectors each query scans (n_probe nearest cells by exact-
    integer squared L2), PQ bounds the BYTES per scanned vector (ADC
    over the probed cells' code ids — raw embeddings are never read at
    search time). Integer-pure end to end — coarse assignment, probe
    selection, codebook training, encoding, and the ADC sum are all
    exact longs — so the oracle replays the entire two-level index
    bit-for-bit. Search cost = n_probe/n_cells of a codes relation
    that is a few ints per vector: the 100 TB memory-and-IO budget
    that neither half achieves alone."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_l2_ivfpq(e, _QUERY_IDS, k=5)


@query("llm_similarity_ivfpq_residual", oracle=_ivfpq_residual_oracle)
def llm_similarity_ivfpq_residual(spark, sf_dir):
    """IVF-PQ with RESIDUAL encoding — FAISS IndexIVFPQ's actual
    quantization target (operators/similarity.py::topk_l2_ivfpq_
    residual): codes are trained and assigned on x − c(x), the offset
    from the coarse centroid, with per-(query, probed-cell) distance
    tables. This is not a refinement, it is the difference between a
    working compressed index and a collapsed one on structured data:
    raw-vector codebooks spend their K codes separating inter-cluster
    variance and cannot rank the within-cluster neighbors a top-k
    query needs (measured on the planted-cluster slice at sf0.1: raw
    IVF-PQ 0.04 mean recall@5, residual 0.26 — 6.6× — at identical
    candidate cost; llm_similarity_pq_recall_clustered, PLANS.md r11,
    retuned (8, 32) knobs).
    Integer-pure end to end, oracle replays the full
    two-level residual index. Same 100 TB shape as llm_similarity_ivfpq:
    broadcast index relations, codes-only search scan."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_l2_ivfpq_residual(e, _QUERY_IDS, k=5)


@query("llm_similarity_ivfpq_index", oracle=_ivfpq_residual_oracle)
def llm_similarity_ivfpq_index(spark, sf_dir):
    """MATERIALIZED residual IVF-PQ index — the artifact a production
    vector store maintains on disk (operators/similarity.py::
    build_ivfpq_index / topk_l2_ivfpq_index): broadcast-sized
    ``centroids/`` and ``codebooks/`` plus a ``codes/`` relation of
    M_SUB small ints per vector PARTITIONED BY cell_id, so the search
    scan is restricted to probed cells by dynamic partition pruning
    (plan-asserted, like llm_similarity_ivf_index) — at 100 TB a
    search reads n_probe/n_cells of the compressed index and nothing
    else; raw vectors are touched only at build (and in the optional
    re-rank stage). Results are bit-identical to the in-memory
    residual search (the index stores exactly the relations
    topk_l2_ivfpq_residual derives), so it shares that oracle. The
    index dir is content-addressed + atomically published
    (:func:`_content_addressed_index`): regenerated testdata changes
    the fingerprint (never a stale serve), a concurrent reader never
    observes a mixed centroids/codebooks/codes generation, and a
    fingerprint hit skips the rebuild."""
    e = Tables(spark, sf_dir).embeddings
    index = _content_addressed_index(
        sf_dir,
        "ivfpq_index",
        f"ivfpq:{S.N_CELLS}:{S.PQ_M_SUB}:{S.PQ_K_CODES}:{S.PQ_LLOYD_ITERS}",
        lambda p: S.build_ivfpq_index(e, p),
    )
    return S.topk_l2_ivfpq_index(spark, index, e, _QUERY_IDS, k=5)


def _ivfpq_incr_oracle() -> str:
    """Incremental-ingest replay for the compressed index: quantizer
    (coarse cells + residual codebooks) trained on the EXISTING 90%,
    everything encoded and searched — what build-then-append produces."""
    joined = ",\n    ".join(
        _ivfpq_residual_ctes(
            train_where=f"AND s.vec_id % {_IVF_NEW_MOD} < {_IVF_NEW_LO}"
        )
    )
    return f"""
    WITH {_IVEC_CTE},
    {joined}
    SELECT q_id, vec_id, adc_dist, rn,
           (vec_id % {_IVF_NEW_MOD}) >= {_IVF_NEW_LO} AS is_new
    FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY adc_dist, vec_id) AS BIGINT) AS rn
      FROM ivfpqr_scored) WHERE rn <= 5
    """


@query("llm_similarity_ivfpq_incremental", oracle=_ivfpq_incr_oracle)
def llm_similarity_ivfpq_incremental(spark, sf_dir):
    """COMPRESSED-index ingest lifecycle — the IVF-PQ twin of
    llm_similarity_ivf_incremental: build the residual IVF-PQ index
    from the existing 90% of the corpus, ingest the new 10% batch by
    assigning it to the STORED cells and encoding it with the STORED
    codebooks (operators/similarity.py::append_to_ivfpq_index — two
    broadcast passes over the BATCH, an append of part-files into the
    cell-partitioned codes layout, existing files never rewritten),
    then search the updated index. The quantizer is a versioned
    artifact — retraining would invalidate every stored code — so the
    oracle replays exactly that contract: Lloyd trains on the existing
    side only, everything is encoded and searchable. is_new marks hits
    served from the freshly ingested batch. The index dir is pid-keyed
    (append-mode stores do not converge under process races — the r11
    ADVICE lesson applied at birth)."""
    from distributed_query_engine_spark.catalog import staging_key
    from distributed_query_engine_spark.streaming.ops import _pid_run_dir

    e = Tables(spark, sf_dir).embeddings
    is_new = F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    index = str(_pid_run_dir("ivfpq_index_incr", staging_key(sf_dir)))
    S.build_ivfpq_index(e.filter(~is_new), index)
    S.append_to_ivfpq_index(spark, e.filter(is_new), index)
    res = S.topk_l2_ivfpq_index(spark, index, e, _QUERY_IDS, k=5)
    return res.withColumn(
        "is_new",
        F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO,
    )


@query("llm_similarity_pq", oracle=_pq_oracle)
def llm_similarity_pq(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011 — the FAISS IVF-PQ
    compression half; operators/similarity.py::topk_l2_pq): train
    per-subspace codebooks (lowest-id seeds + one exact-integer Lloyd
    step), compress every vector to M_SUB code ids, and rank by the
    asymmetric-distance (ADC) sum against each query's broadcast
    distance table. The scan side is the CODES relation — a few ints
    per vector instead of the raw embedding — which is what lets a
    100 TB corpus's search state fit in memory; IVF (llm_similarity_ivf)
    bounds WHICH vectors are scanned, PQ bounds the BYTES per scanned
    vector, and a production store composes both. Deterministic end to
    end, so the oracle replays training + encoding + search exactly."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_l2_pq(e, _QUERY_IDS, k=5)


# llm_similarity_ivf_incremental's ingest split: vectors with
# vec_id % _IVF_NEW_MOD >= _IVF_NEW_LO are the "new batch" (10% of the
# corpus); the rest is the existing indexed corpus. The lowest-id
# centroid seeds (vec_id < N_CELLS) all fall in the existing side, so
# the incremental index's quantizer is identical to the full rebuild's
# — which makes "incremental ingest reproduces full-rebuild search
# results exactly" the checkable contract.
_IVF_NEW_MOD = 100
_IVF_NEW_LO = 90


def _ivf_incr_index_dir(sf_dir: str) -> str:
    """Per-PROCESS staging dir for the append-mode incremental IVF
    index (r11 ADVICE): the index is built with overwrite then
    mutated with ``write.mode('append')``, so two concurrent driver
    processes sharing one path could interleave (A appends, B's
    rebuild wipes it, B appends again) and serve duplicated or
    missing new-batch rows — the exact phantom-row class the pid-keyed
    run dirs in streaming/ops.py exist for. Plain-overwrite indexes
    (llm_similarity_ivf_index) converge under races and stay shared;
    this one is keyed '<sf-key>-<pid>' with the same dead-pid sweep."""
    from distributed_query_engine_spark.catalog import staging_key
    from distributed_query_engine_spark.streaming.ops import _pid_run_dir

    return str(_pid_run_dir("ivf_index_incr", staging_key(sf_dir)))


@query(
    "llm_similarity_ivf_incremental",
    # The incremental index assigns old + new batches to the SAME
    # learned centroids the full rebuild would use (seeds are all in
    # the existing side), so the oracle is llm_similarity_ivf's replay
    # plus the is_new ingest-batch flag on each hit.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM nv WHERE vec_id IN (0,1,2,3,4)),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id,
             {_COS.format(a='q.q_ivec', b='a.ivec', na='q.q_nsq', nb='a.nsq')} AS cosine
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id
      JOIN q ON q.q_id = p.q_id
      WHERE a.vec_id != p.q_id
    )
    SELECT q_id, vec_id, cosine, rn,
           (vec_id % {_IVF_NEW_MOD}) >= {_IVF_NEW_LO} AS is_new
    FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_ivf_incremental(spark, sf_dir):
    """IVF index LIFECYCLE — ingest a new vector batch WITHOUT
    rebuilding (VERDICT r9 item 4): build the index from the existing
    90% of the corpus (operators/similarity.py::build_ivf_index), then
    assign the new 10% batch to the EXISTING learned cells and append
    its part-files into the cell-partitioned assignments relation
    (::append_to_ivf_index — one broadcast-centroid scan of just the
    batch), then search the updated index. Because the quantizer is
    unchanged, search results are exactly what a full rebuild would
    return — the is_new column marks hits served from the freshly
    ingested batch, proving new vectors are immediately searchable.

    100 TB: this is the shape a production vector store runs daily —
    index build is amortized over many ingest batches; each batch
    costs one scan of the BATCH (not the corpus) against broadcast
    centroids plus an append into the partition layout the probed
    reads already prune on. Retraining the quantizer (which would
    invalidate every stored assignment) is a separate, rarer event."""
    e = Tables(spark, sf_dir).embeddings
    is_new = F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    index = _ivf_incr_index_dir(sf_dir)
    S.build_ivf_index(e.filter(~is_new), index)
    S.append_to_ivf_index(spark, e.filter(is_new), index)
    res = S.topk_cosine_ivf_index(spark, index, _QUERY_IDS, k=5)
    return res.withColumn(
        "is_new",
        F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO,
    )


@query(
    "llm_similarity_recall",
    # Exact-oracle recall@5 AND cost of both ANN variants against the
    # exact brute-force top-k, over a 25-query panel (5 queries = 25
    # ground-truth pairs was too noisy to grade knobs by): the oracle
    # replays all three searches (same arithmetic as their individual
    # oracles), intersects, and counts each query's candidate set.
    # This is the metric that justifies N_PLANES / MULTIPROBE_H /
    # N_CELLS / N_PROBE — measured, not folklore (PLANS.md records the
    # numbers per sf and the isotropy analysis behind them).
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    nb AS (SELECT nv.vec_id, nv.ivec, nv.nsq, b.bucket
           FROM nv JOIN buckets b USING (vec_id)),
    qs AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
           FROM nv WHERE vec_id IN ({_RECALL_IDS_SQL})),
    exact_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, c.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.ivec', na='q.q_nsq', nb='c.nsq')} DESC,
                 c.vec_id) AS rn
        FROM qs q, nv c WHERE c.vec_id != q.q_id) WHERE rn <= 5
    ),
    lsh_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, c.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.ivec', na='q.q_nsq', nb='c.nsq')} DESC,
                 c.vec_id) AS rn
        FROM (SELECT qs.q_id, qs.q_ivec, qs.q_nsq,
                     xor(b.bucket, m.mask) AS probe_bucket
              FROM qs
              JOIN buckets b ON b.vec_id = qs.q_id,
                   (SELECT unnest([{_PROBE_MASKS_SQL}]) AS mask) m) q
        JOIN nb c ON c.bucket = q.probe_bucket AND c.vec_id != q.q_id)
      WHERE rn <= 5
    ),
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM qs q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    ivf_top AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, a.vec_id,
               row_number() OVER (PARTITION BY p.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='a.ivec', na='q.q_nsq', nb='a.nsq')} DESC,
                 a.vec_id) AS rn
        FROM probes p
        JOIN assigned a ON a.cell_id = p.cell_id AND a.vec_id != p.q_id
        JOIN qs q ON q.q_id = p.q_id) WHERE rn <= 5
    ),
    lsh_cand AS (
      SELECT q.q_id, CAST(count(*) AS BIGINT) AS n_candidates
      FROM (SELECT qs.q_id, xor(b.bucket, m.mask) AS probe_bucket
            FROM qs
            JOIN buckets b ON b.vec_id = qs.q_id,
                 (SELECT unnest([{_PROBE_MASKS_SQL}]) AS mask) m) q
      JOIN nb c ON c.bucket = q.probe_bucket AND c.vec_id != q.q_id
      GROUP BY q.q_id
    ),
    ivf_cand AS (
      SELECT p.q_id, CAST(count(*) AS BIGINT) AS n_candidates
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id AND a.vec_id != p.q_id
      GROUP BY p.q_id
    )
    SELECT 'lsh' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates,
           FALSE AS recommended
    FROM exact_top e
    LEFT JOIN lsh_top l USING (q_id, vec_id)
    JOIN lsh_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    UNION ALL
    SELECT 'ivf' AS method, e.q_id,
           CAST(count(i.vec_id) AS BIGINT) AS hits,
           count(i.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates,
           TRUE AS recommended
    FROM exact_top e
    LEFT JOIN ivf_top i USING (q_id, vec_id)
    JOIN ivf_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    """,
)
def llm_similarity_recall(spark, sf_dir):
    """recall@5 AND measured cost of the two ANN paths vs the exact
    scan, per query over a 25-query panel: join each ANN top-k to the
    exact top-k on (q_id, vec_id), count survivors, and attach the
    size of each query's candidate set (`n_candidates` — what the
    probe radius actually paid). All searches are deterministic, so
    both recall and cost are oracle-exact — the ANN knobs (N_PLANES,
    MULTIPROBE_H, N_CELLS, N_PROBE) are graded by measurement.

    r9 headline (PLANS.md has the sweeps): **IVF is the recommended
    default** — published by the `recommended` column. After the r9
    retune (N_CELLS 32, N_PROBE 8; scripts/ivf_sweep.py) IVF measures
    recall@5 = 0.936 / 0.944 / 0.992 at sf0.001/0.01/0.1 for ~24.5%
    candidate fraction. The LSH alternative (5 planes, H=3) measures
    0.82-0.87 at ~71% — on THIS corpus (isotropic noise, no cluster
    structure) every data-blind family swept (multi-table LSH,
    JL-projection rerank) sits on recall ~= candidate fraction + 0.15,
    so LSH's cost is the data-blind floor, not a tuning artifact; only
    the data-DEPENDENT quantizer escapes the frontier. LSH remains the
    tunable-radius alternative for streaming/append-only corpora where
    maintaining centroids is inconvenient."""
    e = Tables(spark, sf_dir).embeddings
    k = 5
    exact = S.topk_cosine(e, _RECALL_QUERY_IDS, k=k).select("q_id", "vec_id")
    out = None
    # Each method's heavy candidate relation is evaluated ONCE:
    # topk_with_count rides the candidate count on the top-k window's
    # own partitioning, and the outer join below is this plan's only
    # other consumer (r8 review catch — the first cut evaluated the
    # LSH probe join and the IVF index build twice each).
    for method, ann in (
        ("lsh", S.topk_with_count(S.lsh_scored(e, _RECALL_QUERY_IDS), k)),
        ("ivf", S.topk_with_count(S.ivf_scored(e, _RECALL_QUERY_IDS), k)),
    ):
        j = exact.withColumn("ex", F.lit(1)).join(
            ann.withColumn("hit", F.lit(1)), ["q_id", "vec_id"], "outer"
        )
        part = (
            j.groupBy("q_id")
            .agg(
                F.count(
                    F.when(F.col("ex").isNotNull() & F.col("hit").isNotNull(), 1)
                ).alias("n_hits"),
                F.max("n_candidates").alias("n_candidates"),
            )
            # a query with an empty candidate set has no ann rows and a
            # NULL count — dropped, matching the oracle's inner join on
            # the per-query candidate counts
            .filter(F.col("n_candidates").isNotNull())
            .select(
                F.lit(method).alias("method"),
                "q_id",
                F.col("n_hits").cast("long").alias("hits"),
                (F.col("n_hits") / F.lit(float(k))).alias("recall"),
                "n_candidates",
                F.lit(method == "ivf").alias("recommended"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


_KMEANS_CELLS = 8
_KMEANS_ITERS = 2


def _kmeans_cents_ctes() -> tuple[list[str], int]:
    """The shared Lloyd-loop CTE chain (seeds → per-iteration argmax
    assignment → exact-integer mean → empty-cell carry), ending at
    ``assigned{last}``/``cents{last}`` — the learned clustering both
    llm_kmeans_embeddings and llm_hard_negatives replay."""
    ctes = [
        f"""cents0 AS (
      SELECT vec_id AS cell_id, ivec AS c_ivec, CAST(nsq AS BIGINT) AS c_nsq
      FROM nv WHERE vec_id < {_KMEANS_CELLS})"""
    ]
    n_assign = _KMEANS_ITERS + 1  # one per Lloyd step + the final pass
    for i in range(n_assign):
        cos = _COS.format(a="n.ivec", b="c.c_ivec", na="n.nsq", nb="c.c_nsq")
        ctes.append(
            f"""assigned{i} AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {cos} DESC, c.cell_id) AS crn
        FROM nv n, cents{i} c) WHERE crn = 1)"""
        )
        if i == _KMEANS_ITERS:
            break
        ctes.append(
            f"""agg{i} AS (
      SELECT cell_id, d, sum(x) AS sx, count(*) AS c
      FROM (SELECT cell_id, unnest(ivec) AS x,
                   unnest(range(len(ivec))) AS d
            FROM assigned{i})
      GROUP BY cell_id, d)"""
        )
        ctes.append(
            f"""means{i} AS (
      SELECT cell_id,
             list(CAST(CASE WHEN sx >= 0 THEN (2*sx + c) // (2*c)
                            ELSE -((2*(-sx) + c) // (2*c)) END AS BIGINT)
                  ORDER BY d) AS c_ivec
      FROM agg{i} GROUP BY cell_id)"""
        )
        ctes.append(
            f"""cents{i + 1} AS (
      SELECT cell_id, c_ivec,
             CAST(list_dot_product(c_ivec, c_ivec) AS BIGINT) AS c_nsq
      FROM means{i}
      UNION ALL
      SELECT p.cell_id, p.c_ivec, p.c_nsq FROM cents{i} p
      WHERE p.cell_id NOT IN (SELECT cell_id FROM means{i}))"""
        )
    return ctes, _KMEANS_ITERS


def _kmeans_oracle() -> str:
    """DuckDB replay of the Lloyd k-means loop — the same
    data-dependent-oracle discipline as llm_bpe_train: the oracle
    re-learns the centroids from the data with the identical exact
    integer arithmetic (seeds = lowest vec_ids; per-iteration argmax
    assignment with the cosine tie-break; element-wise mean rounded
    half-away-from-zero via (2*|sx| + c) // (2*c); empty cells carry
    their previous centroid), so the learned clustering is exact-
    checked without hardcoding what it learns."""
    ctes, last = _kmeans_cents_ctes()
    ctes.append(
        f"""member AS (
      SELECT a.cell_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(CAST(list_dot_product(a.ivec, c.c_ivec) AS BIGINT))
                  AS BIGINT) AS sum_member_dot
      FROM assigned{last} a JOIN cents{last} c USING (cell_id)
      GROUP BY a.cell_id)"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {_IVEC_CTE},
    {joined}
    SELECT c.cell_id,
           COALESCE(m.n_members, 0) AS n_members,
           COALESCE(m.sum_member_dot, 0) AS sum_member_dot,
           CAST(list_aggregate(list_transform(c.c_ivec, x -> abs(x)), 'sum')
                AS BIGINT) AS c_l1,
           c.c_nsq
    FROM cents{last} c LEFT JOIN member m USING (cell_id)
    """


def _hard_negatives_oracle() -> str:
    """Replays the SAME learned clustering (shared CTE chain), then
    scores each panel query against every vector OUTSIDE its own cell
    and keeps the top-k — brute-force truth for the mining query."""
    ctes, last = _kmeans_cents_ctes()
    cos = _COS.format(a="q.q_ivec", b="a.ivec", na="q.q_nsq", nb="a.nsq")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {_IVEC_CTE},
    {joined},
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq,
                 cell_id AS q_cell
          FROM assigned{last} WHERE vec_id IN (0,1,2,3,4)),
    scored AS (
      SELECT q.q_id, a.vec_id, {cos} AS cosine
      FROM assigned{last} a, q WHERE a.cell_id != q.q_cell
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """


@query("llm_hard_negatives", oracle=_hard_negatives_oracle)
def llm_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive/embedding training
    (operators/similarity.py::hard_negatives): for each panel query,
    the top-k most-similar corpus vectors OUTSIDE the query's own
    Lloyd-refined k-means cell — near the decision boundary but from a
    different semantic cluster, exactly the negatives a contrastive
    loss wants. Composes the oracle-verified k-means clustering with
    the broadcast-query similarity scan; the corpus never shuffles
    beyond the per-query top-k window."""
    e = Tables(spark, sf_dir).embeddings
    return S.hard_negatives(
        e, _QUERY_IDS, k=5, n_cells=_KMEANS_CELLS, lloyd_iters=_KMEANS_ITERS
    )


@query("llm_kmeans_embeddings", oracle=_kmeans_oracle)
def llm_kmeans_embeddings(spark, sf_dir):
    """Lloyd-refined k-means over the embedding corpus
    (operators/similarity.py::kmeans_cell_stats): seeds = lowest
    vec_ids, _KMEANS_ITERS refinement iterations, per-cell audit
    columns all exact integers. This is the iterative-algorithm pattern
    (pagerank, BPE train) applied to the clustering step a curation
    pipeline runs before semantic dedup / cluster-aware splits — and
    the query that makes ivf_centroids' Lloyd path oracle-verified
    instead of merely deterministic. The refinement means use exact
    integer round-half-away arithmetic (sum/count, never a float avg),
    so the DuckDB oracle replays the entire data-dependent training
    loop."""
    e = Tables(spark, sf_dir).embeddings
    return S.kmeans_cell_stats(e, _KMEANS_CELLS, _KMEANS_ITERS)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "llm_multimodal_columns",
    oracle="""
    WITH cs AS (
      SELECT doc_id,
             CAST(sum(ascii(substring(text, CAST(i AS INT), 1))) AS BIGINT)
               AS checksum16
      FROM documents, generate_series(1, 16) t(i)
      WHERE CAST(i AS BIGINT) <= length(text)
      GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
           octet_length(encode(d.text)) AS byte_len,
           cs.checksum16
    FROM documents d JOIN cs USING (doc_id)
    """,
)
def llm_multimodal_columns(spark, sf_dir):
    """Multimodal column plumbing: an opaque binary payload + typed
    metadata, feature-extracted by an Arrow-batched ``mapInPandas``. The
    payload here is utf-8 text bytes standing in for image/audio blobs
    (decode libs are absent in this container — see
    operators/multimodal.py for the gated real-decode stubs); the
    Spark-side schema, batching, and UDF signature are the real thing.

    Parity notes: the oracle's integer sum is CAST to BIGINT (DuckDB
    would return HUGEINT, which hashes differently from Spark's int64
    even for equal values); the checksum "decode" step sums the first 16
    CODEPOINTS of the decoded payload — matching the oracle's ascii()
    for any text, not just ASCII — while byte_len stays byte-based on
    both sides."""
    import pandas as pd

    d = Tables(spark, sf_dir).documents
    with_blob = d.select(
        "doc_id",
        "lang",
        F.encode(F.col("text"), "utf-8").alias("blob"),
    )

    def extract(batches):
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "byte_len": blobs.map(len).astype("int64"),
                    "checksum16": blobs.map(
                        lambda b: sum(ord(c) for c in b.decode("utf-8")[:16])
                    ).astype("int64"),
                }
            )

    return with_blob.mapInPandas(
        extract, "doc_id long, lang string, byte_len long, checksum16 long"
    )


@query(
    "llm_multimodal_resample",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(sum(ascii(substring(text, CAST(i AS INT), 1))) AS BIGINT)
               AS sampled_checksum,
             count(*) AS n_sampled
      FROM documents, generate_series(1, 64) t(i)
      WHERE CAST(i AS BIGINT) <= length(text) AND (i - 1) % 2 = 0
      GROUP BY doc_id
    )
    SELECT d.doc_id, octet_length(encode(d.text)) AS n_bytes,
           s.n_sampled, s.sampled_checksum
    FROM documents d JOIN s USING (doc_id)
    """,
)
def llm_multimodal_resample(spark, sf_dir):
    """Resize / frame-sample plumbing (operators/multimodal.py): stride
    subsampling of the binary payload through mapInPandas — the tested
    fake for the PIL/ffmpeg decode that is stubbed in this container."""
    from distributed_query_engine_spark.operators.multimodal import (
        stride_resample,
        with_blob_and_meta,
    )

    d = Tables(spark, sf_dir).documents
    return stride_resample(with_blob_and_meta(d), stride=2, limit=64)


_PACK_CAPACITY = 64


@query(
    "llm_pack_sequences",
    oracle=lambda: f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    grid AS (
      SELECT doc_id, source, n,
             unnest(generate_series(0,
                 (greatest(n - {_CHUNK_W}, 0) + {_CHUNK_S} - 1)
                   // {_CHUNK_S})) AS chunk_id
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, source, CAST(chunk_id AS INT) AS chunk_id,
             CAST(least({_CHUNK_W}, n - chunk_id * {_CHUNK_S}) AS INT)
               AS n_tokens
      FROM grid
    ),
    packed AS (
      SELECT source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id, chunk_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM chunks
    )
    SELECT source, CAST(cum_before // {_PACK_CAPACITY} AS INT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_in_bin
    FROM packed
    GROUP BY 1, 2
    """,
)
def llm_pack_sequences(spark, sf_dir):
    """Sequence packing: the document chunks are packed, per source
    shard, into fixed-capacity context bins (capacity 64 tokens) by a
    running token count — the final prep step between chunking and
    tokenizer batching in a training pipeline. The cumulative sum is
    windowed PER SOURCE, so packing parallelizes across shards; a
    single global pack would serialize the corpus through one partition
    (and is exactly what a 100 TB pipeline avoids by packing within
    shards). Bins may overrun capacity by at most window-1 tokens
    (chunks are never split) — the standard greedy-packing contract.
    Integer-only arithmetic keeps the oracle hash-exact. ``source``
    rides through the chunker as a passthrough column — recovering it
    with a chunks⋈documents join would shuffle the exploded relation a
    second time for a value the scan already had in hand."""
    from pyspark.sql.window import Window

    d = Tables(spark, sf_dir).documents
    chunks = chunk_documents(d, _CHUNK_W, _CHUNK_S, passthrough=("source",))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return (
        chunks.select(
            "source",
            "n_tokens",
            F.floor(cum_before / _PACK_CAPACITY).cast("int").alias("bin_id"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("tokens_in_bin"),
        )
    )


# Context capacity for the BPE-token packer. Larger than the whitespace
# packer's 64: BPE splits rare words into multiple tokens, so per-doc
# BPE counts run higher than word counts.
_PACK_CAPACITY_BPE = 256


def _pack_bpe_oracle() -> str:
    # Train-CTE prefix (the SAME data-dependent loop llm_bpe_train
    # replays), then apply best1..bestK to every per-doc word via
    # chained replace() with scalar subqueries. COALESCE guards the
    # degenerate-corpus case: an empty best{k} would otherwise NULL the
    # whole string through replace(s, NULL, ...) — chr(1) can never
    # appear in the framed encoding, so the replace is a no-op instead.
    s = "'|' || regexp_replace(w, '(.)', '|\\1|', 'g') || '|'"
    for k in range(1, _BPE_TRAIN_K + 1):
        s = (
            f"replace({s}, "
            f"COALESCE((SELECT '|' || a || '||' || b || '|' FROM best{k}), chr(1)), "
            f"COALESCE((SELECT '|' || a || b || '|' FROM best{k}), ''))"
        )
    ctes = ",\n".join(_bpe_train_ctes())
    return f"""
    WITH {ctes},
    doc_words AS (
      SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    wtok AS (
      SELECT doc_id, source,
             CASE WHEN regexp_matches(w, '^[a-z]+$')
                  THEN len(string_split(trim({s}, '|'), '||'))
                  ELSE 1 END AS nt
      FROM doc_words
    ),
    per_doc AS (
      SELECT doc_id, source, CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM wtok GROUP BY doc_id, source
    ),
    packed AS (
      SELECT source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM per_doc
    )
    SELECT source, CAST(cum_before // {_PACK_CAPACITY_BPE} AS INT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_in_bin
    FROM packed
    GROUP BY 1, 2
    """


@query("llm_pack_sequences_bpe", oracle=_pack_bpe_oracle)
def llm_pack_sequences_bpe(spark, sf_dir):
    """END-TO-END tokenizer-pipeline composition (VERDICT r8 item 4):
    TRAIN a BPE merge table from the corpus (the llm_bpe_train loop,
    shared via _train_bpe_merges), ENCODE every document with the
    learned table (functions/text.py::bpe_encode — the llm_bpe_encode
    machinery), then PACK documents into fixed-capacity context bins by
    their real BPE token counts (the llm_pack_sequences pattern) —
    proving the three BPE pieces compose into the pipeline they exist
    for. Words outside ^[a-z]+$ (numbers, punctuation-bearing) count 1
    token each, the untrainable-symbol fallback.

    Plan shape: the per-doc token count is a row-local F.aggregate over
    the split array (zero shuffles, no explode→groupBy round trip);
    training collects one argmax row per iteration (the legitimate
    iterative-training pattern); packing windows per source shard so a
    100 TB pack parallelizes across shards. The oracle replays the SAME
    data-dependent train loop via scalar subqueries, then the same
    encode+pack arithmetic — the learned table is never hardcoded."""
    from pyspark.sql.window import Window

    d = Tables(spark, sf_dir).documents
    merges = tuple((a, b) for _, a, b, _, _ in _train_bpe_merges(d))
    arr = F.split(F.lower(F.col("text")), " ")
    n_tokens = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.when(
            w.rlike("^[a-z]+$"),
            F.size(T.bpe_encode(w, merges)).cast("long"),
        ).otherwise(F.lit(1).cast("long")),
    )
    per_doc = d.select("doc_id", "source", n_tokens.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return (
        per_doc.select(
            "source",
            "n_tokens",
            F.floor(cum_before / _PACK_CAPACITY_BPE).cast("int").alias("bin_id"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_in_bin"),
        )
    )


# The deterministic md5 permille bucket of a doc_id — the engine-portable
# sampling idiom (see sample_stratified): both engines hash the same
# UTF-8 bytes, so membership is reproducible anywhere. A FUNCTION, not a
# module constant: Column construction needs an active SparkContext, and
# this module imports long before any session exists.
def _doc_permille():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )

_SQL_DOC_PERMILLE = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000"
)


@query(
    "llm_temperature_mix_sqrt",
    oracle=lambda: f"""
    WITH bucketed AS (
      SELECT doc_id,
             CASE WHEN n_chars < 200 THEN 'short'
                  WHEN n_chars < 500 THEN 'medium'
                  ELSE 'long' END AS domain
      FROM documents
    ),
    per_dom AS (
      SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_orig
      FROM bucketed GROUP BY domain
    ),
    mn AS (SELECT MIN(n_orig) AS n_min FROM per_dom),
    rates AS (
      SELECT domain, n_orig,
             CAST(greatest(1, floor(1000 * sqrt(CAST(mn.n_min AS DOUBLE)
                                                / CAST(n_orig AS DOUBLE))))
                  AS BIGINT) AS keep_permille
      FROM per_dom, mn
    ),
    kept AS (
      SELECT b.domain, COUNT(*) AS kept_docs
      FROM bucketed b JOIN rates r ON b.domain = r.domain
      WHERE {_SQL_DOC_PERMILLE} < r.keep_permille
      GROUP BY b.domain
    )
    SELECT r.domain, r.n_orig, r.keep_permille,
           CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs
    FROM rates r LEFT JOIN kept k ON r.domain = k.domain
    """,
)
def llm_temperature_mix_sqrt(spark, sf_dir):
    """TEMPERATURE-0.5 DOMAIN REBALANCING — the sqrt-scaling mixing
    strategy of large pretraining corpora (sampling domain d with
    probability ∝ n_d^τ, τ = 1/2, so over-represented domains are
    damped toward balance): domains are document-LENGTH buckets here
    (the synthetic corpus's ``source`` labels are deliberately
    uniform — length buckets give a real 148/314/38 skew at sf0.01,
    so the damping branch actually exercises); keep rate per domain =
    √(n_min / n_d),
    which puts the EXPECTED kept size at √(n_min·n_d) — the geometric
    mean between the smallest domain and itself. Determinism without
    a transcendental: τ = 1/2 needs only ``sqrt``, which IEEE-754
    requires to be CORRECTLY ROUNDED (unlike pow/exp/log, whose libm
    last-ulp divergence r6 pinned), and the rate derivation is a
    fixed chain of single-rounded ops — exact-int division → sqrt →
    ×1000 → floor — identical bit-for-bit in both engines. Membership
    is the row-local md5-permille filter, so the sample is
    partitioning/seed-independent. Deliberately avoided: any
    cross-domain SUM of doubles (a Σ√n_d normalizer would be
    accumulation-order-dependent); the n_min formulation needs only
    an exact integer MIN.

    100 TB: one aggregate pass for the counts, a 1-row broadcast for
    n_min, a broadcast rate table onto the corpus, zero corpus
    shuffles — the same shape as llm_domain_mix_sample."""
    d = Tables(spark, sf_dir).documents
    bucketed = d.select(
        "doc_id",
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 500, "medium")
        .otherwise("long")
        .alias("domain"),
    )
    per_dom = bucketed.groupBy("domain").agg(F.count(F.lit(1)).alias("n_orig"))
    mn = per_dom.agg(F.min("n_orig").alias("n_min"))
    rates = (
        per_dom.crossJoin(F.broadcast(mn))
        .withColumn(
            "keep_permille",
            F.greatest(
                F.lit(1),
                F.floor(
                    1000
                    * F.sqrt(
                        F.col("n_min").cast("double")
                        / F.col("n_orig").cast("double")
                    )
                ),
            ).cast("long"),
        )
        .select("domain", "n_orig", "keep_permille")
    )
    kept = (
        bucketed.join(F.broadcast(rates), "domain")
        .filter(_doc_permille() < F.col("keep_permille"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("kept_docs"))
    )
    return rates.join(kept, "domain", "left").select(
        "domain",
        "n_orig",
        "keep_permille",
        F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
    )


@query(
    "llm_domain_mix_sample",
    oracle=lambda: f"""
    WITH per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_orig,
             CAST(CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) % 4
                  + 1 AS BIGINT) AS w
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT SUM(n_orig) AS total_docs, SUM(w) AS total_w FROM per_src
    ),
    rates AS (
      SELECT source, n_orig, w,
             CAST(((tot.total_docs // 4) * w) // tot.total_w
                  AS BIGINT) AS target_docs,
             CAST(least(1000, ((((tot.total_docs // 4) * w) // tot.total_w)
                               * 1000) // n_orig) AS BIGINT) AS keep_permille
      FROM per_src, tot
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS kept_docs
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE {_SQL_DOC_PERMILLE} < r.keep_permille
      GROUP BY d.source
    )
    SELECT r.source, r.n_orig, r.target_docs, r.keep_permille,
           CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    """,
)
def llm_domain_mix_sample(spark, sf_dir):
    """Training-mix construction: sample each domain (``source``) toward
    a TARGET weight with rates DERIVED FROM THE DATA, entirely in
    integer arithmetic so the sample is bit-reproducible across engines
    and re-runs. Pipeline shape: (1) one aggregate pass computes
    per-domain counts and weights (weight = src_num % 4 + 1, standing
    in for a curated mix table); (2) the global budget (total/4 docs)
    is apportioned per domain by integer division; (3) the tiny rate
    table broadcasts back onto the corpus and a ROW-LOCAL md5-permille
    filter keeps each doc independently — no shuffle of the corpus, no
    per-domain limit() (which would serialize through one task and be
    order-dependent). At 100 TB: two scans + one broadcast join; the
    kept-rate arithmetic is exact, so the realized mix is auditable
    against target_docs in the output."""
    d = Tables(spark, sf_dir).documents
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_orig"))
    per_src = per_src.withColumn(
        "w",
        (F.regexp_extract("source", r"src(\d+)", 1).cast("long") % 4 + 1),
    )
    tot = per_src.agg(
        F.sum("n_orig").alias("total_docs"), F.sum("w").alias("total_w")
    )
    rates = (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_docs",
            F.expr("((total_docs div 4) * w) div total_w"),
        )
        .withColumn(
            "keep_permille",
            F.least(F.lit(1000), F.expr("(target_docs * 1000) div n_orig")),
        )
        .select("source", "n_orig", "target_docs", "keep_permille")
    )
    kept = (
        d.join(F.broadcast(rates), "source")
        .filter(_doc_permille() < F.col("keep_permille"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("kept_docs"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_orig",
            "target_docs",
            "keep_permille",
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias("kept_docs"),
        )
    )


@query(
    "llm_train_val_test_split",
    oracle=lambda: f"""
    WITH bucketed AS (
      SELECT CASE WHEN {_SQL_DOC_PERMILLE} < 800 THEN 'train'
                  WHEN {_SQL_DOC_PERMILLE} < 900 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars, lang
      FROM documents
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM bucketed GROUP BY split
    """,
)
def llm_train_val_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by md5 permille of
    doc_id — the reproducible alternative to randomSplit() (whose
    assignment depends on partitioning and seed plumbing). Membership
    is a row-local expression: any engine, any partitioning, any
    subset of the corpus assigns each doc to the same split, which is
    what makes held-out contamination checks meaningful. One scan, one
    tiny aggregate."""
    d = Tables(spark, sf_dir).documents
    split = (
        F.when(_doc_permille() < 800, "train")
        .when(_doc_permille() < 900, "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
        )
    )


@query(
    "llm_cluster_aware_split",
    oracle=lambda: f"""
    WITH RECURSIVE {_STAR_EDGE_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dups
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM dups
    ),
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS component FROM walk GROUP BY node),
    assigned AS (
      SELECT doc_id, component,
             CASE WHEN CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))
                       AS BIGINT) % 1000 < 800 THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))
                       AS BIGINT) % 1000 < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM comp
    ),
    leaks AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS leaky_clusters
      FROM (SELECT component FROM assigned
            GROUP BY component HAVING COUNT(DISTINCT split) > 1)
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_clusters,
           leaky_clusters
    FROM assigned, leaks
    GROUP BY split, leaky_clusters
    """,
)
def llm_cluster_aware_split(spark, sf_dir):
    """LEAKAGE-SAFE train/val/test split: assignment is by NEAR-DUP
    CLUSTER, not by document. A doc-level hash split
    (llm_train_val_test_split) silently places near-duplicate twins on
    both sides of the train/test boundary — the held-out set then
    scores memorization, not generalization, and no decontamination
    pass catches it because nothing "leaked" by exact match. Here the
    minhash dup graph's connected components (the already-verified
    llm_dedup_clusters pipeline) become the split unit: md5-permille of
    the CLUSTER id (80/10/10), so every member of a cluster lands in
    the same split by construction. The result carries the proof as
    data: ``leaky_clusters`` — the count of clusters spanning more than
    one split — is computed from the assignment itself and must be 0.

    The measured flip side, visible in this synthetic corpus: the
    80/10/10 ratio holds over CLUSTERS, not documents — a mega-cluster
    carries its whole document mass into one split (here the dominant
    near-dup cluster lands hundreds of docs on one side). That is the
    correct trade: the doc-level ratio was only ever an illusion
    maintained by splitting twins apart.

    100 TB: the CC labeling is the pointer-jumping pipeline (per-round
    shuffles keyed on node, lineage cut per iteration); the split
    decision and permille hash are row-local on the labeled relation;
    the leak audit is one extra aggregate over (cluster, split) pairs —
    bounded by the cluster count, not the corpus."""
    d = Tables(spark, sf_dir).documents
    comp = D.connected_components(D.minhash_dup_edges(d, threshold=0.5)).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    assigned = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
    )
    pm = (
        F.conv(F.substring(F.md5(F.col("component").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    assigned = assigned.select(
        "doc_id",
        "component",
        F.when(pm < 800, "train").when(pm < 900, "val").otherwise("test").alias(
            "split"
        ),
    )
    leaks = (
        assigned.groupBy("component")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaky_clusters"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("component").alias("n_clusters"),
        )
        .join(F.broadcast(leaks))
    )


# ---------------------------------------------------------------------------
# Embedding quantization
# ---------------------------------------------------------------------------

# Round-half-away-from-zero as PURE INTEGER arithmetic: for a, m >= 0,
# round(a * 127 / m) == (2*a*127 + m) div (2*m). No floating point
# anywhere in the quantized values, so Spark and DuckDB agree bit-for-bit
# with no rounding-mode caveats (Spark double `round` is HALF_UP,
# DuckDB's is C-style — identical on exact ties, but the DIVISION that
# produces the tie is where cross-engine drift creeps in; integer
# arithmetic removes the question entirely).
_QUANT_SPARK = (
    "transform(ivec, x -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT) "
    "WHEN x >= 0 THEN (2*x*127 + maxabs) div (2*maxabs) "
    "ELSE -((2*(-x)*127 + maxabs) div (2*maxabs)) END)"
)
_QUANT_DUCK = (
    "list_transform(ivec, x -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT) "
    "WHEN x >= 0 THEN (2*x*127 + maxabs) // (2*maxabs) "
    "ELSE -((2*(-x)*127 + maxabs) // (2*maxabs)) END)"
)


@query(
    "llm_embedding_quantize",
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    m AS (
      SELECT vec_id, ivec,
             COALESCE(list_max(list_transform(ivec, x -> abs(x))),
                      CAST(0 AS BIGINT)) AS maxabs
      FROM nv
    ),
    q AS (SELECT vec_id, ivec, maxabs, {_QUANT_DUCK} AS qvec FROM m)
    SELECT vec_id,
           CAST(len(qvec) AS BIGINT) AS n_dims,
           maxabs,
           CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(list_sum(list_transform(list_zip(ivec, qvec),
                p -> (127*p[1] - p[2]*maxabs) * (127*p[1] - p[2]*maxabs)))
              AS BIGINT) AS err_sq_num,
           CAST(list_max(list_transform(list_zip(ivec, qvec),
                p -> abs(127*p[1] - p[2]*maxabs))) AS BIGINT) AS err_max_num
    FROM q
    """,
)
def llm_embedding_quantize(spark, sf_dir):
    """INT8 EMBEDDING QUANTIZATION — the standard 4× compression step
    before embeddings are stored or served in a training-data pipeline:
    per-vector symmetric max-abs scaling, q_i = round(x_i * 127 /
    max|x|). Entirely ROW-LOCAL (transform/aggregate over the array
    inside whole-stage codegen): zero shuffles, no UDF, embarrassingly
    parallel at any corpus size. The rounding is computed in pure
    integer arithmetic (see _QUANT_SPARK) so the oracle contract is
    exact, and the reported reconstruction error is an exact integer
    numerator (err/127/maxabs in real units): quantization quality is
    MEASURED per vector, not assumed. Output is scalar-per-column
    (sums/extremes of the quantized vector) so the driver's pandas
    canonicalizer never sees an array column (the scalar_string r4
    lesson)."""
    e = Tables(spark, sf_dir).embeddings
    base = S.with_int_vec(e).select("vec_id", "ivec")
    m = base.withColumn(
        "maxabs",
        F.coalesce(
            F.array_max(F.transform("ivec", lambda x: F.abs(x))),
            F.lit(0).cast("long"),
        ),
    )
    q = m.withColumn("qvec", F.expr(_QUANT_SPARK))
    zero = F.lit(0).cast("long")
    resid = F.zip_with(
        F.col("ivec"), F.col("qvec"),
        lambda x, qi: F.lit(127).cast("long") * x - qi * F.col("maxabs"),
    )
    return q.select(
        "vec_id",
        F.size("qvec").cast("long").alias("n_dims"),
        "maxabs",
        F.aggregate(
            F.transform("qvec", lambda x: F.abs(x)), zero, lambda a, x: a + x
        ).alias("q_l1"),
        F.aggregate(resid, zero, lambda a, r: a + r * r).alias("err_sq_num"),
        F.coalesce(
            F.array_max(F.transform(resid, lambda r: F.abs(r))), zero
        ).alias("err_max_num"),
    )


@query(
    "llm_unigram_surprisal",
    oracle="""
    WITH occ AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq),
    scored AS (
      SELECT o.doc_id,
             CAST(length(bin(t.n)) - length(bin(f.c)) AS BIGINT) AS surp
      FROM occ o JOIN freq f USING (tok) CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(surp) AS BIGINT) AS surp_sum,
           CAST((1000 * SUM(surp)) // COUNT(*) AS BIGINT) AS mean_surp_milli
    FROM scored GROUP BY doc_id
    """,
)
def llm_unigram_surprisal(spark, sf_dir):
    """QUALITY SCORING BY UNIGRAM LM SURPRISAL — the statistical-LM
    complement to the heuristic llm_quality_score: documents whose
    tokens are corpus-rare score high (gibberish/boilerplate-free text
    detection), stopword soup scores low. Surprisal per occurrence is
    the INTEGER log2 bucket bits(N) − bits(c) (bit-length of the corpus
    total minus bit-length of the token count) — deliberately
    transcendental-free: ln() is not guaranteed bit-identical across
    engines, so the exact-oracle contract uses the integer
    approximation and a production deployment swaps in the one-line
    double-precision ln variant where cross-engine replay isn't a
    requirement.

    Scale shape: token OCCURRENCES (not the distinct sets — an LM
    counts multiplicity) aggregate to a vocabulary-sized freq relation
    (partial-agg'd map-side, so stopword skew collapses before the
    shuffle); the corpus total is a single broadcast row; the freq join
    back to occurrences broadcasts at local vocab sizes and degrades to
    a shuffle join on tok at web-scale vocabularies (the same
    documented trade as llm_tfidf_topterms); the per-doc rollup is one
    partial-agg'd shuffle on doc_id. Integer-only arithmetic
    throughout, including the milli-mean (floor division)."""
    d = Tables(spark, sf_dir).documents
    occ = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").cast("long").alias("n"))
    bits = lambda col: F.length(F.bin(col)).cast("long")  # noqa: E731
    scored = (
        occ.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", (bits(F.col("n")) - bits(F.col("c"))).alias("surp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("surp").cast("long").alias("surp_sum"),
        F.expr("CAST((1000 * sum(surp)) div count(1) AS BIGINT)").alias(
            "mean_surp_milli"
        ),
    )


_CONT_NUM, _CONT_DEN = 4, 5  # containment threshold 4/5, kept rational


@query(
    "llm_dedup_containment",
    # The UNRESTRICTED all-qualifying-pairs containment join — the
    # engine runs prefix-filter blocking but is proven complete against
    # an oracle that never blocks (the multiband-simhash pattern:
    # completeness stated as SQL). Any pair with containment ≥ t shares
    # ≥ 1 token, so the token-equijoin enumerates a superset of
    # qualifying pairs and the threshold filter finishes the job.
    oracle=lambda: f"""
    WITH {_tokens_cte()},
    sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tokens GROUP BY doc_id),
    inter AS (
      SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM tokens ta
      JOIN tokens tb ON tb.tok = ta.tok AND ta.doc_id < tb.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / CAST(least(sa.n_tok, sb.n_tok) AS DOUBLE)
             AS containment,
           CAST(i.n_inter AS DOUBLE)
             / CAST(sa.n_tok + sb.n_tok - i.n_inter AS DOUBLE) AS jaccard,
           i.n_inter = least(sa.n_tok, sb.n_tok) AS is_subset
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE {_CONT_DEN} * i.n_inter >= {_CONT_NUM} * least(sa.n_tok, sb.n_tok)
    """,
)
def llm_dedup_containment(spark, sf_dir):
    """ASYMMETRIC CONTAINMENT DEDUP — |A∩B| / min(|A|,|B|) ≥ 0.8 —
    catches quotes/excerpts/supersets that Jaccard structurally misses
    (a short doc fully inside a long one has jaccard ≈ |A|/|B| but
    containment 1.0). Candidates come from PREFIX FILTERING (the
    PPJoin-family set-similarity join) with a proven completeness
    guarantee and output-sensitive cost; see
    operators/dedup.py::containment_pairs for the scale analysis."""
    d = Tables(spark, sf_dir).documents
    return D.containment_pairs(d, threshold_num=_CONT_NUM, threshold_den=_CONT_DEN)


@query(
    "llm_multimodal_ppm_decode",
    # The oracle replays the deterministic pixel formula arithmetically
    # (generate_series over byte indices); the ENGINE path synthesizes
    # real PPM P6 blobs and byte-parses them back (header parse + numpy
    # reshape) — decode dimensions come from the bytes, not metadata.
    oracle=lambda: f"""
    WITH vals AS (
      SELECT d.doc_id, t.i,
             (d.doc_id * 31 + t.i * 7) % 256 AS v,
             (t.i // 3) % {M.PPM_W} AS x,
             (t.i // 3) // {M.PPM_W} AS y,
             t.i % 3 AS c
      FROM documents d,
           unnest(generate_series(0, {M.PPM_W} * {M.PPM_H} * 3 - 1)) AS t(i)
    )
    SELECT doc_id,
           CAST({M.PPM_W} AS INT) AS width,
           CAST({M.PPM_H} AS INT) AS height,
           CAST(SUM(v) FILTER (c = 0) AS BIGINT) AS sum_r,
           CAST(SUM(v) FILTER (c = 1) AS BIGINT) AS sum_g,
           CAST(SUM(v) FILTER (c = 2) AS BIGINT) AS sum_b,
           CAST(SUM(v) FILTER (x % 2 = 0 AND y % 2 = 0) AS BIGINT) AS sum_ds,
           CAST(SUM(v) AS DOUBLE)
             / ({M.PPM_W} * {M.PPM_H} * 3) AS mean_brightness
    FROM vals GROUP BY doc_id
    """,
)
def llm_multimodal_ppm_decode(spark, sf_dir):
    """REAL IMAGE DECODE, no image libraries: a PPM (P6) codec built
    from raw bytes — synthesize an actual binary image per document
    (header + RGB payload, Arrow-batched), then DECODE it back by
    parsing the header and reshaping the payload (numpy frombuffer),
    extracting per-channel integer sums, a strided 2× downsample sum
    (the resize kernel's integer core), and mean brightness. This
    upgrades the multimodal story from 'decode stubbed behind an
    import gate' to a genuine byte→pixels→features pipeline whose
    derived values are still EXACTLY oracle-checked (the synthetic
    pixel content is a deterministic formula the oracle replays
    arithmetically — the decode itself is not faked).

    Scale shape: both halves are mapInPandas over Arrow batches —
    embarrassingly parallel, blobs never leave executors, per-batch
    memory bounded by arrow.maxRecordsPerBatch. At 100 TB the
    synthesize half is replaced by a binaryFile scan or pointer-join
    (see scan_binaryfile / llm_multimodal_columns); the decode half is
    unchanged — that is the half this query proves."""
    d = Tables(spark, sf_dir).documents
    feats = M.decode_ppm_features(M.synthesize_ppm(d))
    n = F.col("width") * F.col("height") * 3
    return feats.select(
        "doc_id",
        "width",
        "height",
        "sum_r",
        "sum_g",
        "sum_b",
        "sum_ds",
        (
            (F.col("sum_r") + F.col("sum_g") + F.col("sum_b")).cast("double")
            / n.cast("double")
        ).alias("mean_brightness"),
    )


@query(
    "llm_multimodal_wav_decode",
    # Arithmetic replay of the waveform formula v(i) = ((doc_id*7 +
    # i*13) % 4096) - 2048; the engine path builds and chunk-walks real
    # RIFF/WAVE bytes.
    oracle=lambda: f"""
    WITH vals AS (
      SELECT d.doc_id, t.i,
             ((d.doc_id * 7 + t.i * 13) % 4096) - 2048 AS v
      FROM documents d,
           unnest(generate_series(0, {M.WAV_SAMPLES} - 1)) AS t(i)
    ),
    lagged AS (
      SELECT doc_id, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM vals
    )
    SELECT doc_id,
           CAST({M.WAV_RATE} AS INT) AS sample_rate,
           CAST({M.WAV_SAMPLES} AS INT) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS energy,
           CAST(MAX(abs(v)) AS BIGINT) AS peak,
           CAST(SUM(CASE WHEN pv IS NOT NULL
                          AND (v >= 0) <> (pv >= 0) THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings,
           CAST(SUM(CASE WHEN i % 8 = 0 THEN v ELSE 0 END) AS BIGINT)
             AS frame_sum
    FROM lagged GROUP BY doc_id
    """,
)
def llm_multimodal_wav_decode(spark, sf_dir):
    """REAL AUDIO DECODE, no audio libraries: a WAV (RIFF/PCM16) codec
    from raw bytes — synthesize an actual mono PCM16 file per document,
    then parse it back with a proper RIFF CHUNK WALK (sample rate and
    bit depth come from the fmt chunk, samples from the data chunk —
    no fixed offsets assumed) and compute integer DSP features: energy
    (sum of squares), peak amplitude, zero-crossing count, and an
    every-8th-sample frame sum (the frame-sampling kernel). The audio
    analog of llm_multimodal_ppm_decode: the decode is genuine byte
    parsing, the derived values stay exactly oracle-checked because
    the synthetic waveform is an arithmetic formula. Same 100 TB shape:
    two mapInPandas stages, Arrow-batched, blobs never leave
    executors."""
    d = Tables(spark, sf_dir).documents
    return M.decode_wav_features(M.synthesize_wav(d))


@query(
    "llm_multimodal_video_frames",
    # Arithmetic replay: pixel (doc, frame f, plane index p) = (doc*31 +
    # f*17 + p*7) % 256; kept frames are f % stride = 0; motion is the
    # abs-diff of consecutive KEPT frame sums.
    oracle=lambda: f"""
    WITH fsums AS (
      SELECT d.doc_id, t.f,
             CAST(SUM((d.doc_id * 31 + t.f * 17 + s.p * 7) % 256) AS BIGINT)
               AS fsum
      FROM documents d,
           unnest(generate_series(0, {M.VID_FRAMES} - 1)) AS t(f),
           unnest(generate_series(0, {M.VID_W} * {M.VID_H} - 1)) AS s(p)
      WHERE t.f % {M.VID_STRIDE} = 0
      GROUP BY d.doc_id, t.f
    ),
    lagged AS (
      SELECT doc_id, fsum,
             lag(fsum) OVER (PARTITION BY doc_id ORDER BY f) AS pv
      FROM fsums
    )
    SELECT doc_id,
           CAST({M.VID_FRAMES} AS INT) AS n_frames,
           CAST(COUNT(*) AS INT) AS n_sampled,
           CAST(SUM(fsum) AS BIGINT) AS sampled_sum,
           CAST(SUM(CASE WHEN pv IS NULL THEN 0 ELSE abs(fsum - pv) END)
                AS BIGINT) AS motion_total
    FROM lagged GROUP BY doc_id
    """,
)
def llm_multimodal_video_frames(spark, sf_dir):
    """REAL VIDEO FRAME-SAMPLING, no video libraries: a raw grayscale
    frame container (y4m-style layout reduced to byte essentials) is
    synthesized per document and parsed back — geometry from the
    header, planes sliced per frame — keeping every 2nd frame (the
    frame-sampling kernel the brief names) and scoring motion as the
    integer Σ|Δ frame-sum| over consecutive kept frames (the
    scene-change metric's core). Completes the image/audio/video
    triple next to llm_multimodal_ppm_decode / _wav_decode; same
    Arrow-batched mapInPandas shape, same exact arithmetic oracle."""
    d = Tables(spark, sf_dir).documents
    return M.sample_video_frames(M.synthesize_video(d))


@query(
    "llm_embedding_random_projection",
    # Replays the deterministic ±1 sign matrix (the plane_sign hash) and
    # the exact integer dot products over the fixed-point vectors.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    ex AS (
      SELECT vec_id, unnest(range(len(ivec))) AS d, unnest(ivec) AS x
      FROM nv
    )
    SELECT e.vec_id, CAST(p.j AS INT) AS j,
           CAST(SUM(e.x * (CASE WHEN ((p.j * {S.PLANE_STRIDE} + e.d + 1)
                                       * {S.MIX}) % {S.M32} < {S.M32 // 2}
                                THEN 1 ELSE -1 END)) AS BIGINT) AS y
    FROM ex e, generate_series(0, {S.RP_DIMS} - 1) AS p(j)
    GROUP BY e.vec_id, p.j
    """,
)
def llm_embedding_random_projection(spark, sf_dir):
    """Johnson–Lindenstrauss ±1 random projection 64→16 dims, exact
    integer arithmetic over the fixed-point vectors and a reproducible
    sign matrix — see operators/similarity.py::random_projection for
    the scale rationale. Output is the tidy (vec_id, j, y) relation."""
    e = Tables(spark, sf_dir).embeddings
    return S.random_projection(e)


@query(
    "llm_similarity_projected_recall",
    # Both top-5 sets replayed in SQL: exact cosine over the 64-d
    # fixed-point vectors, and cosine in the 16-d JL-projected integer
    # space (the same ±1 sign-matrix replay as the projection oracle).
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    ex AS (
      SELECT vec_id, unnest(range(len(ivec))) AS d, unnest(ivec) AS x
      FROM nv
    ),
    proj AS (
      SELECT e.vec_id, p.j,
             SUM(e.x * (CASE WHEN ((p.j * {S.PLANE_STRIDE} + e.d + 1)
                                    * {S.MIX}) % {S.M32} < {S.M32 // 2}
                             THEN 1 ELSE -1 END)) AS y
      FROM ex e, generate_series(0, {S.RP_DIMS} - 1) AS p(j)
      GROUP BY e.vec_id, p.j
    ),
    pn AS (SELECT vec_id, SUM(y * y) AS ynsq FROM proj GROUP BY vec_id),
    pd AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id, SUM(a.y * b.y) AS dot
      FROM proj a JOIN proj b ON a.j = b.j
      WHERE a.vec_id IN (0,1,2,3,4) AND b.vec_id <> a.vec_id
      GROUP BY 1, 2
    ),
    ptop AS (
      SELECT q_id, vec_id FROM (
        SELECT pd.q_id, pd.vec_id,
               row_number() OVER (PARTITION BY pd.q_id ORDER BY
                 CAST(pd.dot AS DOUBLE)
                   / (sqrt(CAST(qa.ynsq AS DOUBLE)) * sqrt(CAST(qb.ynsq AS DOUBLE)))
                 DESC, pd.vec_id) AS rn
        FROM pd
        JOIN pn qa ON qa.vec_id = pd.q_id
        JOIN pn qb ON qb.vec_id = pd.vec_id
      ) WHERE rn <= 5
    ),
    escored AS (
      SELECT q.vec_id AS q_id, c.vec_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_dot_product(q.ivec, c.ivec)
                 / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))
               DESC, c.vec_id) AS rn
      FROM nv q, nv c
      WHERE q.vec_id IN (0,1,2,3,4) AND c.vec_id <> q.vec_id
    ),
    etop AS (SELECT q_id, vec_id FROM escored WHERE rn <= 5)
    SELECT e.q_id,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(p.vec_id) AS DOUBLE) / 5 AS recall_at_5
    FROM etop e
    LEFT JOIN ptop p ON p.q_id = e.q_id AND p.vec_id = e.vec_id
    GROUP BY e.q_id
    """,
)
def llm_similarity_projected_recall(spark, sf_dir):
    """JL PROJECTION QUALITY, MEASURED: top-5 cosine search run in the
    16-d projected integer space vs the exact 64-d scan, reported as
    recall@5 per query — the honest-self-evaluation pattern
    (llm_similarity_recall's analog for dimensionality reduction). The
    projected search costs 1/4 the dot-product work; this query prices
    that speedup in recall instead of assuming JL's guarantees apply
    at k=16. Everything is exact integer arithmetic up to one double
    division per score, so even the recall VALUES are oracle-exact.

    Measured result on THIS corpus: recall@5 ≈ 0 (sf0.01: 0.0-0.2 per
    query) — and that is the finding, not a bug: the synthetic
    embeddings are near-uniform on the sphere, so a query's top-5
    cosine gap is razor-thin and any JL distortion reshuffles the
    ranking toward chance. On real embedding corpora (clustered, with
    clear nearest-neighbor margins) the same projection preserves
    top-k far better; this query is the instrument that tells you
    WHICH regime your corpus is in before you buy the 4× speedup —
    precisely the measure-don't-assume contract of
    llm_similarity_recall."""
    from pyspark.sql.window import Window

    e = Tables(spark, sf_dir).embeddings
    proj = S.project_vectors(e)
    qv = proj.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("yvec").alias("q_yvec"),
        F.col("ynsq").alias("q_ynsq"),
    )
    from distributed_query_engine_spark.functions.vectors import (
        cosine_from_ints,
        dot_long,
    )

    w = Window.partitionBy("q_id").orderBy(
        F.col("pcos").desc(), F.col("vec_id")
    )
    ptop = (
        proj.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine_from_ints(
                dot_long(F.col("q_yvec"), F.col("yvec")),
                F.col("q_ynsq"),
                F.col("ynsq"),
            ).alias("pcos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id")
    )
    etop = S.topk_cosine(e, _QUERY_IDS, 5).select("q_id", "vec_id")
    # 5×5 pairing per query; vec_id == p_vec hits at most once per
    # exact-top row, so the match count IS the intersection size
    return (
        etop.join(ptop.withColumnRenamed("vec_id", "p_vec"), ["q_id"], "left")
        .groupBy("q_id")
        .agg(
            F.sum(
                F.when(F.col("vec_id") == F.col("p_vec"), 1).otherwise(0)
            ).cast("long").alias("n_overlap"),
            (
                F.sum(
                    F.when(F.col("vec_id") == F.col("p_vec"), 1).otherwise(0)
                ).cast("double")
                / 5
            ).alias("recall_at_5"),
        )
    )


@query(
    "llm_url_canonicalize",
    # Messy URLs synthesized deterministically from doc_id (mixed-case
    # host, tracking params, fragments, trailing slash — each present
    # iff a doc_id bit is set), then canonicalized with the same string
    # pipeline in both engines.
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://' ||
             CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END ||
             'Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' ||
             '/Docs/' || CAST(doc_id % 50 AS VARCHAR) ||
             CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN '?utm_source=x&ref=y' ELSE '' END ||
             CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url), '[?#].*$', ''),
                 '^https://www\\.', 'https://'),
               '/$', '') AS curl
      FROM raw
    )
    SELECT curl,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc
    FROM canon GROUP BY curl
    """,
)
def llm_url_canonicalize(spark, sf_dir):
    """URL CANONICALIZATION DEDUP — the first pass of every web-corpus
    pipeline: lowercase, strip query strings and fragments (tracking
    params make distinct strings of the same resource), drop the www
    prefix and trailing slash, then group — each canonical URL keeps
    its lowest doc_id (the crawl-order winner). Entirely row-local
    string expressions (three regexp_replace + lower inside codegen,
    no UDF) followed by one partial-agg'd shuffle on the canonical
    URL. The messy inputs are synthesized deterministically from
    doc_id bits so the canonicalization is exercised against every
    combination of case/www/slash/query/fragment noise and the oracle
    replays it exactly."""
    d = Tables(spark, sf_dir).documents
    did = F.col("doc_id")
    url = F.concat(
        F.lit("HTTPS://"),
        F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Example"), (did % 7).cast("string"), F.lit(".COM"),
        F.lit("/Docs/"), (did % 50).cast("string"),
        F.when(did % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("?utm_source=x&ref=y")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(url), r"[?#].*$", ""),
            r"^https://www\.", "https://",
        ),
        r"/$", "",
    )
    return (
        d.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("keep_doc"),
        )
    )


@query(
    "llm_bigram_conditional_surprisal",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i+1])) AS bigram,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i])) AS w1
      FROM words WHERE len(w) >= 2
    ),
    cb AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1),
    cu AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(length(bin(u.c1)) - length(bin(d.c2))) AS BIGINT)
             AS surp_sum,
           CAST((1000 * SUM(length(bin(u.c1)) - length(bin(d.c2))))
                  // COUNT(*) AS BIGINT) AS mean_surp_milli
    FROM bg b JOIN cb d USING (bigram) JOIN cu u USING (w1)
    GROUP BY b.doc_id
    """,
)
def llm_bigram_conditional_surprisal(spark, sf_dir):
    """CONDITIONAL BIGRAM LM SCORING — the second-order companion to
    llm_unigram_surprisal: per-occurrence surprisal of w2 GIVEN w1 in
    integer log2 buckets, bits(c(w1)) − bits(c(w1 w2)) ≈ −log2 P(w2|w1)
    (same transcendental-free contract). Documents whose word
    TRANSITIONS are corpus-unusual score high even when every
    individual word is common — the signal unigram models miss, and
    the cheap proxy for LM-based quality filtering. Shape: one bigram
    explode feeding two frequency relations (bigram and
    conditioning-word counts, both partial-agg'd), joined back and
    rolled up per doc — the same documented broadcast→shuffle
    degradation story as the unigram variant, one order higher."""
    d = Tables(spark, sf_dir).documents
    w = F.split("text", " ")
    # sliding_windows: projection collapse re-inlines the w alias, so
    # element_at("w", i) in the lambda re-ran split() per bigram (r9
    # re-eval audit); the window form evaluates it O(1)/row
    bg = (
        d.select("doc_id", F.explode(T.sliding_windows(w, 2)).alias("p"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("bigram"),
            F.col("p.0").alias("w1"),
        )
    )
    cb = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    cu = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bits = lambda col: F.length(F.bin(col)).cast("long")  # noqa: E731
    surp = bits(F.col("c1")) - bits(F.col("c2"))
    return (
        bg.join(cb, "bigram")
        .join(cu, "w1")
        .select("doc_id", surp.alias("surp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("surp").cast("long").alias("surp_sum"),
            F.expr("CAST((1000 * sum(surp)) div count(1) AS BIGINT)").alias(
                "mean_surp_milli"
            ),
        )
    )


@query(
    "llm_feature_hashing",
    # Replays the hashing trick arithmetically: bucket = tid % 16, sign
    # from bit 4 of the md5-mod-P token id; contributions sum exactly.
    oracle=lambda: f"""
    WITH {_tokens_cte(hashed=True)}
    SELECT doc_id,
           CAST(tid % 16 AS BIGINT) AS j,
           CAST(SUM(CASE WHEN (tid // 16) % 2 = 0 THEN 1 ELSE -1 END)
                AS BIGINT) AS val
    FROM tt GROUP BY doc_id, tid % 16
    """,
)
def llm_feature_hashing(spark, sf_dir):
    """THE HASHING TRICK (feature hashing, Weinberger et al. 2009 —
    public): embed each document's token set into a fixed 16-dim
    vector with NO vocabulary at all — bucket j = tid mod 16, sign
    from the next hash bit, contributions summed. This is the
    vocabulary-free featurization that feeds linear classifiers and
    quality models at corpus scale: row-local ids (the same md5-mod-P
    as the minhash family), one partial-agg'd shuffle on (doc_id,
    bucket), output the tidy sparse (doc_id, j, val) relation with
    empty buckets absent — exactly what a downstream trainer consumes.
    Sign-hashing makes collisions cancel in expectation instead of
    accumulating bias — the property that separates the hashing trick
    from naive modular bucketing."""
    d = Tables(spark, sf_dir).documents
    toks = D.tokenize(d)
    tid = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long") % D.P
    return (
        toks.select(
            "doc_id",
            (tid % 16).alias("j"),
            F.when((tid / 16).cast("long") % 2 == 0, 1).otherwise(-1).alias("sgn"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("sgn").cast("long").alias("val"))
    )


@query(
    "llm_embedding_outliers",
    # Exact integer arithmetic via the multiply-through trick with a
    # power-of-two downshift: r_d = n·x_d − S_d (int64-safe), score =
    # Σ ⌊|r_d|/2^10⌋² — the r7 sf1 scale smoke caught the unshifted
    # ||n·x − S||² overflowing int64 once n·2^20 > ~3e9 (n ≈ 3k
    # vectors). The /1024.0 is a power-of-two double division (exact:
    # only the exponent changes), so ⌊·⌋ is the true floor in BOTH
    # engines; the shift costs 10 low bits of a ≥2^30 residual —
    # noise for an outlier rank. int64-safe to n ≈ 3·10^5 vectors;
    # raise the shift constant in lock-step (engine + oracle) beyond.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    ex AS (
      SELECT vec_id, unnest(range(len(ivec))) AS d, unnest(ivec) AS x
      FROM nv
    ),
    cs AS (SELECT d, CAST(SUM(x) AS BIGINT) AS sd FROM ex GROUP BY d),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nv),
    scored AS (
      SELECT e.vec_id,
             CAST(SUM(CAST(floor(abs(n.n * e.x - c.sd) / 1024.0) AS BIGINT)
                      * CAST(floor(abs(n.n * e.x - c.sd) / 1024.0) AS BIGINT))
                  AS BIGINT) AS dsq
      FROM ex e JOIN cs c USING (d) CROSS JOIN nn n
      GROUP BY e.vec_id
    ),
    med AS (SELECT median(dsq) AS m FROM scored)
    SELECT s.vec_id, CAST(s.dsq AS DOUBLE) / m.m AS dist_ratio,
           s.dsq > 4 * m.m AS is_outlier
    FROM scored s CROSS JOIN med m
    """,
)
def llm_embedding_outliers(spark, sf_dir):
    """EMBEDDING-SPACE OUTLIER DETECTION — corpus quality control:
    vectors far from the centroid are mislabeled/corrupted/off-domain
    candidates. Exact integers end-to-end via the CUSUM-style
    multiply-through trick: instead of x − mean (a division), the
    per-dim residual is r_d = n·x_d − S_d with S the integer
    coordinate sums (n× the true deviation, same ORDER), and the
    score is the sum of squared DOWNSHIFTED residuals ⌊|r_d|/2^10⌋²;
    flag vectors whose score exceeds 4× the median score (distance >
    ~2× the median distance). The shift before squaring is the r7
    scale fix: the unshifted ||n·x − S||² overflows int64 once
    n·2^20 exceeds ~3e9 (caught by the sf1 smoke at n = 20k vectors);
    |r|/1024.0 is a power-of-two double division (exact — only the
    exponent changes), so the floor is the true floor in BOTH
    engines, and the cost is 10 low bits of a ≥2^30 residual —
    invisible to an outlier rank. int64-safe to n ≈ 3e5 vectors;
    beyond that raise the shift constant in engine and oracle
    together. The centroid is one aggregate row broadcast back;
    scoring is row-local; the only divisions are the exact shift and
    the REPORTED ratio. At 100 TB this is one scan + one tiny
    broadcast — the cheapest useful embedding audit that exists."""
    e = Tables(spark, sf_dir).embeddings
    base = S.with_int_vec(e).select("vec_id", "ivec")
    dim = F.size("ivec")
    cent = base.select(F.posexplode("ivec").alias("d", "x")).groupBy("d").agg(
        F.sum("x").alias("sd")
    )
    cent_row = (
        cent.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("d", "sd"))).alias("pairs"))
        .select(F.transform("pairs", lambda p: p["sd"]).alias("s"))
        .crossJoin(base.groupBy().agg(F.count(F.lit(1)).alias("n")))
    )
    scored = base.crossJoin(F.broadcast(cent_row)).select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                "ivec",
                "s",
                lambda x, sd: F.floor(
                    F.abs(F.col("n") * x - sd) / F.lit(1024.0)
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, h: acc + h * h,
        ).alias("dsq"),
    )
    med = scored.agg(F.median("dsq").alias("m"))
    return scored.crossJoin(F.broadcast(med)).select(
        "vec_id",
        (F.col("dsq").cast("double") / F.col("m")).alias("dist_ratio"),
        (F.col("dsq") > 4 * F.col("m")).alias("is_outlier"),
    )


_VOCAB_K = 20


@query(
    "llm_vocab_oov_coverage",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM occ GROUP BY tok
      ) WHERE rk <= {_VOCAB_K}
    )
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(1000 * SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                  // COUNT(*) AS BIGINT) AS oov_permille
    FROM occ o LEFT JOIN vocab v USING (tok)
    GROUP BY o.doc_id
    """,
)
def llm_vocab_oov_coverage(spark, sf_dir):
    """VOCABULARY COVERAGE / OOV RATE — the tokenizer-fit diagnostic a
    pre-training pipeline runs before committing to a vocabulary: with
    the top-20 corpus tokens as the vocab (count-ranked, token
    tiebreak so the cut is deterministic), report each document's
    out-of-vocabulary token count and per-mille rate (integer floor
    division — hash-exact). The vocab relation is top-k-sized and
    BROADCASTS into the occurrence scan; the per-doc rollup is one
    partial-agg'd shuffle. In production k is 32k-256k — still
    broadcast-sized — and the same query prices vocabulary-size
    choices against real OOV rates instead of folklore.

    The top-K cut is ``orderBy(count desc, tok).limit(K)`` — Spark
    plans TakeOrderedAndProject (per-partition partial top-K merged on
    the driver), NOT a global sort. The previous row_number()-over-
    unpartitioned-Window form sorted the FULL distinct-token relation
    in one task — at corpus scale the vocabulary is billions of rows,
    the exact single-task death the minhash-dict docs call out
    (VERDICT r10 item 1a). The query consumes only the membership SET,
    and with the strict (count desc, token) total order both forms
    select the identical K tokens, so results are byte-identical; the
    oracle keeps the row_number formulation because DuckDB evaluates
    it on 60k rows, not 60B."""
    d = Tables(spark, sf_dir).documents
    occ = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))

    vocab = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok"))
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        occ.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "CAST((1000 * sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END))"
                " div count(1) AS BIGINT)"
            ).alias("oov_permille"),
        )
    )


_N_SHARDS = 64


@query(
    "llm_shard_balance_audit",
    oracle=f"""
    WITH sharded AS (
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_N_SHARDS} AS shard,
             n_chars
      FROM documents
    ),
    per AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM sharded GROUP BY shard
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(MIN(n_docs) AS BIGINT) AS min_docs,
           CAST(MAX(n_docs) AS BIGINT) AS max_docs,
           CAST(MAX(total_chars) AS BIGINT) AS max_chars,
           CAST((100 * MAX(n_docs)) // MIN(n_docs) AS BIGINT)
             AS max_min_pct
    FROM per
    """,
)
def llm_shard_balance_audit(spark, sf_dir):
    """SHARD BALANCE AUDIT — the pre-write check before a corpus is
    hash-sharded into output files: docs assigned to 64 shards by a
    row-local md5 hash of the id (the same partitioning a
    ``repartition(64, hash)`` + partitioned sink would produce),
    reporting min/max docs and bytes per shard and the max/min
    imbalance percentage in integer arithmetic. A skewed report here
    means skewed output files — straggler readers for every future
    consumer — caught BEFORE the write instead of discovered in the
    next job's task-time histogram. One scan, one shard-keyed partial
    aggregate, one 64-row rollup."""
    d = Tables(spark, sf_dir).documents
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _N_SHARDS
    )
    per = d.select(shard.alias("shard"), "n_chars").groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.min("n_docs").cast("long").alias("min_docs"),
        F.max("n_docs").cast("long").alias("max_docs"),
        F.max("total_chars").cast("long").alias("max_chars"),
        F.expr("CAST((100 * max(n_docs)) div min(n_docs) AS BIGINT)").alias(
            "max_min_pct"
        ),
    )


@query(
    "llm_dedup_cluster_summary",
    # Wraps the llm_dedup_clusters oracle (star edges + recursive walk)
    # in a size histogram; singletons are size-1 clusters.
    oracle=lambda: f"""
    WITH RECURSIVE {_STAR_EDGE_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dups
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM dups
    ),
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM walk GROUP BY node),
    csizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS k
               FROM comp GROUP BY component)
    SELECT k AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(k) AS BIGINT) AS n_docs
    FROM csizes GROUP BY k
    """,
)
def llm_dedup_cluster_summary(spark, sf_dir):
    """NEAR-DUP CLUSTER SIZE HISTOGRAM — the one-screen dedup report a
    curation dashboard shows: how many clusters of each size exist and
    how many documents they hold (size 1 = unique docs; the histogram's
    tail is the boilerplate problem made visible, and n_docs − 
    n_clusters summed over sizes ≥ 2 is exactly the dedup savings).
    Built on the full production pipeline — row-local signatures, star
    edges, pointer-jumping connected components — plus two tiny
    rollups over the component relation."""
    d = Tables(spark, sf_dir).documents
    comp = D.connected_components(D.minhash_dup_edges(d, threshold=0.5)).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    comp_all = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    sizes = comp_all.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    return sizes.groupBy(F.col("k").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("k").cast("long").alias("n_docs"),
    )


@query(
    "llm_curation_funnel_report",
    # Stage counts of the llm_corpus_curation pipeline — same CTEs,
    # rolled to the one-row funnel a corpus dashboard quotes.
    oracle=lambda: f"""
    WITH RECURSIVE {_STAR_EDGE_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dups
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM dups
    ),
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS component FROM walk GROUP BY node),
    scored AS (
      SELECT doc_id, {_QUALITY_SQL} AS quality, md5(text) AS fp
      FROM documents
    ),
    pass AS (SELECT * FROM scored WHERE quality >= 0.5),
    uniq AS (
      SELECT * FROM pass
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    ),
    kept AS (
      SELECT u.doc_id
      FROM uniq u JOIN comp c USING (doc_id)
      QUALIFY row_number() OVER (PARTITION BY c.component ORDER BY u.doc_id) = 1
    )
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_raw,
           CAST((SELECT COUNT(*) FROM pass) AS BIGINT) AS n_quality_pass,
           CAST((SELECT COUNT(*) FROM uniq) AS BIGINT) AS n_exact_unique,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_final,
           CAST(1000 * (SELECT COUNT(*) FROM kept)
                  // (SELECT COUNT(*) FROM documents) AS BIGINT)
             AS keep_permille
    """,
)
def llm_curation_funnel_report(spark, sf_dir):
    """CURATION FUNNEL — the one-row report every corpus build quotes:
    raw docs → quality-gate survivors → exact-dedup uniques → near-dup
    cluster winners, with the final keep rate in integer per-mille.
    Each stage count is the exact cardinality of the corresponding
    llm_corpus_curation stage (same operators, same thresholds —
    the funnel and the pipeline can never disagree because they share
    the construction); the counts themselves are scalar aggregates, so
    the report costs the pipeline plus four metadata-sized rollups."""
    from pyspark.sql.window import Window

    d = Tables(spark, sf_dir).documents
    comp = D.connected_components(D.minhash_dup_edges(d, threshold=0.5)).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    comp_all = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    scored = d.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("quality"),
        T.fingerprint_md5(F.col("text")).alias("fp"),
    )
    pass_ = scored.filter(F.col("quality") >= 0.5)
    uniq = pass_.withColumn(
        "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    ).filter(F.col("rn") == 1)
    kept = (
        uniq.join(comp_all, "doc_id")
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("component").orderBy("doc_id")
            ),
        )
        .filter(F.col("crn") == 1)
    )
    n_raw = d.count()
    n_pass = pass_.count()
    n_uniq = uniq.count()
    n_final = kept.count()
    spark_ = d.sparkSession
    return spark_.createDataFrame(
        [
            (
                int(n_raw),
                int(n_pass),
                int(n_uniq),
                int(n_final),
                int(1000 * n_final // n_raw),
            )
        ],
        "n_raw long, n_quality_pass long, n_exact_unique long, "
        "n_final long, keep_permille long",
    )


@query(
    "llm_multimodal_frame_dedup",
    # Arithmetic replay of the container bytes (pixel = (doc*31 + f*17 +
    # p*7) % 256) and the position-weighted fingerprint; grouping by the
    # fingerprint IS the cross-video exact frame dedup. The synthetic
    # pixel formula depends on doc/f only through (doc*31 + f*17) % 256,
    # so the fingerprint space is bounded at 256 rows — which is the
    # point: heavy frame-level duplication across videos, like real
    # copied segments.
    oracle=lambda: f"""
    WITH occ AS (
      SELECT d.doc_id, t.f,
             CAST(SUM(((d.doc_id * 31 + t.f * 17 + s.p * 7) % 256)
                        * (s.p + 1)) AS BIGINT) AS fhash
      FROM documents d,
           unnest(generate_series(0, {M.VID_FRAMES} - 1)) AS t(f),
           unnest(generate_series(0, {M.VID_W} * {M.VID_H} - 1)) AS s(p)
      WHERE t.f % {M.VID_STRIDE} = 0
      GROUP BY d.doc_id, t.f
    )
    SELECT fhash,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc,
           CAST(min(f) AS INT) AS min_frame,
           (count(*) > 1) AS is_dup
    FROM occ GROUP BY fhash
    """,
)
def llm_multimodal_frame_dedup(spark, sf_dir):
    """Cross-video frame-level exact dedup: REAL container decode →
    per-kept-frame content fingerprint (operators/multimodal.py::
    frame_fingerprints) → group-by-fingerprint dup report (keeper =
    lexicographically first occurrence). The multimodal analog of
    llm_dedup_exact, composing the decode tier with the dedup tier.
    Scale shape: blobs stay in executors; the shuffled relation is
    (docs × kept-frames) fingerprint rows — three orders of magnitude
    smaller than the video bytes; the dup report is fingerprint-grain."""
    d = Tables(spark, sf_dir).documents
    occ = M.frame_fingerprints(M.synthesize_video(d))
    return occ.groupBy("fhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.min("f").alias("min_frame"),
        (F.count(F.lit(1)) > 1).alias("is_dup"),
    )


@query(
    "llm_curriculum_stages",
    # Curriculum staging for training: FIXED quality thresholds (not
    # ntile — thresholds are map-side, grow-stable, and mean the same
    # thing at every corpus size), deterministic intra-stage order key
    # (md5 of doc_id, the llm_corpus_shuffle discipline). Per-stage
    # manifest: doc count, token mass, exact milli-quality mean (floor
    # division, the established integer-mean contract).
    oracle=lambda: f"""
    WITH scored AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
             CAST(round({_QUALITY_SQL} * 1000) AS BIGINT) AS q_milli,
             md5(CAST(doc_id AS VARCHAR) || '|curr') AS okey
      FROM documents
    ),
    staged AS (
      SELECT *, CASE WHEN q_milli >= 940 THEN 'easy'
                     WHEN q_milli >= 900 THEN 'medium'
                     ELSE 'hard' END AS stage
      FROM scored
    )
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(q_milli) AS BIGINT) // count(*) AS mean_q_milli,
           min(okey) AS first_key, max(okey) AS last_key
    FROM staged GROUP BY stage
    """,
)
def llm_curriculum_stages(spark, sf_dir):
    """Curriculum ordering manifest: docs staged easy→hard by fixed
    quality-milli thresholds; within a stage the training order is the
    deterministic md5 key (never a global sort — (stage, okey) defines
    the total order, the llm_corpus_shuffle argument). Scale shape:
    stage assignment is row-local, the manifest a 3-row aggregate; the
    loader consumes (stage, okey)-ordered shards."""
    d = Tables(spark, sf_dir).documents
    staged = d.select(
        "doc_id",
        F.size(T.words(F.col("text"))).cast("long").alias("n_tok"),
        F.round(T.quality_score(F.col("text")) * 1000)
        .cast("bigint")
        .alias("q_milli"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|curr"))).alias(
            "okey"
        ),
    ).withColumn(
        "stage",
        F.when(F.col("q_milli") >= 940, "easy")
        .when(F.col("q_milli") >= 900, "medium")
        .otherwise("hard"),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.expr("sum(q_milli) div count(*)").alias("mean_q_milli"),
        F.min("okey").alias("first_key"),
        F.max("okey").alias("last_key"),
    )


_MATRYOSHKA_DIMS = [32, 16]
_MATRYOSHKA_DIMS_SQL = ", ".join(str(d) for d in _MATRYOSHKA_DIMS)


@query(
    "llm_similarity_matryoshka_recall",
    # Prefix-truncation (Matryoshka, Kusupati et al. 2022) recall rung:
    # exact top-5 on the 32-dim and 16-dim PREFIXES of the fixed-point
    # vectors vs the full-64-dim exact top-5, over the stable 25-query
    # panel. Same exact-arithmetic recipe as every ladder rung: integer
    # dots/norms on the sliced vectors, hits counted by intersection.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    dims AS (SELECT unnest([{_MATRYOSHKA_DIMS_SQL}]) AS dims),
    qs AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
           FROM nv WHERE vec_id IN ({_RECALL_IDS_SQL})),
    exact_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, c.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.ivec', na='q.q_nsq', nb='c.nsq')} DESC,
                 c.vec_id) AS rn
        FROM qs q, nv c WHERE c.vec_id != q.q_id) WHERE rn <= 5
    ),
    trunc AS (
      SELECT d.dims, nv.vec_id, nv.ivec[1:d.dims] AS tvec,
             list_dot_product(nv.ivec[1:d.dims], nv.ivec[1:d.dims]) AS tnsq
      FROM nv, dims d
    ),
    tq AS (SELECT dims, vec_id AS q_id, tvec AS q_tvec, tnsq AS q_tnsq
           FROM trunc WHERE vec_id IN ({_RECALL_IDS_SQL})),
    trunc_top AS (
      SELECT dims, q_id, vec_id FROM (
        SELECT q.dims, q.q_id, c.vec_id,
               row_number() OVER (PARTITION BY q.dims, q.q_id ORDER BY
                 list_dot_product(q.q_tvec, c.tvec)
                   / (sqrt(CAST(q.q_tnsq AS DOUBLE)) * sqrt(CAST(c.tnsq AS DOUBLE)))
                 DESC, c.vec_id) AS rn
        FROM tq q JOIN trunc c ON c.dims = q.dims AND c.vec_id != q.q_id)
      WHERE rn <= 5
    )
    SELECT t.dims AS trunc_dims, t.q_id,
           CAST(count(e.vec_id) AS BIGINT) AS n_hits
    FROM trunc_top t
    LEFT JOIN exact_top e ON e.q_id = t.q_id AND e.vec_id = t.vec_id
    GROUP BY t.dims, t.q_id
    """,
)
def llm_similarity_matryoshka_recall(spark, sf_dir):
    """Matryoshka prefix-truncation recall@5 at 32 and 16 dims vs the
    full 64-dim exact search — the storage/quality rung that prices
    "keep only the first d dims" against the PQ ladder's "keep m×k
    codes" (PLANS.md records both). Scale shape: truncation is a
    row-local slice (re-embedding nothing); each rung is the same
    brute-force panel search as llm_similarity_topk, so cost scales
    with dims kept — the ladder's cheapest rung to serve."""
    from distributed_query_engine_spark.functions.vectors import (
        cosine_from_ints,
        dot_long,
    )
    from distributed_query_engine_spark.operators.similarity import with_int_vec
    from pyspark.sql.window import Window

    e = Tables(spark, sf_dir).embeddings
    base = with_int_vec(e).select("vec_id", "ivec", "nsq")

    def top5(rel, vec_col, nsq_col, extra_part):
        q = rel.filter(F.col("vec_id").isin(_RECALL_QUERY_IDS)).select(
            *[F.col(c).alias(f"q_{c}") for c in extra_part],
            F.col("vec_id").alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.col(nsq_col).alias("q_nsq"),
        )
        join_cond = F.col("vec_id") != F.col("q_id")
        for c in extra_part:
            join_cond = join_cond & (F.col(f"q_{c}") == F.col(c))
        scored = rel.join(F.broadcast(q), join_cond).select(
            *[F.col(f"q_{c}").alias(c) for c in extra_part],
            "q_id",
            "vec_id",
            cosine_from_ints(
                dot_long(F.col("q_vec"), F.col(vec_col)),
                F.col("q_nsq"),
                F.col(nsq_col),
            ).alias("cosine"),
        )
        w = Window.partitionBy(*extra_part, "q_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .drop("cosine", "rn")
        )

    exact = top5(base, "ivec", "nsq", [])
    dims_df = spark.range(0).sparkSession.createDataFrame(
        [(d,) for d in _MATRYOSHKA_DIMS], "dims int"
    )
    trunc = base.crossJoin(F.broadcast(dims_df)).select(
        "dims",
        "vec_id",
        F.slice("ivec", 1, F.col("dims")).alias("tvec"),
    )
    trunc = trunc.withColumn("tnsq", dot_long(F.col("tvec"), F.col("tvec")))
    t_top = top5(trunc, "tvec", "tnsq", ["dims"])
    hits = (
        t_top.alias("t")
        .join(
            exact.alias("e"),
            (F.col("e.q_id") == F.col("t.q_id"))
            & (F.col("e.vec_id") == F.col("t.vec_id")),
            "left",
        )
        .groupBy(
            F.col("t.dims").alias("trunc_dims"), F.col("t.q_id").alias("q_id")
        )
        .agg(F.count(F.col("e.vec_id")).cast("long").alias("n_hits"))
    )
    return hits


# ---------------------------------------------------------------------------
# kNN-graph refinement rung of the ANN ladder (VERDICT r12 item 6)
# ---------------------------------------------------------------------------


def _graph_ctes(ids_sql: str, seeds: int, g: int, pair_pred: str = "") -> str:
    """The kNN-graph refinement CTE chain (requires _IVEC_CTE's ``nv``
    and _LSH_BUCKET_CTES's ``buckets``): cells/assignment identical to
    llm_similarity_ivf's, plus the two-grouping bounded-degree graph
    (operators/similarity.py::knn_graph replayed in SQL), IVF seed
    candidates, one-hop expansion, and the exact rerank relation
    ``g_rer``. ``pair_pred`` (an extra AND clause over gpairs' a/b
    aliases) restricts edge membership — the incremental-ingest oracle
    uses it to model the asymmetric graph (existing srcs only know
    existing dsts; batch srcs know everyone)."""
    return f"""
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    grouped AS (
      SELECT vec_id, CAST(cell_id AS BIGINT) AS grp FROM assigned
      UNION ALL
      -- bucket groups carry NEGATIVE ids (-(bucket+1)): cell ids are
      -- centroid vec_ids (non-negative, unbounded), so sign — not an
      -- additive offset — keeps the two groupings disjoint
      SELECT vec_id, -(bucket + 1) AS grp FROM buckets
    ),
    gpairs AS (
      SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
      FROM grouped a JOIN grouped b
        ON a.grp = b.grp AND a.vec_id != b.vec_id
        {pair_pred}
    ),
    graph AS (
      SELECT src_id, dst_id FROM (
        SELECT p.src_id, p.dst_id,
               row_number() OVER (PARTITION BY p.src_id ORDER BY
                 {_COS.format(a='sa.ivec', b='sb.ivec', na='sa.nsq', nb='sb.nsq')} DESC,
                 p.dst_id) AS grn
        FROM gpairs p
        JOIN nv sa ON sa.vec_id = p.src_id
        JOIN nv sb ON sb.vec_id = p.dst_id) WHERE grn <= {g}
    ),
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM nv WHERE vec_id IN ({ids_sql})),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    ivf_scored AS (
      SELECT p.q_id, a.vec_id,
             {_COS.format(a='q.q_ivec', b='a.ivec', na='q.q_nsq', nb='a.nsq')} AS cosine
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id
      JOIN q ON q.q_id = p.q_id
      WHERE a.vec_id != p.q_id
    ),
    seeds AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS srn
        FROM ivf_scored) WHERE srn <= {seeds}
    ),
    allc AS (
      SELECT DISTINCT q_id, vec_id FROM (
        SELECT q_id, vec_id FROM seeds
        UNION ALL
        SELECT s.q_id, gr.dst_id AS vec_id
        FROM seeds s JOIN graph gr ON gr.src_id = s.vec_id)
    ),
    g_rer AS (
      SELECT c.q_id, c.vec_id,
             {_COS.format(a='q.q_ivec', b='n.ivec', na='q.q_nsq', nb='n.nsq')} AS cosine
      FROM allc c
      JOIN nv n ON n.vec_id = c.vec_id
      JOIN q ON q.q_id = c.q_id
      WHERE c.vec_id != c.q_id
    )"""


@query(
    "llm_similarity_graph_refine",
    # Full replay: the two-grouping kNN graph, IVF probe seeds, one-hop
    # expansion, exact rerank — every stage deterministic.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    {_graph_ctes("0,1,2,3,4", S.GRAPH_SEEDS, S.KNN_G)}
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM g_rer) WHERE rn <= 5
    """,
)
def llm_similarity_graph_refine(spark, sf_dir):
    """Graph-refinement ANN rung (operators/similarity.py::
    topk_cosine_ivf_graph): IVF probe -> top-GRAPH_SEEDS seeds -> one
    hop over the bounded-degree kNN graph (within-cell AND within-LSH-
    bucket top-g neighbors — the bucket grouping crosscuts cells, so
    expansion reaches neighbors in UNPROBED cells) -> exact rerank to
    top-5. The distributed answer to HNSW's pointer chasing: bucketed
    joins against a bounded (corpus x g) edge relation. Measured gain
    on this corpus: recall@5 0.944 (IVF) -> 0.968 with a 60-candidate
    rerank set (llm_similarity_graph_recall)."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_cosine_ivf_graph(e, _QUERY_IDS, k=5)


@query(
    "llm_similarity_graph_recall",
    # recall@5 + candidate cost of IVF alone vs IVF+graph refinement
    # against the exact top-k, on the 25-query panel — same measured-
    # frontier discipline as llm_similarity_recall.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    {_graph_ctes(_RECALL_IDS_SQL, S.GRAPH_SEEDS, S.KNN_G)},
    exact_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, n.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='n.ivec', na='q.q_nsq', nb='n.nsq')} DESC,
                 n.vec_id) AS rn
        FROM q, nv n WHERE n.vec_id != q.q_id) WHERE rn <= 5
    ),
    ivf_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM ivf_scored) WHERE rn <= 5
    ),
    ivf_cand AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
                 FROM ivf_scored GROUP BY q_id),
    graph_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM g_rer) WHERE rn <= 5
    ),
    graph_cand AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
                   FROM g_rer GROUP BY q_id)
    SELECT 'ivf' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN ivf_top l USING (q_id, vec_id)
    JOIN ivf_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    UNION ALL
    SELECT 'ivf_graph' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN graph_top l USING (q_id, vec_id)
    JOIN graph_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    """,
)
def llm_similarity_graph_recall(spark, sf_dir):
    """recall@5 + candidate cost of the graph-refinement rung vs plain
    IVF on the 25-query panel (exact top-k as truth). Measured at
    sf0.01: IVF 0.944 recall at ~122 candidates/query; IVF+graph 0.968
    at a ~60-candidate RERANK set (the probe relation is shared, so
    refinement adds one bounded graph join and rescores fewer, better
    candidates). The knobs (KNN_G=8, GRAPH_SEEDS=10) were swept, not
    guessed — g=4 left recall at 0.952; seeds=20 doubled the rerank
    set for zero recall gain (BASELINE.md r13)."""
    e = Tables(spark, sf_dir).embeddings
    k = 5
    exact = S.topk_cosine(e, _RECALL_QUERY_IDS, k=k).select("q_id", "vec_id")
    out = None
    for method, ann in (
        ("ivf", S.topk_with_count(S.ivf_scored(e, _RECALL_QUERY_IDS), k)),
        (
            "ivf_graph",
            S.topk_with_count(S.ivf_graph_scored(e, _RECALL_QUERY_IDS), k),
        ),
    ):
        j = exact.withColumn("ex", F.lit(1)).join(
            ann.withColumn("hit", F.lit(1)), ["q_id", "vec_id"], "outer"
        )
        part = (
            j.groupBy("q_id")
            .agg(
                F.count(
                    F.when(F.col("ex").isNotNull() & F.col("hit").isNotNull(), 1)
                ).alias("n_hits"),
                F.max("n_candidates").alias("n_candidates"),
            )
            .filter(F.col("n_candidates").isNotNull())
            .select(
                F.lit(method).alias("method"),
                "q_id",
                F.col("n_hits").cast("long").alias("hits"),
                (F.col("n_hits") / F.lit(float(k))).alias("recall"),
                "n_candidates",
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


@query(
    "llm_similarity_graph_index",
    # Identical replay to llm_similarity_graph_refine: the index stores
    # exactly the relations that query derives, so search-from-index is
    # bit-identical — the build-once/search-many contract, third time
    # (IVF, BM25, now the graph rung).
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    {_graph_ctes("0,1,2,3,4", S.GRAPH_SEEDS, S.KNN_G)}
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM g_rer) WHERE rn <= 5
    """,
)
def llm_similarity_graph_index(spark, sf_dir):
    """Graph-refined ANN against a PERSISTED index artifact
    (operators/similarity.py::build_graph_index /
    topk_cosine_graph_index): centroids + cell-partitioned assignments
    + the bounded-degree edge relation materialized once
    (content-addressed, atomically published — fingerprint hit skips
    the build), then searched without touching the embeddings table.
    The graph build's two salted self-joins are the expensive stage;
    amortizing them across queries is what makes the refinement rung
    production-viable — same build-once/search-many economics the BM25
    index measured at 2.51x/query (BASELINE.md r12)."""
    e = Tables(spark, sf_dir).embeddings
    index = _content_addressed_index(
        sf_dir,
        "graph_index",
        f"graph:{S.KNN_G}:{S.N_CELLS}:{S.N_PLANES}:lowest_id:0",
        lambda p: S.build_graph_index(e, p),
    )
    return S.topk_cosine_graph_index(spark, index, _QUERY_IDS, k=5)


@query(
    "llm_similarity_sq8",
    # Full replay in EXACT integers. Unlike the other ANN oracles the
    # dots here can exceed 2^53 (u ≈ 255·2^20-scale), so the oracle
    # computes them RELATIONALLY (per-dimension join + BIGINT sum) —
    # list_dot_product's double-internal accumulation would round.
    # floor(a*255 / span) is the same IEEE double division on both
    # engines (a*255 < 2^53, exactly representable).
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    ex AS (SELECT vec_id, unnest(range(len(ivec))) AS pos,
                  unnest(ivec) AS x FROM nv),
    ds AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
    u AS (
      SELECT e.vec_id, e.pos,
             d.mn * {S.SQ_LEVELS}
             + (CASE WHEN d.mx > d.mn
                     THEN CAST(floor(((e.x - d.mn) * {S.SQ_LEVELS})
                                     / (d.mx - d.mn)) AS BIGINT)
                     ELSE 0 END) * (d.mx - d.mn) AS u
      FROM ex e JOIN ds d USING (pos)
    ),
    n AS (SELECT vec_id, CAST(sum(u*u) AS BIGINT) AS unsq
          FROM u GROUP BY vec_id),
    dots AS (
      SELECT qu.vec_id AS q_id, cu.vec_id,
             CAST(sum(qu.u * cu.u) AS BIGINT) AS dotv
      FROM u qu JOIN u cu ON cu.pos = qu.pos AND cu.vec_id != qu.vec_id
      WHERE qu.vec_id IN (0,1,2,3,4)
      GROUP BY qu.vec_id, cu.vec_id
    ),
    scored AS (
      SELECT d.q_id, d.vec_id,
             CAST(d.dotv AS DOUBLE)
               / (sqrt(CAST(nq.unsq AS DOUBLE)) * sqrt(CAST(nc.unsq AS DOUBLE)))
               AS cosine
      FROM dots d
      JOIN n nq ON nq.vec_id = d.q_id
      JOIN n nc ON nc.vec_id = d.vec_id
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_sq8(spark, sf_dir):
    """SCALAR-QUANTIZED (SQ8) similarity search — the training-free rung
    of the compression ladder (operators/similarity.py::sq8_quantized /
    topk_cosine_sq8): per-dimension 8-bit affine codes against corpus
    min/max, 4x smaller than float32 at rest, searched with exact
    integer arithmetic over the dequantized values. Measured recall@5
    vs exact cosine: 0.992 at sf0.001, 0.976 at sf0.01 — far above
    equal-bytes PQ on this isotropic corpus and without PQ's training
    step (the ladder's full comparison lives in PLANS.md r13). Scale
    shape: per-dim min/max is one map-combined aggregate broadcast as a
    1-row relation; encoding is a row-local zip; search is the same
    broadcast-panel scan as llm_similarity_topk."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_cosine_sq8(e, _QUERY_IDS, k=5)


@query(
    "llm_similarity_ivf_sq8",
    # IVF probe CTEs (llm_similarity_ivf's, verbatim) + the SQ8 u-value
    # chain (llm_similarity_sq8's relational-dot discipline) + shortlist
    # + exact rerank — every stage exact integers / shared-IEEE floors.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    cents AS (SELECT vec_id AS cell_id, ivec AS c_ivec, nsq AS c_nsq
              FROM nv WHERE vec_id < {S.N_CELLS}),
    assigned AS (
      SELECT vec_id, ivec, nsq, cell_id FROM (
        SELECT n.vec_id, n.ivec, n.nsq, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_COS.format(a='n.ivec', b='c.c_ivec', na='n.nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS crn
        FROM nv n, cents c) WHERE crn = 1
    ),
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM nv WHERE vec_id IN (0,1,2,3,4)),
    probes AS (
      SELECT q_id, cell_id FROM (
        SELECT q.q_id, c.cell_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='c.c_ivec', na='q.q_nsq', nb='c.c_nsq')} DESC,
                 c.cell_id) AS prn
        FROM q, cents c) WHERE prn <= {S.N_PROBE}
    ),
    ex AS (SELECT vec_id, unnest(range(len(ivec))) AS pos,
                  unnest(ivec) AS x FROM nv),
    ds AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
    uv AS (
      SELECT e.vec_id, e.pos,
             d.mn * {S.SQ_LEVELS}
             + (CASE WHEN d.mx > d.mn
                     THEN CAST(floor(((e.x - d.mn) * {S.SQ_LEVELS})
                                     / (d.mx - d.mn)) AS BIGINT)
                     ELSE 0 END) * (d.mx - d.mn) AS u
      FROM ex e JOIN ds d USING (pos)
    ),
    un AS (SELECT vec_id, CAST(sum(u*u) AS BIGINT) AS unsq
           FROM uv GROUP BY vec_id),
    sq_dots AS (
      SELECT p.q_id, a.vec_id,
             CAST(sum(qu.u * cu.u) AS BIGINT) AS dotv
      FROM probes p
      JOIN assigned a ON a.cell_id = p.cell_id AND a.vec_id != p.q_id
      JOIN uv cu ON cu.vec_id = a.vec_id
      JOIN uv qu ON qu.vec_id = p.q_id AND qu.pos = cu.pos
      GROUP BY p.q_id, a.vec_id
    ),
    shortlist AS (
      SELECT q_id, vec_id FROM (
        SELECT d.q_id, d.vec_id,
               row_number() OVER (PARTITION BY d.q_id ORDER BY
                 CAST(d.dotv AS DOUBLE)
                   / (sqrt(CAST(nq.unsq AS DOUBLE)) * sqrt(CAST(nc.unsq AS DOUBLE)))
                 DESC, d.vec_id) AS crn
        FROM sq_dots d
        JOIN un nq ON nq.vec_id = d.q_id
        JOIN un nc ON nc.vec_id = d.vec_id) WHERE crn <= {S.SQ_RERANK_C}
    ),
    rer AS (
      SELECT s.q_id, s.vec_id,
             {_COS.format(a='q.q_ivec', b='n.ivec', na='q.q_nsq', nb='n.nsq')} AS cosine
      FROM shortlist s
      JOIN nv n ON n.vec_id = s.vec_id
      JOIN q ON q.q_id = s.q_id
    )
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM rer) WHERE rn <= 5
    """,
)
def llm_similarity_ivf_sq8(spark, sf_dir):
    """IVF + SQ8 + EXACT RERANK (operators/similarity.py::
    topk_cosine_ivf_sq8) — the training-light production ANN config
    (FAISS "IVF,SQ8"): cells prune the scan, the probed candidates rank
    by the 4x-compressed scalar codes, and only a 25-id shortlist
    re-reads full-precision vectors. Same three-stage shape as
    llm_similarity_ivfpq_rerank with the trained codebooks swapped for
    the training-free affine grid — on this isotropic corpus the SQ8
    stage loses so little that the rerank recovers IVF's own recall
    exactly (llm_similarity_graph_recall's frontier has the numbers)."""
    e = Tables(spark, sf_dir).embeddings
    return S.topk_cosine_ivf_sq8(e, _QUERY_IDS, k=5)


_WSAMPLE_K = 100


@query(
    "llm_weighted_sample",
    # Priority sampling replay: u is the md5-derived 48-bit integer,
    # w the doc's token count; priority = u/w as an IEEE double of two
    # exact integers — identical division on both engines, so the
    # top-k-by-priority sample is bit-reproducible.
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS u
      FROM documents
    )
    SELECT doc_id, source, weight, priority, rk FROM (
      SELECT *, CAST(u AS DOUBLE) / weight AS priority,
             CAST(row_number() OVER (
                 ORDER BY CAST(u AS DOUBLE) / weight, doc_id) AS BIGINT) AS rk
      FROM pri) WHERE rk <= {_WSAMPLE_K}
    """,
)
def llm_weighted_sample(spark, sf_dir):
    """WEIGHT-PROPORTIONAL corpus sampling (priority sampling, Duffield
    et al. 2007 — public): each doc draws a deterministic pseudo-uniform
    u (md5 of its id) and gets priority u/weight; the k SMALLEST
    priorities form a without-replacement sample where inclusion
    probability grows with weight (here: token count — longer docs
    sampled preferentially). The per-ITEM companion to the per-GROUP
    samplers (llm_domain_mix_sample's rates, temperature_mix's
    sqrt-smoothing): this is how a training pipeline subsamples a
    corpus proportional to per-document quality/length scores.

    Deterministic where randomSplit/rand() are not: u is a row-local
    hash, so any engine, any partitioning, any corpus subset draws the
    same sample — and the oracle replays it exactly (u/w is one IEEE
    division of two exact integers). Scale shape: one scan + one
    TakeOrdered top-k — no global sort materializes (the k-row heap is
    per-partition then merged)."""
    d = Tables(spark, sf_dir).documents
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = F.size(F.split("text", " ")).cast("long")
    pri = d.select(
        "doc_id",
        "source",
        w.alias("weight"),
        (u.cast("double") / w).alias("priority"),
    )
    from pyspark.sql.window import Window as _W

    win = _W.orderBy("priority", "doc_id")
    return (
        pri.withColumn("rk", F.row_number().over(win).cast("long"))
        .filter(F.col("rk") <= _WSAMPLE_K)
    )


@query(
    "llm_similarity_graph_incremental",
    # Same chain as llm_similarity_graph_refine with the ASYMMETRIC
    # edge-membership predicate: an existing src (vec_id%100 < 90) only
    # knows existing dsts (its edges were built before the batch); a
    # batch src knows the full corpus (its edges were appended against
    # existing ∪ batch). Centroid seeds (vec_id < N_CELLS) are all
    # existing under the mod-100 split, so the quantizer — and hence
    # cells, probes, and seed candidates — matches the stored index
    # exactly (the llm_similarity_ivf_incremental contract).
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    {_graph_ctes(
        "0,1,2,3,4", S.GRAPH_SEEDS, S.KNN_G,
        pair_pred=f"AND ((a.vec_id % {_IVF_NEW_MOD} >= {_IVF_NEW_LO}) "
                  f"OR (b.vec_id % {_IVF_NEW_MOD} < {_IVF_NEW_LO}))",
    )}
    SELECT q_id, vec_id, cosine, rn,
           (vec_id % {_IVF_NEW_MOD}) >= {_IVF_NEW_LO} AS is_new
    FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM g_rer) WHERE rn <= 5
    """,
)
def llm_similarity_graph_incremental(spark, sf_dir):
    """Graph-index LIFECYCLE — ingest a new vector batch WITHOUT
    rebuilding (the graph leg of the incremental triangle after IVF and
    BM25): build the index from the existing 90% (build_graph_index),
    append the new 10% (append_to_graph_index — batch assigned to the
    STORED centroids; batch-source edges computed against the full
    corpus in one bounded group join), then search. is_new marks hits
    served from the fresh batch — new vectors are immediately
    reachable both as probe candidates (assignments appended) and as
    expansion targets (any seed landing on them).

    The honest asymmetry (documented, oracle-modeled): existing nodes'
    edge lists don't gain pointers INTO the batch until the periodic
    rebuild — the standard staleness tradeoff every incremental graph
    store makes; the exact oracle encodes it with one membership
    predicate rather than pretending ingest equals a rebuild."""
    e = Tables(spark, sf_dir).embeddings
    is_new = F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    from distributed_query_engine_spark.catalog import staging_key
    from distributed_query_engine_spark.streaming.ops import _pid_run_dir

    index = str(_pid_run_dir("graph_index_incr", staging_key(sf_dir)))
    S.build_graph_index(e.filter(~is_new), index)
    S.append_to_graph_index(spark, e.filter(is_new), index)
    res = S.topk_cosine_graph_index(spark, index, _QUERY_IDS, k=5)
    return res.withColumn(
        "is_new", F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    )


@query(
    "llm_similarity_graph_compact",
    # After compaction the edge relation is the SYMMETRIC full-corpus
    # graph again — so the oracle is llm_similarity_graph_refine's
    # replay (no membership predicate) + the is_new flag: compaction
    # provably erased the ingest asymmetry.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_LSH_BUCKET_CTES},
    {_graph_ctes("0,1,2,3,4", S.GRAPH_SEEDS, S.KNN_G)}
    SELECT q_id, vec_id, cosine, rn,
           (vec_id % {_IVF_NEW_MOD}) >= {_IVF_NEW_LO} AS is_new
    FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM g_rer) WHERE rn <= 5
    """,
)
def llm_similarity_graph_compact(spark, sf_dir):
    """Graph-index COMPACTION — the closing leg of the graph lifecycle
    (build -> incremental ingest -> compact -> search): after ingest,
    existing nodes' edge lists are stale (no pointers into the batch);
    compact_graph_index recomputes the full symmetric edge relation
    over the current assignments and atomically swaps it in. The
    CHECKABLE contract: post-compaction search is bit-identical to the
    symmetric full-corpus graph (the refine query's oracle verbatim) —
    the asymmetry the incremental oracle had to model is gone. One
    caveat the oracle enforces implicitly: the stored quantizer is the
    EXISTING-side one (centroid seeds all land existing under the
    mod-100 split), exactly what a deployment that never retrains on
    ingest serves."""
    e = Tables(spark, sf_dir).embeddings
    is_new = F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    from distributed_query_engine_spark.catalog import staging_key
    from distributed_query_engine_spark.streaming.ops import _pid_run_dir

    index = str(_pid_run_dir("graph_index_compact", staging_key(sf_dir)))
    S.build_graph_index(e.filter(~is_new), index)
    S.append_to_graph_index(spark, e.filter(is_new), index)
    S.compact_graph_index(spark, index)
    res = S.topk_cosine_graph_index(spark, index, _QUERY_IDS, k=5)
    return res.withColumn(
        "is_new", F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    )


@query(
    "llm_similarity_sq8_incremental",
    # SQ8's ingest contract: the quantizer (per-dim min/max) is learned
    # from the EXISTING 90% and NEVER re-derived; batch values CLAMP to
    # the stored ranges before encoding (saturating at the grid edge),
    # so previously stored codes stay valid. The oracle derives ds from
    # existing rows only and applies the same least/greatest clamp to
    # every row (identity on the defining side) — relational BIGINT
    # dots as in llm_similarity_sq8.
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    ex AS (SELECT vec_id, unnest(range(len(ivec))) AS pos,
                  unnest(ivec) AS x FROM nv),
    ds AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex
           WHERE vec_id % {_IVF_NEW_MOD} < {_IVF_NEW_LO} GROUP BY pos),
    u AS (
      SELECT e.vec_id, e.pos,
             d.mn * {S.SQ_LEVELS}
             + (CASE WHEN d.mx > d.mn
                     THEN CAST(floor(((least(greatest(e.x, d.mn), d.mx) - d.mn)
                                      * {S.SQ_LEVELS})
                                     / (d.mx - d.mn)) AS BIGINT)
                     ELSE 0 END) * (d.mx - d.mn) AS u
      FROM ex e JOIN ds d USING (pos)
    ),
    n AS (SELECT vec_id, CAST(sum(u*u) AS BIGINT) AS unsq
          FROM u GROUP BY vec_id),
    dots AS (
      SELECT qu.vec_id AS q_id, cu.vec_id,
             CAST(sum(qu.u * cu.u) AS BIGINT) AS dotv
      FROM u qu JOIN u cu ON cu.pos = qu.pos AND cu.vec_id != qu.vec_id
      WHERE qu.vec_id IN (0,1,2,3,4)
      GROUP BY qu.vec_id, cu.vec_id
    ),
    scored AS (
      SELECT d.q_id, d.vec_id,
             CAST(d.dotv AS DOUBLE)
               / (sqrt(CAST(nq.unsq AS DOUBLE)) * sqrt(CAST(nc.unsq AS DOUBLE)))
               AS cosine
      FROM dots d
      JOIN n nq ON nq.vec_id = d.q_id
      JOIN n nc ON nc.vec_id = d.vec_id
    )
    SELECT q_id, vec_id, cosine, rn,
           (vec_id % {_IVF_NEW_MOD}) >= {_IVF_NEW_LO} AS is_new
    FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def llm_similarity_sq8_incremental(spark, sf_dir):
    """SQ8 index LIFECYCLE — ingest a batch WITHOUT re-deriving the
    quantizer (operators/similarity.py::build_sq8_index /
    append_to_sq8_index / topk_cosine_sq8_index): per-dim min/max are
    learned from the existing 90% and stored as the versioned ``dims``
    artifact; the new 10% encodes against them with CLAMPING (an
    out-of-range value saturates at the learned grid edge — the
    standard scalar-quantizer ingest rule, same reason IVF never
    retrains centroids on append: re-deriving ranges would invalidate
    every stored code). Search serves entirely from codes + the 1-row
    dims relation; is_new marks batch hits — ingested vectors are
    immediately searchable at full SQ8 quality."""
    e = Tables(spark, sf_dir).embeddings
    is_new = F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    from distributed_query_engine_spark.catalog import staging_key
    from distributed_query_engine_spark.streaming.ops import _pid_run_dir

    index = str(_pid_run_dir("sq8_index_incr", staging_key(sf_dir)))
    S.build_sq8_index(e.filter(~is_new), index)
    S.append_to_sq8_index(spark, e.filter(is_new), index)
    res = S.topk_cosine_sq8_index(spark, index, _QUERY_IDS, k=5)
    return res.withColumn(
        "is_new", F.pmod(F.col("vec_id"), F.lit(_IVF_NEW_MOD)) >= _IVF_NEW_LO
    )


def _sq8_u_ctes(existing_only: bool = False) -> str:
    """The SQ8 u-value chain (requires ``nv``): per-dim stats, clamped
    8-bit encode, exact u = 255*dequant, norms — shared by the sq8
    search, recall, and incremental oracles."""
    where = (
        f"WHERE vec_id % {_IVF_NEW_MOD} < {_IVF_NEW_LO} " if existing_only else ""
    )
    return f"""
    ex AS (SELECT vec_id, unnest(range(len(ivec))) AS pos,
                  unnest(ivec) AS x FROM nv),
    ds AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex
           {where}GROUP BY pos),
    uq AS (
      SELECT e.vec_id, e.pos,
             d.mn * {S.SQ_LEVELS}
             + (CASE WHEN d.mx > d.mn
                     THEN CAST(floor(((least(greatest(e.x, d.mn), d.mx) - d.mn)
                                      * {S.SQ_LEVELS})
                                     / (d.mx - d.mn)) AS BIGINT)
                     ELSE 0 END) * (d.mx - d.mn) AS u
      FROM ex e JOIN ds d USING (pos)
    ),
    un AS (SELECT vec_id, CAST(sum(u*u) AS BIGINT) AS unsq
           FROM uq GROUP BY vec_id)"""


@query(
    "llm_similarity_sq8_recall",
    # recall@5 + candidate cost of the two SQ8 rungs vs exact cosine on
    # the 25-query panel — the measured-frontier discipline applied to
    # the training-free compression rung (clamp is the identity here:
    # the whole corpus defines the grid).
    oracle=lambda: f"""
    WITH {_IVEC_CTE},
    {_sq8_u_ctes()},
    q AS (SELECT vec_id AS q_id, ivec AS q_ivec, nsq AS q_nsq
          FROM nv WHERE vec_id IN ({_RECALL_IDS_SQL})),
    exact_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, n.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 {_COS.format(a='q.q_ivec', b='n.ivec', na='q.q_nsq', nb='n.nsq')} DESC,
                 n.vec_id) AS rn
        FROM q, nv n WHERE n.vec_id != q.q_id) WHERE rn <= 5
    ),
    sq_scored AS (
      SELECT qu.vec_id AS q_id, cu.vec_id,
             CAST(sum(qu.u * cu.u) AS DOUBLE)
               / (sqrt(CAST(nq.unsq AS DOUBLE)) * sqrt(CAST(nc.unsq AS DOUBLE)))
               AS cosine
      FROM uq qu
      JOIN uq cu ON cu.pos = qu.pos AND cu.vec_id != qu.vec_id
      JOIN un nq ON nq.vec_id = qu.vec_id
      JOIN un nc ON nc.vec_id = cu.vec_id
      WHERE qu.vec_id IN ({_RECALL_IDS_SQL})
      GROUP BY qu.vec_id, cu.vec_id, nq.unsq, nc.unsq
    ),
    sq_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM sq_scored) WHERE rn <= 5
    ),
    sq_cand AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
                FROM sq_scored GROUP BY q_id)
    SELECT 'sq8' AS method, e.q_id,
           CAST(count(l.vec_id) AS BIGINT) AS hits,
           count(l.vec_id) / 5.0 AS recall,
           any_value(c.n_candidates) AS n_candidates
    FROM exact_top e
    LEFT JOIN sq_top l USING (q_id, vec_id)
    JOIN sq_cand c ON c.q_id = e.q_id
    GROUP BY e.q_id
    """,
)
def llm_similarity_sq8_recall(spark, sf_dir):
    """recall@5 + candidate cost of the SQ8 rung vs exact cosine on the
    25-query panel — the measured-frontier entry for the training-free
    compression rung (sq8 is brute-force over the whole corpus, so
    n_candidates = corpus−1: its cost story is BYTES at rest, not
    candidate pruning; pair it with IVF for pruning —
    llm_similarity_ivf_sq8). Measured: 0.992 recall@5 at sf0.001,
    0.976 at sf0.01 — the isotropic-corpus winner at equal bytes (the
    PQ ladder needs clustered structure to compete; PLANS.md r13)."""
    e = Tables(spark, sf_dir).embeddings
    k = 5
    exact = S.topk_cosine(e, _RECALL_QUERY_IDS, k=k).select("q_id", "vec_id")
    qz = S.sq8_quantized(e)
    q = qz.filter(F.col("vec_id").isin(_RECALL_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("uvec").alias("q_uvec"),
        F.col("unsq").alias("q_unsq"),
    )
    from distributed_query_engine_spark.functions.vectors import (
        cosine_from_ints,
        dot_long,
    )

    scored = (
        qz.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine_from_ints(
                dot_long(F.col("q_uvec"), F.col("uvec")),
                F.col("q_unsq"),
                F.col("unsq"),
            ).alias("cosine"),
        )
    )
    ann = S.topk_with_count(scored, k)
    j = exact.withColumn("ex", F.lit(1)).join(
        ann.withColumn("hit", F.lit(1)), ["q_id", "vec_id"], "outer"
    )
    return (
        j.groupBy("q_id")
        .agg(
            F.count(
                F.when(F.col("ex").isNotNull() & F.col("hit").isNotNull(), 1)
            ).alias("n_hits"),
            F.max("n_candidates").alias("n_candidates"),
        )
        .filter(F.col("n_candidates").isNotNull())
        .select(
            F.lit("sq8").alias("method"),
            "q_id",
            F.col("n_hits").cast("long").alias("hits"),
            (F.col("n_hits") / F.lit(float(k))).alias("recall"),
            "n_candidates",
        )
    )
