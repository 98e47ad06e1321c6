"""Text-analysis expression library (north-star ops): language-ID,
quality scoring, token counting, fingerprinting. Pure built-in-function
Column expressions — JVM-side, codegen-friendly, no Python on the hot
path. Each has a documented DuckDB-SQL twin used by the oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword-hit language-ID
# heuristic. Deterministic tie-break: the LANG_ORDER below.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "y", "de"),
    "de": ("der", "und", "die", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "le", "shi", "bu"),
}
LANG_ORDER = ("en", "es", "de", "fr", "zh")


def words(text: Column) -> Column:
    return F.split(text, " ")


def sliding_windows(arr: Column, n: int) -> Column:
    """All length-``n`` adjacent windows of ``arr`` as an array of
    structs (fields "0".."n-1"), built from ``arrays_zip`` of ``n``
    slices. The point is WHERE ``arr`` gets evaluated: higher-order-
    function ARGUMENTS evaluate once per row, while any expression
    referenced inside a lambda BODY re-evaluates per element — and
    projection collapse re-inlines aliases, so
    ``element_at(split(text), i + k)`` style indexing re-runs split()
    for every window even when the split was aliased first (r9
    doc_ngram_arrays lesson: 20.7 s → 2.6 s at sf1 for identical
    output). Short arrays come free: slice length max(len-(n-1), 0)
    yields empty windows, no sequence(1, k<1) descending hazard."""
    glen = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(arr, k + 1, glen) for k in range(n)])


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (long)."""
    return F.size(words(text)).cast("long")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: count of non-overlapping runs of letters,
    digits, or single punctuation — ``\\p{L}+|\\d+|[^\\s]`` — the classic
    pre-tokenizer split. Built from the passed Column (not a hardcoded
    column name) so it works on any column/alias. regexp_count twin:
    DuckDB ``len(regexp_extract_all(text, pattern))``."""
    pattern = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")


def lang_hits(text: Column, lang: str) -> Column:
    """Number of marker tokens of ``lang`` present in the text (set
    semantics)."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(words(text)), markers)).cast("long")


def lang_predict(text: Column) -> Column:
    """argmax over lang_hits with the LANG_ORDER preference on ties —
    expressed as a comparison chain so any engine reproduces it."""
    hits = {lg: lang_hits(text, lg) for lg in LANG_ORDER}
    best = None
    for lg in LANG_ORDER:
        cond = F.lit(True)
        for other in LANG_ORDER:
            if other == lg:
                continue
            # strictly greater than every earlier lang, >= every later
            if LANG_ORDER.index(other) < LANG_ORDER.index(lg):
                cond = cond & (hits[lg] > hits[other])
            else:
                cond = cond & (hits[lg] >= hits[other])
        best = F.when(cond, lg) if best is None else best.when(cond, lg)
    return best.otherwise(LANG_ORDER[0])


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + mean token length band +
    alpha ratio. Integer/ratio arithmetic only → engine-exact."""
    n_chars = F.length(text).cast("double")
    n_tok = token_count_ws(text).cast("double")
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus spaces
    len_ok = F.when((n_chars >= 100) & (n_chars <= 1000), 1.0).otherwise(0.0)
    tok_ok = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), 1.0).otherwise(0.0)
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("double") / n_chars
    )
    return F.round((len_ok + tok_ok + alpha_ratio) / 3.0, 9)


def fingerprint_md5(text: Column) -> Column:
    """Exact-content fingerprint: md5 hex — identical in any engine."""
    return F.md5(text.cast("binary"))


def fingerprint_prefix(text: Column, n_tokens: int = 5) -> Column:
    """Shingle fingerprint: md5 of the first n tokens — the cheap
    near-dup blocking key (rolling-hash analog)."""
    return F.md5(
        F.concat_ws(" ", F.slice(words(text), 1, n_tokens)).cast("binary")
    )


def bpe_encode(word: Column, merges: "tuple[tuple[str, str], ...]") -> Column:
    """Apply an ordered BPE merge table to a single lowercase word,
    returning the resulting token array (array<string>).

    Encoding trick shared with the DuckDB oracle: the word becomes the
    delimiter-framed character string ``||c1||c2||...||``; each merge
    (a, b) -> ab is one literal non-overlapping left-to-right
    ``replace('|a||b|' -> '|ab|')``. The pattern consumes only the
    INNER pipes, so adjacent matches keep their shared frame and a
    single replace() per merge reproduces greedy BPE merge application
    exactly (pinned against a pure-Python BPE model in
    tests/test_operators_unit.py). Tokens must not contain ``|`` —
    callers filter to ``^[a-z]+$`` words."""
    s = F.concat(
        F.lit("|"), F.regexp_replace(word, "(.)", "|$1|"), F.lit("|")
    )
    for a, b in merges:
        s = F.replace(s, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    return F.split(F.regexp_replace(s, r"^\|\||\|\|$", ""), r"\|\|")
