"""Scalar function families (SURVEY.md §2.3): string, date, math,
conditional, cast, array, map, JSON.

Reference parity: the reference evidences the *types* these operate on
(numeric tower diff:213-217, date/time/timestamp diff:220-222, strings
with ICU diff:313-314, nested collections diff:227, Jackson/JSON
diff:8,11) — the function surface itself is RAW-QL/Spark-parity [P].

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python on the hot path.

Cross-engine type notes (so the driver's schema check passes):
Spark's length/year/month/datediff/size return INT where DuckDB returns
BIGINT → Spark results are cast to long. DuckDB's floor/ceil on DOUBLE
return DOUBLE where Spark returns BIGINT → oracle casts to BIGINT.
DuckDB ``CAST(double AS INT)`` *rounds* while Spark *truncates* → oracle
uses ``CAST(trunc(x) AS INT)`` to pin truncation semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_query_engine_spark.catalog import Tables
from distributed_query_engine_spark.registry import query


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           substring(c_name, 10, 9) AS cust_num,
           length(c_name) AS name_len,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           regexp_extract(c_name, '#(\\d+)', 1) AS extracted,
           regexp_replace(c_name, '0', 'X', 'g') AS replaced,
           trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
           array_to_string(string_split(c_name, '#'), '|') AS parts
    FROM customer
    """,
)
def scalar_string(spark, sf_dir):
    c = Tables(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("extracted"),
        F.regexp_replace("c_name", "0", "X").alias("replaced"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        # Driver-hashable contract: every top-level output column is a
        # SCALAR — the driver's pandas-based canonicalizer cannot sort
        # array columns, so the split result is re-joined to a string.
        F.concat_ws("|", F.split("c_name", "#")).alias("parts"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mon,
           day(o_orderdate) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch0,
           o_orderdate + INTERVAL 7 DAY AS plus_week,
           CAST(o_orderdate AS DATE) AS as_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders
    """,
)
def scalar_date(spark, sf_dir):
    o = Tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch0"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("plus_week"),
        F.to_date("o_orderdate").alias("as_date"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 2) AS rounded,
           CAST(floor(o_totalprice) AS BIGINT) AS floored,
           CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
           abs(o_totalprice - 100000.0) AS dist,
           sqrt(o_totalprice) AS root,
           round(ln(o_totalprice), 9) AS log_e,
           mod(o_orderkey, 97) AS key_mod,
           o_totalprice * o_totalprice AS squared
    FROM orders
    """,
)
def scalar_math(spark, sf_dir):
    # sqrt is IEEE-exact (safe to compare raw); ln may differ by 1 ulp
    # between libm and the JVM → rounded to 9 decimals on both sides.
    o = Tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("rounded"),
        F.floor("o_totalprice").alias("floored"),
        F.ceil("o_totalprice").alias("ceiled"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist"),
        F.sqrt("o_totalprice").alias("root"),
        F.round(F.log(F.col("o_totalprice")), 9).alias("log_e"),
        (F.col("o_orderkey") % 97).alias("key_mod"),
        (F.col("o_totalprice") * F.col("o_totalprice")).alias("squared"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 10000 THEN 'mid'
                ELSE 'small' END AS size_bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           least(o_totalprice, 50000.0) AS capped,
           greatest(o_totalprice, 50000.0) AS floored_at
    FROM orders
    """,
)
def scalar_conditional(spark, sf_dir):
    o = Tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
        .alias("size_bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.least("o_totalprice", F.lit(50000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(50000.0)).alias("floored_at"),
    )


@query(
    "scalar_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_long,
           CAST(l_orderkey AS DOUBLE) AS key_double,
           CAST(trunc(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(mod(l_linenumber, 2) AS BOOLEAN) AS odd_line,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str
    FROM lineitem
    """,
)
def scalar_cast(spark, sf_dir):
    # Spark CAST(double AS INT) truncates toward zero; DuckDB's rounds —
    # the oracle pins truncation with CAST(trunc(x) AS INT).
    l = Tables(spark, sf_dir).lineitem
    return l.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("line_long"),
        F.col("l_orderkey").cast("double").alias("key_double"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        (F.col("l_linenumber") % 2).cast("boolean").alias("odd_line"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
    )


@query(
    "scalar_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), '|') AS first3,
           string_split(text, ' ')[1] AS first_word,
           string_split(text, ' ')[-1] AS last_word,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), '|') AS vocab
    FROM documents
    """,
)
def scalar_array(spark, sf_dir):
    # Nested-collection scalars (RAW's collection values, diff:227/:287):
    # split → array column, then size/slice/element_at/contains/distinct.
    d = Tables(spark, sf_dir).documents
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        # Array logic runs JVM-side as before; the final projection joins
        # arrays to '|'-separated strings so every top-level output
        # column is a driver-hashable scalar.
        F.concat_ws("|", F.slice(words, 1, 3)).alias("first3"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.concat_ws("|", F.sort_array(F.array_distinct(words))).alias("vocab"),
    )


@query(
    "lateral_explode",
    oracle="""
    SELECT doc_id, pos, word, CAST(len(word) AS INT) AS word_len
    FROM (
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(ws))) - 1 AS INT) AS pos,
             unnest(ws) AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE doc_id % 50 = 0)
    )
    """,
)
def lateral_explode(spark, sf_dir):
    """LATERAL VIEW / table-generating projection: posexplode turns each
    document into one row per word with its position — the relational
    normalization step under every token-level pipeline. Generate is a
    narrow (no-shuffle) operator inside whole-stage codegen; output row
    count scales with total tokens, so the doc_id filter is PUSHED
    beneath the generator (Catalyst does this automatically — predicate
    through Generate), keeping the explosion proportional to the
    selected docs only."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") % 50 == 0)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).select(
        "doc_id",
        "pos",
        "word",
        F.length("word").alias("word_len"),
    )


@query(
    "scalar_map",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(map_keys(map(['type', 'bucket'],
               [event_type, CAST(mod(user_id, 10) AS VARCHAR)]))), '|') AS keys_sorted,
           map(['type', 'bucket'],
               [event_type, CAST(mod(user_id, 10) AS VARCHAR)])['type'][1] AS type_val
    FROM events
    """,
)
def scalar_map(spark, sf_dir):
    e = Tables(spark, sf_dir).events
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("bucket"), (F.col("user_id") % 10).cast("string"),
    )
    return e.select(
        "event_id",
        # Map logic stays JVM-side; keys re-joined to a scalar string for
        # the driver-hashable output contract.
        F.concat_ws("|", F.sort_array(F.map_keys(m))).alias("keys_sorted"),
        F.element_at(m, "type").alias("type_val"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           CAST(to_json(struct_pack(t := event_type)) AS VARCHAR) AS packed
    FROM events
    """,
)
def scalar_json(spark, sf_dir):
    # Schema-on-read over a JSON string column (the reference's
    # Jackson-everywhere surface, diff:8,11): extract as string, parse to
    # a typed struct, and re-serialize.
    e = Tables(spark, sf_dir).events
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k long").getField("k").alias("k_num"),
        F.to_json(F.struct(F.col("event_type").alias("t"))).alias("packed"),
    )


@query(
    "scalar_variant",
    oracle="""
    SELECT o_orderkey,
           CAST(json_extract(js, '$.key') AS BIGINT) AS v_key,
           json_extract_string(js, '$.pri') AS v_pri,
           CAST(json_extract(js, '$.price') AS BIGINT) AS v_price_cents,
           CAST(json_extract(js, '$.tags[1]') AS BIGINT) AS v_tag1,
           CAST(json_array_length(js, '$.tags') AS BIGINT) AS v_ntags
    FROM (
      SELECT o_orderkey,
             concat('{"key":', o_orderkey,
                    ',"pri":"', o_orderpriority,
                    '","price":', CAST(round(o_totalprice * 100) AS BIGINT),
                    ',"tags":[', o_orderkey % 10, ',', o_orderkey % 7, ']}')
               AS js
      FROM orders
    )
    """,
)
def scalar_variant(spark, sf_dir):
    """VARIANT — Spark 4's semi-structured type (open-format binary
    JSON): ``parse_json`` once, then typed ``variant_get`` path
    extraction, nested array indexing included. Unlike repeated
    ``get_json_object`` (which re-parses the string per call,
    scalar_json), the variant is parsed ONCE into a binary encoding and
    every extraction is a cheap path walk — the 100 TB answer to wide
    semi-structured event payloads. The JSON document is constructed
    deterministically from orders columns so DuckDB can replay the
    identical extraction with its JSON functions (prices in integer
    cents — exact in both engines)."""
    o = Tables(spark, sf_dir).orders
    js = F.concat(
        F.lit('{"key":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"pri":"'),
        F.col("o_orderpriority"),
        F.lit('","price":'),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit(',"tags":['),
        (F.col("o_orderkey") % 10).cast("string"),
        F.lit(","),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit("]}"),
    )
    base = o.select("o_orderkey", F.parse_json(js).alias("v"))
    return base.select(
        "o_orderkey",
        F.variant_get("v", "$.key", "bigint").alias("v_key"),
        F.variant_get("v", "$.pri", "string").alias("v_pri"),
        F.variant_get("v", "$.price", "bigint").alias("v_price_cents"),
        F.variant_get("v", "$.tags[1]", "bigint").alias("v_tag1"),
        F.size(F.variant_get("v", "$.tags", "array<bigint>"))
        .cast("long")
        .alias("v_ntags"),
    )


@query(
    "scalar_try_family",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE CAST(o_totalprice / NULLIF(o_orderkey % 10, 0)
                          AS DOUBLE) END AS safe_div,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS good_cast,
           CAST(o_orderkey AS BIGINT) * 0 + 1 AS stable_one
    FROM orders
    """,
)
def scalar_try_family(spark, sf_dir):
    """The ``try_*`` escape hatches for ANSI mode (Spark 4 runs ANSI ON
    by default, so division-by-zero and bad casts THROW): try_divide
    yields NULL instead of an error, try_cast NULL instead of a parse
    failure. Cross-engine: DuckDB's division by NULLIF(0) and TRY_CAST
    state the identical semantics. ANSI-by-default plus explicit try_*
    at known-dirty boundaries is the 100 TB posture — a corrupt row
    NULLs out instead of either killing the job or (worse, pre-ANSI)
    silently wrapping."""
    o = Tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 10).alias(
            "safe_div"
        ),
        F.try_to_number(F.col("o_orderpriority"), F.lit("9")).cast("long").alias(
            "bad_cast"
        ),
        F.expr("TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").alias(
            "good_cast"
        ),
        (F.try_multiply(F.col("o_orderkey").cast("long"), F.lit(0)) + 1).alias(
            "stable_one"
        ),
    )


@query(
    "scalar_regex_family",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+o[a-z]+')) AS BIGINT)
             AS n_matches,
           COALESCE(array_to_string(regexp_extract_all(text, '[a-z]+o[a-z]+'), '|'), '')
             AS all_matches,
           regexp_extract(text, '[a-z]+o[a-z]+') AS first_match,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled
    FROM documents
    """,
)
def scalar_regex_family(spark, sf_dir):
    """The REGEXP function family beyond the basic extract/replace in
    scalar_string: regexp_count (as the match-array length — the
    driver-hashable scalar form), EXTRACT-ALL (re-joined to a string:
    the array-column canonicalizer lesson), first-match extraction,
    and global replacement (the zero-match edge pinned: DuckDB's
    array_to_string returns NULL for an empty match list where Spark's
    array_join gives '' — the oracle coalesces). Patterns are kept in the
    character-class/quantifier subset where Java regex (Spark) and RE2
    (DuckDB) agree exactly — lookarounds and backreferences are where
    the engines fork, and a cross-engine pipeline must not depend on
    them. All row-local, codegen'd, zero shuffles before the scan."""
    d = Tables(spark, sf_dir).documents
    pat = "[a-z]+o[a-z]+"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast("long").alias(
            "n_matches"
        ),
        F.array_join(F.regexp_extract_all("text", F.lit(pat), 0), "|").alias(
            "all_matches"
        ),
        F.regexp_extract("text", pat, 0).alias("first_match"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


@query(
    "scalar_collation",
    # Spark 4 collations: UTF8_LCASE comparisons/aggregation — the
    # declarative alternative to sprinkling lower() everywhere (and the
    # collation-aware path Catalyst can optimize: the collation is part
    # of the type, so GROUP BY / = / startswith are collation-native).
    # DuckDB has no collated types here, so the oracle lower()s — the
    # cross-engine definition of UTF8_LCASE equality.
    oracle="""
    SELECT lower(p_brand) AS brand_lc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT p_name) AS BIGINT) AS n_names
    FROM part
    WHERE lower(p_type) LIKE 'sm%'
    GROUP BY lower(p_brand)
    """,
)
def scalar_collation(spark, sf_dir):
    """Case-insensitive filter + grouping via a COLLATE UTF8_LCASE cast
    (not lower()): the collation travels with the column, so the plan's
    comparison, LIKE, and grouping are collation-aware natively. The
    projected group key lower()s only for the cross-engine result
    contract (a collated string renders with its original case — the
    oracle needs a deterministic representative)."""
    p = Tables(spark, sf_dir).part
    coll = p.select(
        F.expr("p_brand COLLATE UTF8_LCASE").alias("brand"),
        F.expr("p_type COLLATE UTF8_LCASE").alias("ptype"),
        "p_name",
    )
    return (
        coll.filter(F.col("ptype").startswith("sm"))
        .groupBy(F.lower(F.col("brand")).alias("brand_lc"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.countDistinct("p_name").cast("long").alias("n_names"),
        )
    )
