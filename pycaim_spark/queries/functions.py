"""Scalar function families (SURVEY.md §2.B Scalar functions): one composite
query per family, each exercising several representative functions.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere in these paths.

Cross-engine parity notes:

- Outputs avoid DateType (pandas dtype mismatch between engines) — date
  arithmetic stays in timestamp space.
- ceil/floor results are cast to BIGINT on both sides (DuckDB returns
  DOUBLE, Spark LONG).
- Transcendentals (ln/exp/pow) are rounded to 6 dp: both engines use
  correctly-rounded-to-~1ulp libm doubles, so 6 dp is far beyond the
  divergence scale, while per-row arithmetic (+,-,*,/) is bit-exact and
  left unrounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.registry import register


@register(
    "fn_string",
    tags=("function",),
    oracle=r"""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           trim('  ' || c_mktsegment || ' ') AS seg_trimmed,
           CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_num,
           CASE WHEN c_name LIKE '%42' THEN 1 ELSE 0 END AS ends_42
    FROM customer
    """,
)
def fn_string(spark, sf_dir):
    """String family: substr/upper/lower/trim/concat/length/regexp/like."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
        F.regexp_extract("c_name", r"Customer#(\d+)", 1)
        .cast("long")
        .alias("name_num"),
        F.when(F.col("c_name").like("%42"), 1).otherwise(0).alias("ends_42"),
    )


@register(
    "fn_date",
    tags=("function",),
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           date_trunc('month', o_orderdate) AS order_month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER)
               AS days_to_2002,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    """Date/time family: year/month/day, date_trunc, datediff, interval
    arithmetic, epoch seconds."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.datediff(
            F.lit("2002-01-01").cast("timestamp_ntz"), F.col("o_orderdate")
        ).alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.unix_timestamp(
            F.col("o_orderdate").cast("timestamp")
        ).alias("order_epoch"),
    )


@register(
    "fn_math",
    tags=("function",),
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_r1,
           abs(p_retailprice - 950) AS price_dev,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(ln(p_retailprice), 6) AS price_ln,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(pow(p_size, 2), 6) AS size_sq,
           p_size % 7 AS size_mod7,
           CAST(sign(p_retailprice - 950) AS INTEGER) AS dev_sign
    FROM part
    """,
)
def fn_math(spark, sf_dir):
    """Math family: round/abs/ceil/floor/ln/sqrt/pow/mod/sign."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_retailprice") - 950).alias("price_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.pow("p_size", F.lit(2)), 6).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.signum(F.col("p_retailprice") - 950).cast("int").alias("dev_sign"),
    )


@register(
    "fn_array",
    tags=("function",),
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           string_split(text, ' ')[1] AS first_word,
           array_to_string(list_sort(string_split(text, ' ')), '|') AS words_sorted,
           CAST(list_contains(string_split(text, ' '), 'data') AS INTEGER) AS has_data,
           array_to_string(list_transform(string_split(text, ' '), w -> upper(w)), '|')
               AS words_upper,
           len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS n_long_words
    FROM documents
    """,
)
def fn_array(spark, sf_dir):
    """Array family incl. higher-order transform/filter (SURVEY §2.B).

    String arrays (not float) so HOF results are bit-exact across engines;
    the float higher-order dot product lives in sim_cosine_exact (§2.C).
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_join(F.array_sort(words), "|").alias("words_sorted"),
        F.array_contains(words, "data").cast("int").alias("has_data"),
        F.array_join(
            F.transform(words, lambda w: F.upper(w)), "|"
        ).alias("words_upper"),
        F.size(F.filter(words, lambda w: F.length(w) > 4))
        .cast("long")
        .alias("n_long_words"),
    )


@register(
    "fn_map",
    tags=("function", "json"),
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_value,
           CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END
               AS missing_is_null
    FROM events
    """,
)
def fn_map(spark, sf_dir):
    """Map family: JSON string → MapType, map_keys, element_at, missing-key
    null semantics (SURVEY §2.B fn_map)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.when(F.element_at(m, "missing").isNull(), 1).otherwise(0).alias(
            "missing_is_null"
        ),
    )


@register(
    "fn_json",
    tags=("function", "json"),
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           CAST(json_valid(props) AS INTEGER) AS is_valid
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    """JSON family: get_json_object / typed extraction / validity."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        (F.get_json_object("props", "$.k").cast("int") * 2).alias("k_doubled"),
        F.when(
            F.from_json("props", "k INT").isNotNull(), 1
        ).otherwise(0).alias("is_valid"),
    )
