"""Remaining surface rows: bitwise functions, deterministic mode,
positional explode, seeded sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.registry import register


@register(
    "fn_bitwise",
    tags=("function",),
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 16 AS with_flag,
           xor(event_id, 85) AS xored,
           event_id << 2 AS shifted_l,
           event_id >> 1 AS shifted_r,
           CAST(bit_count(CAST(event_id AS BIGINT)) AS INTEGER) AS popcount
    FROM events
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise function family: and/or/xor/shifts/popcount."""
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(16)).alias("with_flag"),
        eid.bitwiseXOR(F.lit(85)).alias("xored"),
        F.shiftleft(eid, 2).alias("shifted_l"),
        F.shiftright(eid, 1).alias("shifted_r"),
        F.bit_count(eid).alias("popcount"),
    )


@register(
    "agg_mode",
    tags=("agg",),
    oracle="""
    SELECT user_id,
           list_max(list_transform(
               list(DISTINCT event_type),
               t -> (len(list_filter(list(event_type), x -> x = t)), t)
           ))[2] AS top_type,
           list_max(list_transform(
               list(DISTINCT event_type),
               t -> (len(list_filter(list(event_type), x -> x = t)), t)
           ))[1] AS top_cnt
    FROM events
    GROUP BY user_id
    """,
)
def agg_mode(spark, sf_dir):
    """Deterministic mode: the most frequent event_type per user, ties
    broken toward the lexicographically larger value via (count, value)
    struct max — native mode() tie-breaks are engine-specific, this
    formulation is not."""
    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = F.max(F.struct(F.col("cnt"), F.col("event_type"))).alias("top")
    return (
        counted.groupBy("user_id")
        .agg(top)
        .select(
            "user_id",
            F.col("top.event_type").alias("top_type"),
            F.col("top.cnt").alias("top_cnt"),
        )
    )


@register(
    "fn_explode_pos",
    tags=("function",),
    oracle="""
    SELECT doc_id, t.g - 1 AS pos, ws[t.g] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         LATERAL (SELECT unnest(generate_series(1, len(ws))) AS g) t
    """,
)
def fn_explode_pos(spark, sf_dir):
    """posexplode: array → (position, element) rows (0-based like Spark)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )


@register(
    "sample_seeded",
    tags=("scan",),
    rows_only_reason="TABLESAMPLE row selection is engine-specific even "
    "when seeded; the fraction bound is asserted in tests/test_misc.py",
)
def sample_seeded(spark, sf_dir):
    """Seeded Bernoulli sampling — deterministic across runs of THIS engine
    (same seed → same rows), but not across engines (rows-only)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
