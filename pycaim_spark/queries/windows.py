"""Window-function operators (SURVEY.md §2.B Window functions).

Window aggs shuffle once on the partition key and sort within partitions;
at 100 TB the partition key choice (user_id, custkey) controls skew — AQE
handles moderate skew, heavy hitters need salting upstream.

Running floating sums use the exact-decimal policy: the window ORDER BY is
total (unique tie-break column), so both engines accumulate identical
operand sequences.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pycaim_spark.catalog import load_table
from pycaim_spark.functions.exact import DEC
from pycaim_spark.registry import register


@register(
    "win_ranking",
    tags=("window",),
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_ranking(spark, sf_dir):
    """row_number/rank/dense_rank/ntile (SURVEY §2.B win_ranking).

    Unique c_custkey tie-break makes every ranking deterministic.
    Scale note: the low-cardinality partition key is the operator's
    demonstration semantics; when a partition outgrows one task, apply
    the two-level sharded scan in pipeline_ops.shuffle_epoch /
    sample_stratified (range shards + broadcast offsets).
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    tags=("window",),
    oracle="""
    SELECT event_id,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark, sf_dir):
    """lag/lead over an event-time window (SURVEY §2.B win_lag_lead).

    Also the primitive behind CAIM candidate midpoints (§2.A).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "win_running",
    tags=("window",),
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running(spark, sf_dir):
    """Running sum, ROWS UNBOUNDED PRECEDING → CURRENT ROW (SURVEY §2.B)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


@register(
    "win_range_frame",
    tags=("window",),
    oracle="""
    SELECT c_custkey,
           COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
           AS peers_within_100
    FROM customer
    """,
)
def win_range_frame(spark, sf_dir):
    """RANGE frame over a numeric ordering (SURVEY §2.B win_range_frame):
    count of same-segment customers within 100 balance units below."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal "
            "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)"
        ).alias("peers_within_100"),
    )


@register(
    "win_first_last",
    tags=("window",),
    oracle="""
    SELECT event_id,
           FIRST_VALUE(value) OVER w AS first_value_of_user,
           LAST_VALUE(value) OVER w AS last_value_of_user
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark, sf_dir):
    """first_value/last_value with an explicit full frame (SURVEY §2.B).

    The UNBOUNDED FOLLOWING frame is load-bearing: the default frame ends
    at CURRENT ROW, which silently turns last_value into "current value".
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        F.first("value").over(w).alias("first_value_of_user"),
        F.last("value").over(w).alias("last_value_of_user"),
    )


@register(
    "topk_per_group",
    tags=("window", "flagship"),
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-3 orders per customer (SURVEY §2.B topk_per_group; BASELINE.md
    headline). Ranking window + filter — one shuffle, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
