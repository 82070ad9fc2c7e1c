"""Aggregation operators (SURVEY.md §2.B Aggregations).

All floating aggregates follow the exact-decimal policy
(:mod:`pycaim_spark.functions.exact`).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.functions.exact import DEC2, davg, dec2, dmul_sum, dsum
from pycaim_spark.registry import register

# --------------------------------------------------------------------------
# agg_hash — TPC-H Q1-style pricing summary (the flagship query).
# Plan shape at scale: parquet scan (predicate pushed to row groups) →
# partial HashAggregate (map-side combine) → shuffle on the 6-value group
# key → final HashAggregate → sort. One shuffle, tiny output: optimal.
# --------------------------------------------------------------------------

_Q1_CUTOFF = "2001-09-02 00:00:00"


@register(
    "agg_hash",
    tags=("agg", "flagship"),
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))
                 * CAST(1 + CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark, sf_dir):
    """TPC-H Q1 pricing summary: scan→filter→groupBy→7 aggregates→sort.

    SURVEY.md §2.B ``agg_hash``. HashAggregate partial+final with one
    shuffle; the date predicate reaches the parquet scan (PushedFilters).
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = dec2("l_extendedprice")
    disc = (F.lit(1) - dec2("l_discount")).cast(DEC2)
    tax = (F.lit(1) + dec2("l_tax")).cast(DEC2)
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dmul_sum(price * disc, "sum_disc_price"),
            dmul_sum(price * disc * tax, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
