"""Aggregation operators (SURVEY.md §2.B Aggregations).

All floating aggregates follow the exact-decimal policy
(:mod:`pycaim_spark.functions.exact`).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.functions.exact import (
    DEC,
    cents,
    favg,
    fsum,
    fsum_split,
)
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

    Aggregates run on the FIXED-POINT fast path (functions/exact.py):
    integer-cents long sums (cents = floor(x·100+0.5), never per-row
    BigDecimal — see cents()) with hi/lo splitting where a product sum
    could overflow, recombined exactly in decimal on the |groups| output
    rows. Values are bit-identical to the decimal spelling the DuckDB
    oracle uses (asserted across all sf fixtures in
    tests/test_aggregates.py). sf10 history: 9.6 s decimal → 2.3 s
    fixed-point (SCALING_r9.json `agg_hash_fixedpoint`) → 1.28 s after
    the r11 floor-cents fix (ISOLATE_r11.json `q1_cents_paired_series`),
    where the committed decomposition (`q1_decomposition`) shows the
    residual vs DuckDB is the row-pipeline scan+group floor — a
    count-only grouping skeleton alone costs 2.35× DuckDB's full query —
    not the exact-decimal contract (BASELINE.md §Scope note agg_hash).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q_c = cents("l_quantity")               # ≤ 5e3/row → direct long sum
    ep_c = cents("l_extendedprice")         # ≤ ~1e7/row → direct long sum
    d_c = cents("l_discount")               # 0..10
    t_c = cents("l_tax")                    # 0..8
    disc_price = ep_c * (F.lit(100).cast("long") - d_c)       # scale 1e4
    charge = disc_price * (F.lit(100).cast("long") + t_c)     # scale 1e6
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fsum(q_c, 2, "sum_qty"),
            fsum(ep_c, 2, "sum_base_price"),
            fsum(disc_price, 4, "sum_disc_price"),
            # per-row charge ≤ ~1.2e11: Σ over ≥5e7 rows nears 2^63, so
            # hi/lo split (see fsum_split)
            fsum_split(charge, 6, "sum_charge"),
            favg(q_c, 2, "avg_qty"),
            favg(ep_c, 2, "avg_price"),
            favg(d_c, 2, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    """Exact COUNT(DISTINCT) — expand + two-phase aggregate (SURVEY §2.B).

    Catalyst rewrites multi-distinct via Expand; each distinct column adds
    one shuffle-side dedup, which is the honest cost of exactness at scale
    (the approx variant below is the 100 TB default).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count_distinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "agg_approx_distinct",
    tags=("agg",),
    rows_only_reason="HLL++ sketch is approximate and implementation-specific; "
    "tests/test_aggregates.py asserts ±5% of exact per group",
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — SURVEY §2.B agg_approx_distinct.

    The mergeable-sketch path: one pass, constant memory per group, no
    expand — the right distinct-count at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "agg_grouping_sets",
    tags=("agg",),
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS via the Spark 4 DataFrame API (SURVEY §2.B).

    One Expand + one aggregate — not N separate scans unioned.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        fsum(cents("o_totalprice"), 2, "revenue"),
    )


@register(
    "agg_rollup",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (SURVEY §2.B agg_rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "agg_cube",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE: all grouping combinations (SURVEY §2.B agg_cube)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "agg_having",
    tags=("agg",),
    oracle="""
    SELECT o_custkey, COUNT(*) AS order_cnt
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 12
    """,
)
def agg_having(spark, sf_dir):
    """Post-aggregation filter (HAVING) — SURVEY §2.B agg_having."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .filter(F.col("order_cnt") > 12)
    )


@register(
    "agg_pivot",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           COALESCE("F", 0) AS F,
           COALESCE("O", 0) AS O
    FROM (PIVOT lineitem ON l_linestatus USING count(*) GROUP BY l_returnflag)
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot to wide format — the CAIM quanta-matrix shape (SURVEY §2.B).

    Pivot values are pinned explicitly (no discovery pass) and missing
    cells coalesced to 0 so both engines agree on absent combinations.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"]).count()
    return wide.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
    )


@register(
    "dedup_distinct",
    tags=("agg",),
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def dedup_distinct(spark, sf_dir):
    """SELECT DISTINCT rows (SURVEY §2.B dedup_distinct)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "agg_incremental_merge",
    tags=("agg", "pipeline"),
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_incremental_merge(spark, sf_dir):
    """Incremental aggregate maintenance: merge partial aggregate STATES
    instead of recomputing from raw rows — the pattern behind materialized-
    view refresh and the streaming foreachBatch sink. The table is split
    into a 'base' and a 'delta' slice (ship date boundary), each slice is
    aggregated independently into mergeable state (count, decimal sum —
    note NOT avg: averages don't merge, (sum, count) pairs do), the states
    are merged with a full-outer join, and avg is derived at the end. The
    oracle aggregates the unsplit table directly — bit-equality proves the
    merge is exact, which is what lets a 100 TB pipeline refresh a daily
    rollup by touching one day of data. Decimal partial sums merge in
    decimal space (associative) and convert to double once at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    boundary = "1995-01-01"

    def slice_agg(df):
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("_s"),
        )

    base = slice_agg(li.filter(F.col("l_shipdate") < boundary))
    delta = slice_agg(li.filter(F.col("l_shipdate") >= boundary))
    merged = (
        base.alias("b")
        .join(delta.alias("d"), "l_returnflag", "full_outer")
        .select(
            "l_returnflag",
            (
                F.coalesce(F.col("b._n"), F.lit(0))
                + F.coalesce(F.col("d._n"), F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(F.col("b._s"), F.lit(0).cast(DEC))
                + F.coalesce(F.col("d._s"), F.lit(0).cast(DEC))
            ).alias("_s"),
        )
    )
    return merged.select(
        "l_returnflag",
        "n_rows",
        F.col("_s").cast("double").alias("sum_price"),
        (F.col("_s").cast("double") / F.col("n_rows")).alias("avg_price"),
    )


@register(
    "agg_histogram",
    tags=("agg",),
    oracle="""
    SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS INT) AS bucket,
           CAST(FLOOR(l_extendedprice / 5000.0) AS INT) * 5000.0 AS lo,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_price
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram of a numeric column — the distribution-profiling
    aggregate every engine exposes (width_bucket / histogram). Bucketing by
    arithmetic (floor(x / width)) keeps the semantics engine-neutral and the
    whole plan one map-side-combined hash aggregate: bucket count is
    data-independent, so the shuffle carries at most n_buckets rows per
    partition at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000.0).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            fsum(cents("l_extendedprice"), 2, "sum_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 5000.0).alias("lo"),
            "n_rows",
            "sum_price",
        )
    )


@register(
    "agg_collect",
    tags=("agg",),
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_collect(spark, sf_dir):
    """collect_set per group, order-normalized (SURVEY §2.B agg_collect).

    Array sorted then joined to a string so the comparison (and any
    downstream hash) is order-insensitive — collect order is
    partition-dependent by nature.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.array_join(
            F.array_sort(F.collect_set("c_nationkey")), ","
        ).alias("nations")
    )
