"""Mergeable-sketch aggregates — the 100 TB cardinality/quantile path.

At scale, exact COUNT(DISTINCT) expands rows and shuffles every distinct
value; exact percentiles sort whole partitions. The sketch versions keep a
few-KB summary per partition and merge associatively, so the shuffle moves
kilobytes regardless of input size — and sketches persist (binary column)
for later re-merge across days/tables without touching raw data.

Both are rows-only by necessity (sketch estimates are not SQL-reproducible
bit-for-bit in DuckDB); tests/test_misc.py bounds them against the exact
answers (HLL ±5 %, KLL/GK percentile within rank tolerance).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import fresh_cache, load_table
from pycaim_spark.registry import register


@register(
    "agg_hll_sketch",
    tags=("agg", "sketch"),
    rows_only_reason="Datasketches HLL binary sketches/estimates are not "
    "reproducible in DuckDB SQL; tests/test_misc.py asserts every estimate "
    "is within 5% of the exact distinct count and that the merged (union) "
    "sketch matches a global re-sketch",
)
def agg_hll_sketch(spark, sf_dir):
    """Mergeable HLL distinct-count: per-returnflag sketches of l_partkey
    via hll_sketch_agg, re-merged with hll_union_agg into a global
    estimate — the two-level (partial → merge) pattern that makes distinct
    counting O(sketch) instead of O(distinct values) at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # fresh_cache(): per_flag is a DIAMOND (consumed by both the per-flag
    # estimates and the global re-merge) and Spark's only common-subplan
    # reuse is ReusedExchange — without materialization the corpus-sized
    # sketch aggregation ran TWICE (2 lineitem scans,
    # plans/r18/agg_hll_sketch_{before,after}.txt). The cached frame is
    # one row per returnflag (a few KB of sketches); the bounded-lifetime
    # wrapper (catalog.fresh_cache, r19) evicts the previous invocation's
    # entry so repeated runs recompute from parquet instead of silently
    # serving the CacheManager (VERDICT r18 #7).
    per_flag = fresh_cache(
        "agg_hll_sketch.per_flag",
        li.groupBy("l_returnflag").agg(
            F.hll_sketch_agg("l_partkey").alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
    ).select(F.lit("__all__").alias("l_returnflag"), "est",
             F.lit(None).cast("long").alias("n_rows"))
    per_flag_est = per_flag.select(
        "l_returnflag",
        F.hll_sketch_estimate("sketch").alias("est"),
        "n_rows",
    )
    return per_flag_est.unionByName(merged)


@register(
    "agg_approx_percentile",
    tags=("agg", "sketch"),
    rows_only_reason="approx_percentile merges Greenwald-Khanna summaries "
    "in partition order (not bit-reproducible across engines); "
    "tests/test_misc.py bounds each estimate against the exact percentile",
)
def agg_approx_percentile(spark, sf_dir):
    """Approximate percentiles per order status: one mergeable quantile
    summary per partition instead of a sort — the scale path next to the
    exact `percentile` used in agg_stats. Accuracy pinned at 1/10000
    relative rank error."""
    o = load_table(spark, sf_dir, "orders")
    qs = o.groupBy("o_orderstatus").agg(
        F.approx_percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
        ).alias("qs")
    )
    return qs.select(
        "o_orderstatus",
        F.col("qs")[0].alias("p50"),
        F.col("qs")[1].alias("p90"),
        F.col("qs")[2].alias("p99"),
    )
