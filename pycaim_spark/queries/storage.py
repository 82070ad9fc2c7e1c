"""Storage-layout operators: partitioned writes (partition pruning / DPP)
and bucketed tables (shuffle-free co-located joins) — the two physical
layout levers that matter most at 100 TB (SURVEY.md §7.9).

Both are rows-only (sinks create files; layout effects are plan
properties) with plan-shape assertions in tests/test_storage.py.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.queries.relational import _scratch
from pycaim_spark.registry import register


@register(
    "sink_partitioned",
    tags=("sink", "storage"),
    rows_only_reason="sink + partition-pruned re-read; pruning is asserted "
    "on the plan (PartitionFilters) in tests/test_storage.py",
)
def sink_partitioned(spark, sf_dir):
    """Hive-style partitioned parquet write, then a partition-pruned read.

    At 100 TB, partitioning on a low-cardinality predicate column means a
    filtered scan touches only matching directories — the plan shows the
    predicate under PartitionFilters instead of PushedFilters, and
    dynamic partition pruning (DPP) extends this to join keys at runtime.
    """
    out = _scratch("sink_partitioned")
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


@register(
    "sink_orc",
    tags=("sink", "storage"),
    rows_only_reason="sink + re-read through a second columnar format; "
    "round-trip equality vs the parquet source is asserted in "
    "tests/test_storage.py",
)
def sink_orc(spark, sf_dir):
    """ORC write + filtered re-read — the second columnar format Spark
    ships natively (vectorized reader + predicate pushdown, same as
    parquet). Exercises that the engine is not parquet-bound: the same
    declarative plan runs over either format, and the ORC scan still
    shows PushedFilters."""
    out = _scratch("sink_orc")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").orc(out)
    return spark.read.orc(out).filter(F.col("o_orderpriority") == "1-URGENT")


@register(
    "join_bucketed",
    tags=("join", "storage"),
    rows_only_reason="bucketed-table join; the shuffle-free plan (no "
    "Exchange above either scan) is asserted in tests/test_storage.py",
)
def join_bucketed(spark, sf_dir):
    """Co-located join of two tables bucketed on the join key: both sides
    are written with bucketBy(8, orderkey), so the sort-merge join reads
    matching buckets directly — ZERO Exchange in the plan. At 100 TB this
    converts every recurring fact-fact join on the bucket key from a full
    shuffle into a local merge."""
    out = _scratch("bucketed")
    os.makedirs(out, exist_ok=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for name, df, key in (
        ("li_bucketed", li, "l_orderkey"),
        ("o_bucketed", o, "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(out, name))
            .saveAsTable(name)
        )
    lib = spark.table("li_bucketed")
    ob = spark.table("o_bucketed")
    # MERGE hint: at fixture scale Spark would broadcast the small side
    # (hiding the layout effect); at 100 TB both sides exceed the
    # broadcast threshold and SMJ-over-buckets is what the planner picks
    # on its own.
    return (
        lib.join(ob.hint("MERGE"), lib.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("total_qty"),
        )
    )
