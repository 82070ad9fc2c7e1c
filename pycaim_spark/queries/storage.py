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
    "join_dpp",
    tags=("join", "storage"),
    oracle="""
    SELECT 'finished' AS label, COUNT(*) AS n
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def join_dpp(spark, sf_dir):
    """Dynamic partition pruning: a fact table partitioned on the join key,
    joined to a dim filtered on a NON-partition attribute — the partitions
    to read are only known at runtime, after the dim side is evaluated.
    Catalyst injects the dim's join keys into the fact scan as a
    ``dynamicpruningexpression`` partition filter (reusing the broadcast,
    so the dim is evaluated once), and the scan touches ONE status
    directory instead of all of them. At 100 TB this is the difference
    between scanning a full fact table and scanning one date/status slice
    when the predicate lives on the dim — the runtime complement of static
    partition pruning (sink_partitioned). The plan assertion lives in
    tests/test_storage.py; the oracle checks the end result against the
    unpartitioned source.
    """
    part = _scratch("dpp_orders")
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(part)
    fact = spark.read.parquet(part)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status string, label string",
    ).filter(F.col("label") == "finished")
    return (
        fact.join(dim, fact.o_orderstatus == dim.status)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "sink_compact",
    tags=("sink", "storage"),
    rows_only_reason="sink + rewrite: compaction is a file-layout effect; "
    "row equality across the rewrite and the file-count collapse are "
    "asserted in tests/test_storage.py",
)
def sink_compact(spark, sf_dir):
    """Small-file compaction: rewrite a fragmented dataset into few
    right-sized files. Streaming ingest and over-parallel writers leave
    thousands of KB-scale files; at 100 TB the resulting per-file open/
    footer overhead dominates scan time and floods the driver with splits.
    The compactor is a plain read → ``repartition(target)`` → rewrite:
    target = ceil(bytes / 128 MiB) keeps each output at the cluster-default
    split size, so one task reads one file afterwards. The fragmented
    write here fans the orders table into 64 shards to create the
    pathology on purpose; the returned frame re-reads the compacted copy
    (proving it stays queryable) and the test asserts row equality plus
    the 64 → few file collapse.
    """
    frag, out = _scratch("compact_frag"), _scratch("compact_out")
    o = load_table(spark, sf_dir, "orders")
    o.repartition(64).write.mode("overwrite").parquet(frag)
    fragmented = spark.read.parquet(frag)
    total_bytes = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    target = max(1, -(-total_bytes // (128 << 20)))  # ceil div
    fragmented.repartition(target).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


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
