"""Aggregate semantics beyond the oracle hash: approx-distinct accuracy."""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.registry import REGISTRY, _ensure_loaded
from pycaim_spark.catalog import load_table

_ensure_loaded()


def test_approx_distinct_within_5pct_of_exact(spark, sf_dir):
    approx = {
        r.l_returnflag: r.approx_parts
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.exact_parts
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("exact_parts"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] <= 0.05, (
            f"{flag}: approx {est} vs exact {exact[flag]}"
        )
