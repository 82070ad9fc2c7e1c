"""UDF / UDAF / UDTF surface (SURVEY.md §2.B).

Every variant is deterministic pure arithmetic, so each has an exact SQL
mirror as its oracle — the point of these rows is exercising the four
Python execution paths (row UDF, Arrow scalar, Arrow grouped-agg, Arrow
grouped-map / mapInPandas, UDTF), not novel semantics.

Scale notes: the row-at-a-time Python UDF (udf_python) exists for surface
completeness and is the documented SLOW path (~10-100× vs Arrow); every
other entry is Arrow-batched. None of these belong in a hot path that a
built-in expression can serve — see the built-in twins in the oracles.

All functions here ship by value (workers cannot import pycaim_spark).
"""

from __future__ import annotations

import sys as _sys

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import DoubleType, StringType

try:
    from pyspark import cloudpickle as _cloudpickle
except ImportError:  # pragma: no cover
    import cloudpickle as _cloudpickle

from pycaim_spark.catalog import load_table
from pycaim_spark.registry import register


@register(
    "udf_python",
    tags=("udf",),
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS price_tier
    FROM orders
    """,
)
def udf_python(spark, sf_dir):
    """Row-at-a-time scalar Python UDF (SURVEY §2.B udf_python) — the slow
    path, kept for API surface; the oracle IS the built-in CASE twin."""

    def tier(price: float) -> str:
        if price >= 300000:
            return "large"
        if price >= 100000:
            return "medium"
        return "small"

    tier_udf = F.udf(tier, StringType())
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", tier_udf("o_totalprice").alias("price_tier"))


@register(
    "udf_pandas_scalar",
    tags=("udf",),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Arrow-batched scalar pandas UDF (SURVEY §2.B udf_pandas_scalar):
    vectorized per-row arithmetic, bit-identical to the SQL expression."""

    @F.pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return (price * (1 - discount)).round(6)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "udaf_pandas_grouped",
    tags=("udf",),
    oracle="""
    SELECT c_mktsegment, round(MAX(c_acctbal) - MIN(c_acctbal), 6) AS bal_range
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def udaf_pandas_grouped(spark, sf_dir):
    """Grouped-agg pandas UDF (SURVEY §2.B udaf_pandas_grouped): custom
    aggregate (balance range) over Arrow group batches; max−min is
    order-independent so it mirrors exactly."""

    @F.pandas_udf("double")
    def bal_range(bal: pd.Series) -> float:
        return round(float(bal.max() - bal.min()), 6)

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(bal_range("c_acctbal").alias("bal_range"))


@register(
    "udf_grouped_map",
    tags=("udf",),
    oracle="""
    SELECT c_custkey,
           round(c_acctbal - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment), 6)
               AS bal_above_min
    FROM customer
    """,
)
def udf_grouped_map(spark, sf_dir):
    """Grouped-map applyInPandas (SURVEY §2.B udf_grouped_map) — the same
    execution path the CAIM estimator's per-feature fit uses; here a
    per-group normalization with a window-SQL mirror."""

    def above_min(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "bal_above_min": (pdf["c_acctbal"] - pdf["c_acctbal"].min()).round(6),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        above_min, "c_custkey long, bal_above_min double"
    )


@register(
    "udf_map_partitions",
    tags=("udf",),
    oracle="""
    SELECT p_partkey, p_name, p_retailprice * 1.1 AS marked_up
    FROM part
    WHERE p_size > 25
    """,
)
def udf_map_partitions(spark, sf_dir):
    """mapInPandas over record-batch iterators (SURVEY §2.B
    udf_map_partitions): streaming filter+project per partition, constant
    memory — the multimodal decode plumbing shape, with an exact SQL twin."""

    def markup(batches):
        for pdf in batches:
            out = pdf[pdf["p_size"] > 25]
            yield pd.DataFrame(
                {
                    "p_partkey": out["p_partkey"],
                    "p_name": out["p_name"],
                    "marked_up": out["p_retailprice"] * 1.1,
                }
            )

    p = load_table(spark, sf_dir, "part")
    return p.mapInPandas(markup, "p_partkey long, p_name string, marked_up double")


@register(
    "udtf_python",
    tags=("udf",),
    oracle="""
    SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS part
    FROM orders
    """,
)
def udtf_python(spark, sf_dir):
    """Python UDTF (SURVEY §2.B udtf_python, Spark ≥3.5): one input row →
    multiple output rows, mirrored by SQL unnest."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="part: string")
    class SplitPriority:
        def eval(self, priority: str):
            for part in priority.split("-"):
                yield (part,)

    o = load_table(spark, sf_dir, "orders")
    return o.lateralJoin(
        SplitPriority(F.col("o_orderpriority").outer())
    ).select("o_orderkey", "part")


_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
