"""Core relational operators: scans, projections, filters, sorts, limits,
set operations, sources and sinks (SURVEY.md §2.B, first four blocks).

Everything here compiles to stock Catalyst operators; the value of each
query is that (a) it pins the exact semantics against the DuckDB oracle and
(b) its plan shape is asserted in tests (predicate pushdown, column pruning,
TakeOrderedAndProject).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.registry import register

# Scratch dir for sink/source round-trip queries (inside the repo; the
# environment forbids writes elsewhere). Recreated per call — cheap at test
# scale, and each write is a fresh deterministic snapshot.
_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")
_SCRATCH = os.environ.get("PYCAIM_SCRATCH", _SCRATCH)


def _scratch(sub: str) -> str:
    path = os.path.join(_SCRATCH, sub)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


# --------------------------------------------------------------------------
# Scans
# --------------------------------------------------------------------------


@register(
    "scan_parquet",
    tags=("scan",),
    oracle="SELECT * FROM nation",
)
def scan_parquet(spark, sf_dir):
    """Full parquet scan, schema passthrough (SURVEY §2.B scan_parquet)."""
    return load_table(spark, sf_dir, "nation")


@register(
    "scan_pruned",
    tags=("scan",),
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 5
    """,
)
def scan_pruned(spark, sf_dir):
    """Projection + predicate both pushed to the parquet scan.

    At 100 TB this is the difference between reading 3 columns of a few
    row groups and reading everything: tests assert the plan shows
    PushedFilters + a 3-column ReadSchema.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 5).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "source_json_col",
    tags=("scan", "json"),
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def source_json_col(spark, sf_dir):
    """Parse a JSON string column into typed fields (SURVEY §2.B)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


@register(
    "sink_parquet",
    tags=("sink",),
    rows_only_reason="sink: writes files; correctness = round-trip re-read, "
    "asserted in tests/test_relational.py",
)
def sink_parquet(spark, sf_dir):
    """Write a result to parquet and read it back (SURVEY §2.B sink_parquet)."""
    out = _scratch("sink_parquet")
    li = load_table(spark, sf_dir, "lineitem")
    summary = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt"))
    summary.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@register(
    "source_csv",
    tags=("scan",),
    rows_only_reason="no CSV fixture exists; correctness = parquet→csv→read "
    "round-trip equality, asserted in tests/test_relational.py",
)
def source_csv(spark, sf_dir):
    """CSV source: documents table round-tripped through CSV with schema."""
    out = _scratch("source_csv")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.option("header", True).schema(docs.schema).csv(out)


@register(
    "source_csv_malformed",
    tags=("scan",),
    rows_only_reason="ingest-robustness surface: corrupt lines are planted "
    "into the CSV copy at write time; the exact quarantine/parse split is "
    "asserted in tests/test_relational.py",
)
def source_csv_malformed(spark, sf_dir):
    """PERMISSIVE CSV ingest with corrupt-record quarantine — what a crawl
    ingest actually faces: rows with the wrong column count, unparseable
    numerics, bare garbage. PERMISSIVE mode (the default) parses what it
    can, nulls what it can't, and lands each offending raw line in
    ``_corrupt_record`` instead of failing the 100 TB job (FAILFAST) or
    silently dropping lines (DROPMALFORMED). The returned frame counts
    clean vs quarantined rows per source so the quarantine is observable —
    the ingest-side analogue of the dedup guard's surfaced skip metric.

    The malformed lines are planted deterministically into the CSV copy of
    the events table (bad numeric, truncated row, garbage line) so the
    operator exercises real parser failures, not a happy path.
    """
    out = _scratch("source_csv_malformed")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.coalesce(1).write.mode("overwrite").option("header", False).csv(out)
    # Plant malformed lines as an extra file in the directory (appending to
    # a Spark-written part file breaks its .crc sidecar checksum); the
    # *read* below is the operator under test, the write is fixture setup.
    bad = "not_an_id,42,click,1.5\n99999999,77,purchase\ngarbage line\n"
    with open(os.path.join(out, "planted_malformed.csv"), "w") as fh:
        fh.write(bad)
    schema = (
        "event_id long, user_id long, event_type string, value double, "
        "_corrupt_record string"
    )
    # NB SPARK-21610: a query referencing ONLY _corrupt_record is
    # disallowed; this one always projects event_type alongside it.
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    # The report references EVERY schema column: CSV column pruning
    # (spark.sql.csv.parser.columnPruning.enabled, default on) makes the
    # parser skip unreferenced columns, and a parse failure in a skipped
    # column would silently not quarantine.
    return parsed.select(
        F.col("event_type"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("value"),
        F.when(F.col("_corrupt_record").isNull(), 0).otherwise(1).alias("quarantined"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("quarantined").cast("bigint").alias("n_quarantined"),
        F.count_distinct("user_id").alias("n_users"),
        F.min("event_id").alias("min_event_id"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "source_json",
    tags=("scan",),
    rows_only_reason="no JSON fixture exists; correctness = parquet→jsonl→read "
    "round-trip equality, asserted in tests/test_relational.py",
)
def source_json(spark, sf_dir):
    """JSON-lines source: documents table round-tripped through JSONL."""
    out = _scratch("source_json")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(out)
    return spark.read.schema(docs.schema).json(out)


# --------------------------------------------------------------------------
# Projections / filters
# --------------------------------------------------------------------------


@register(
    "proj_compute",
    tags=("project",),
    oracle="""
    SELECT p_partkey,
           p_retailprice * p_size AS stock_value,
           p_size + 1 AS size_next
    FROM part
    """,
)
def proj_compute(spark, sf_dir):
    """Projection with computed, aliased columns (SURVEY §2.B proj_compute).

    Per-row double arithmetic is order-independent, so no decimal policy
    needed here (unlike aggregates).
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        (F.col("p_retailprice") * F.col("p_size")).alias("stock_value"),
        (F.col("p_size") + F.lit(1)).alias("size_next"),
    )


@register(
    "filter_compound",
    tags=("filter",),
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE (o_totalprice > 200000 AND o_orderstatus = 'F')
       OR (o_totalprice < 5000 AND NOT o_orderstatus = 'F')
    """,
)
def filter_compound(spark, sf_dir):
    """AND/OR/NOT compound predicates (SURVEY §2.B filter_compound)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_totalprice") > 200000) & (F.col("o_orderstatus") == "F"))
        | ((F.col("o_totalprice") < 5000) & ~(F.col("o_orderstatus") == "F"))
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


@register(
    "filter_in_between_like",
    tags=("filter",),
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size BETWEEN 5 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4', 'Brand#5',
                      'Brand#10', 'Brand#11', 'Brand#12')
      AND p_name LIKE '%widget%'
      AND p_type IS NOT NULL
    """,
)
def filter_in_between_like(spark, sf_dir):
    """IN / BETWEEN / LIKE / IS NULL predicates (SURVEY §2.B)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(5, 30)
        & F.col("p_brand").isin(
            "Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5",
            "Brand#10", "Brand#11", "Brand#12",
        )
        & F.col("p_name").like("%widget%")
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "proj_case",
    tags=("project",),
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debit'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_class
    FROM customer
    """,
)
def proj_case(spark, sf_dir):
    """CASE WHEN projection (SURVEY §2.B proj_case)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debit")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_class"),
    )


# --------------------------------------------------------------------------
# Sorts / limits
# --------------------------------------------------------------------------


@register(
    "sort_multi",
    tags=("sort",),
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey
    """,
)
def sort_multi(spark, sf_dir):
    """Multi-key sort asc/desc with null placement (SURVEY §2.B sort_multi).

    The oracle hash is order-insensitive, so sortedness itself is asserted
    in tests/test_relational.py via collected row order.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey"),
    )


@register(
    "limit_topk",
    tags=("sort",),
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topk(spark, sf_dir):
    """Global ORDER BY + LIMIT → TakeOrderedAndProject (SURVEY §2.B).

    o_orderkey tie-break makes the top-k deterministic. At scale this
    never materializes the full sort: each partition keeps a k-heap.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set operations (distinct variants match SQL semantics; ALL variants kept)
# --------------------------------------------------------------------------


@register(
    "set_union_all",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_union_all(spark, sf_dir):
    """UNION ALL (bag union, no shuffle) — SURVEY §2.B set_union_all."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c.unionByName(s)


@register(
    "set_union",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    UNION
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_union(spark, sf_dir):
    """UNION DISTINCT — SURVEY §2.B set_union."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct) — SURVEY §2.B set_intersect."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c.intersect(s)


@register(
    "set_except",
    tags=("setop",),
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT user_id AS k FROM events
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct) — SURVEY §2.B set_except.

    customer keys minus event user ids: non-empty at every scale factor
    (customer cardinality is 10× the event-user domain), so the oracle
    check stays strong.
    """
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return c.subtract(ev)


@register(
    "set_except_all",
    tags=("setop",),
    oracle="""
    SELECT o_custkey AS ckey FROM orders
    EXCEPT ALL
    SELECT c_custkey AS ckey FROM customer
    """,
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL (bag difference) — multiplicity-preserving variant."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ckey"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("ckey"))
    return o.exceptAll(c)
