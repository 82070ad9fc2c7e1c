"""Table catalog: load the driver's TPC-H-ish parquet fixtures.

Fixture schemas: FIXTURES.md (read from parquet footers). Tables live at
``{sf_dir}/{name}.parquet`` (TESTDATA.md:14-15).

Normalization applied on load (and mirrored in every oracle SQL):

- ``events.ts`` is physically INT64 TIMESTAMP(NANOS); Spark reads it as a
  long (``nanosAsLong``) and we convert with integer division ``ts DIV 1000``
  → ``timestamp_micros`` → TIMESTAMP_NTZ. Integer division is load-bearing:
  epoch-nanos (~1.7e18) exceed double's 2^53 integer range, so a float
  divide would corrupt microseconds. The DuckDB oracle side is
  ``CAST(ts AS TIMESTAMP)`` (ns → µs truncation, identical semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from pycaim_spark.session import configure_session

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Last cached diamond intermediate per call site — see :func:`fresh_cache`.
_FRESH_CACHE: dict[str, DataFrame] = {}


def fresh_cache(key: str, df: DataFrame) -> DataFrame:
    """Bounded-lifetime ``cache()`` for tiny diamond intermediates
    (VERDICT r18 #7): Spark's CacheManager keys on the canonicalized plan,
    so a plain ``.cache()`` inside a query function SURVIVES across
    invocations — under the bench's warm-up + median-of-3 the timed runs
    would re-read the InMemoryRelation instead of recomputing, silently
    measuring the CacheManager. Here each call first unpersists the
    previous invocation's entry (same canonicalized plan → same cache
    slot), so every invocation recomputes from the parquet inputs while
    the diamond still closes WITHIN the invocation (the reason these
    caches exist: Spark's only common-subplan reuse is ReusedExchange,
    and a shuffle-free diamond executes its shared subtree twice)."""
    prev = _FRESH_CACHE.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    _FRESH_CACHE[key] = df.cache()
    return _FRESH_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying type normalization."""
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 epoch-nanos -> µs-precision naive timestamp (see module doc).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return df


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata only — no Spark job, no data
    scan. Used by scale guards that must stay lazy at plan-build time
    (e.g. dedup_embedding's all-pairs cap). Handles both a single file and
    a directory of part files."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables as a dict."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
