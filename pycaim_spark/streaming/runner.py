"""Streaming execution helpers: file-source replay of the events fixture and
bounded (availableNow) micro-batch runs into memory sinks.

The events table is the batch stand-in for the stream (FIXTURES.md): a
parquet file-source stream replays it through the SAME logical plans the
batch twins use, which is what makes the twin-equality tests meaningful —
identical semantics minus the watermark (SURVEY.md §3.3).
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pycaim_spark.catalog import load_table
from pycaim_spark.session import configure_session

_SCRATCH = os.environ.get(
    "PYCAIM_SCRATCH",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch"),
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream with event-time ``ts``.

    The fixture stores ns-precision timestamps (read as long via
    ``nanosAsLong``); watermarks/windows need TimestampType, so ``ts`` is
    converted exactly like the batch catalog (integer ``DIV`` — see
    catalog.py) but kept timezone-aware (session is pinned UTC).
    """
    configure_session(spark)
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        # maxFilesPerTrigger keeps the replay micro-batched even with one
        # file; at scale the source is a directory of arriving files.
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def run_available_now(result: DataFrame, output_mode: str = "append") -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow trigger) into a
    memory sink; return the materialized result as a batch DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    checkpoint = os.path.join(_SCRATCH, "checkpoints", name)
    query = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return result.sparkSession.table(name)


def batch_events_with_tz_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events with ``ts`` as TimestampType (UTC) — the exact input
    type the streaming plans see, for twin-equality comparisons."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))
