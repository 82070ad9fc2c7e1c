"""Streaming harness tests (SURVEY.md §5.4): every true-streaming operator's
availableNow replay must equal its batch twin on the same data (the fixture
replay is in-order, so watermarking drops nothing)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.registry import REGISTRY, _ensure_loaded
from pycaim_spark.catalog import load_table

_ensure_loaded()


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_source_stream_passthrough_equals_batch(spark, sf_dir):
    got = REGISTRY["source_stream"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert _rows(got, "event_id", "user_id", "event_type") == _rows(
        ev, "event_id", "user_id", "event_type"
    )


def test_watermark_agg_equals_batch_tumbling_up_to_watermark(spark, sf_dir):
    """Append mode emits a window only once the watermark passes its end —
    at end-of-stream the final watermark is max(ts) − 10 min, so windows
    still open at that point are (correctly) never emitted. The batch twin
    therefore excludes the unflushed tail; everything emitted must match
    exactly."""
    import datetime

    got = REGISTRY["stream_watermark_agg"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    final_watermark = max_ts - datetime.timedelta(minutes=10)
    twin = (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("window.end").cast("timestamp") <= F.lit(final_watermark))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
        )
    )
    got_rows = _rows(got, "window_start", "n_events")
    twin_rows = _rows(twin, "window_start", "n_events")
    assert got_rows == twin_rows
    assert len(got_rows) > 0


def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    got = REGISTRY["stream_dedup_watermark"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    twin = ev.select("user_id", "event_type").distinct()
    assert _rows(got, "user_id", "event_type") == _rows(twin, "user_id", "event_type")


def test_stream_stateful_counts_equal_batch_groupby(spark, sf_dir):
    got = REGISTRY["stream_stateful"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    twin = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    assert _rows(got, "user_id", "n_events") == _rows(twin, "user_id", "n_events")


def test_stream_sink_roundtrip_preserves_rows(spark, sf_dir):
    got = REGISTRY["stream_sink"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert _rows(got, "event_id", "user_id") == _rows(ev, "event_id", "user_id")


def test_session_window_spark_semantics_match_islands(spark, sf_dir):
    """Redundant with the oracle hash but pins the exact gap boundary:
    Spark merges while ts < prev_end (gap ≥ 30 min ⇒ new session)."""
    rows = REGISTRY["stream_session"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events_total = sum(r.n_events for r in rows)
    assert n_events_total == ev.count()  # partition of all events
