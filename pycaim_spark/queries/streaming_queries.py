"""Streaming operators (SURVEY.md §2.B Streaming).

Tumbling/sliding/session windows are batch-capable in Spark — the batch
evaluation here shares the exact logical operator the streaming runtime
incrementalizes, so the DuckDB oracle checks the streaming semantics minus
watermarking. True streaming ops (watermark, stateful dedup, arbitrary
state, sinks) replay the events fixture through a file-source stream with
an availableNow trigger (rows-only; twin-equality asserted in
tests/test_streaming.py).

Timestamp note: window/session/watermark operators require TimestampType;
ts is cast from the catalog's µs TIMESTAMP_NTZ under the pinned UTC session
zone, and window bounds are cast back to TIMESTAMP_NTZ for oracle parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.registry import register


def _events_tz(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


@register(
    "stream_tumbling",
    tags=("streaming",),
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_tumbling(spark, sf_dir):
    """Tumbling 1-hour event-time window aggregation (SURVEY §2.B
    stream_tumbling) — identical operator in batch and streaming."""
    ev = _events_tz(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_sliding",
    tags=("streaming",),
    oracle="""
    SELECT ws AS window_start, COUNT(*) AS n_events
    FROM (
        SELECT unnest([
            time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)),
            time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE
        ]) AS ws
        FROM events
    )
    GROUP BY ws
    """,
)
def stream_sliding(spark, sf_dir):
    """Sliding 1-hour window, 30-minute slide (SURVEY §2.B stream_sliding):
    each event lands in exactly two windows; the oracle enumerates both
    epoch-aligned window starts per event."""
    ev = _events_tz(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
        )
    )


@register(
    "stream_session",
    tags=("streaming", "flagship"),
    oracle="""
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - LAG(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL 30 MINUTE
                         OR LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark, sf_dir):
    """30-minute-gap session windows per user (SURVEY §2.B stream_session;
    BASELINE.md headline).

    Spark's native session_window (batch-capable, incrementalized with
    state merge when streaming); the oracle is the classic gaps-and-islands
    SQL. New-session boundary: gap ≥ 30 min (Spark merges while
    ts < previous_end = prev_ts + gap).
    """
    ev = _events_tz(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
        )
    )


@register(
    "source_stream",
    tags=("streaming",),
    rows_only_reason="streaming source replay (file-source micro-batches); "
    "row passthrough equality vs batch asserted in tests/test_streaming.py",
)
def source_stream(spark, sf_dir):
    """File-source streaming read of the events fixture, materialized via
    availableNow into a memory sink (SURVEY §2.B source_stream)."""
    from pycaim_spark.streaming.runner import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return run_available_now(stream)


@register(
    "stream_watermark_agg",
    tags=("streaming",),
    rows_only_reason="watermark semantics exist only in streaming execution; "
    "twin-equality asserted in tests/test_streaming.py, and true late-data "
    "drops are exercised by an out-of-order multi-batch replay "
    "(test_out_of_order_replay_drops_exactly_the_late_rows)",
)
def stream_watermark_agg(spark, sf_dir):
    """Watermarked tumbling aggregation over the replayed stream
    (SURVEY §2.B stream_watermark_agg): 10-minute watermark bounds state;
    append mode emits only finalized windows. State partitions are sized
    from the source volume, not the core count (r19, VERDICT r18 #3 —
    `streaming.runner.stream_state_partitions` has the sizing rule)."""
    from pycaim_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
        stream_state_partitions,
    )

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
        )
    )
    return run_available_now(
        agg,
        output_mode="append",
        state_partitions=stream_state_partitions(spark, sf_dir),
    )


@register(
    "stream_dedup_watermark",
    tags=("streaming",),
    rows_only_reason="dropDuplicatesWithinWatermark is stateful-streaming "
    "only; equality vs batch distinct asserted in tests/test_streaming.py, "
    "plus out-of-order state-expiry semantics "
    "(test_out_of_order_dedup_reemits_after_state_expiry)",
)
def stream_dedup_watermark(spark, sf_dir):
    """Stateful streaming dedup bounded by a watermark (SURVEY §2.B
    stream_dedup_watermark): state for (user_id, event_type) keys expires
    once the watermark passes, keeping memory bounded forever. State
    partitions sized from source volume, not cores (VERDICT r18 #3)."""
    from pycaim_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
        stream_state_partitions,
    )

    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_available_now(
        deduped, state_partitions=stream_state_partitions(spark, sf_dir)
    )


@register(
    "stream_stateful",
    tags=("streaming",),
    rows_only_reason="arbitrary stateful processing (applyInPandasWithState) "
    "has no SQL twin; final counts vs batch groupBy asserted in "
    "tests/test_streaming.py",
)
def stream_stateful(spark, sf_dir):
    """Arbitrary stateful streaming: running per-user event counts via
    applyInPandasWithState (SURVEY §2.B stream_stateful). Update-mode rows
    carry the latest count per user; state is a single long per key."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pycaim_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
        stream_state_partitions,
    )

    def update_counts(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    stream = read_events_stream(spark, sf_dir).select("user_id", "event_id")
    result = stream.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    updates = run_available_now(
        result,
        output_mode="update",
        state_partitions=stream_state_partitions(spark, sf_dir),
    )
    # Latest update per user = final running count.
    latest = updates.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    return latest


@register(
    "stream_join_interval",
    tags=("streaming", "join"),
    oracle="""
    SELECT a.user_id AS user_id,
           a.event_id AS view_id,
           b.event_id AS buy_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
     AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP)
                                     + INTERVAL 30 MINUTE
    """,
)
def stream_join_interval(spark, sf_dir):
    """Stream-stream inner join with an event-time interval condition
    (SURVEY §2.B streaming family): views joined to same-user purchases
    within 30 minutes, both sides watermarked so join state is BOUNDED —
    a view older than watermark−30min can never match again and is
    evicted, which is what makes the join runnable forever at 100 TB/day.

    The replayed file-source stream has no late data, and inner-join
    matches emit as found (append mode), so the complete availableNow
    result equals the batch interval join exactly — hence the DuckDB
    oracle, a stronger check than twin-equality.
    """
    from pycaim_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
        stream_state_partitions,
    )

    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    buys = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = views.join(
        buys,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("b_ts") >= F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("user_id", "view_id", "buy_id")
    return run_available_now(
        joined, state_partitions=stream_state_partitions(spark, sf_dir)
    )


@register(
    "stream_foreach_batch",
    tags=("streaming", "sink"),
    rows_only_reason="foreachBatch merge-sink is streaming-execution-only; "
    "twin equality vs the batch aggregate, multi-batch accumulation, and "
    "re-delivery idempotence are asserted in tests/test_streaming.py",
)
def stream_foreach_batch(spark, sf_dir):
    """foreachBatch idempotent MERGE sink (the production pattern for
    sinks Spark has no native exactly-once writer for): each micro-batch
    upserts a per-user snapshot — event counts add, the latest event wins
    by (ts, event_id) — into a versioned parquet table keyed by batch id,
    so re-delivered batches skip instead of double-counting. Returns the
    final snapshot re-read from the sink.
    """
    import os
    import shutil

    from pycaim_spark.streaming.runner import (
        _SCRATCH,
        latest_upsert_snapshot,
        make_idempotent_upsert,
        read_events_stream,
    )

    # Fixed sink dir, cleared at start: repeated runs REUSE the location
    # instead of leaking a fresh uuid dir per run (checkpoint and data are
    # cleared together — a stale checkpoint over an empty sink would replay
    # nothing and report batches done).
    out = os.path.join(_SCRATCH, "febatch_sink")
    shutil.rmtree(out, ignore_errors=True)
    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    query = (
        stream.writeStream.foreachBatch(make_idempotent_upsert(out))
        .option("checkpointLocation", os.path.join(out, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return latest_upsert_snapshot(spark, out)


@register(
    "stream_sink",
    tags=("streaming", "sink"),
    rows_only_reason="streaming parquet sink with checkpoint; re-read "
    "equality vs batch asserted in tests/test_streaming.py",
)
def stream_sink(spark, sf_dir):
    """Streaming parquet sink with exactly-once checkpointing, then re-read
    (SURVEY §2.B stream_sink)."""
    import os
    import shutil

    from pycaim_spark.streaming.runner import _SCRATCH, read_events_stream

    # Fixed, cleared-at-start sink dir (same leak fix as stream_foreach_batch).
    out = os.path.join(_SCRATCH, "stream_sink_out")
    shutil.rmtree(out, ignore_errors=True)
    stream = read_events_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    query = (
        stream.writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(os.path.join(out, "data"))
