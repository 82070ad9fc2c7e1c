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


def test_foreach_batch_upsert_equals_batch_aggregate(spark, sf_dir):
    """stream_foreach_batch rows-only gate: the merged snapshot equals the
    batch per-user aggregate (counts + latest event by (ts, event_id))."""
    got = REGISTRY["stream_foreach_batch"].fn(spark, sf_dir)
    from pycaim_spark.streaming.runner import batch_events_with_tz_ts

    ev = batch_events_with_tz_ts(spark, sf_dir)
    twin = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.struct("ts", "event_id", "event_type")).alias("_l"),
        )
        .select(
            "user_id", "n_events",
            F.col("_l.event_id").alias("last_event_id"),
            F.col("_l.event_type").alias("last_event_type"),
        )
    )
    cols = ("user_id", "n_events", "last_event_id", "last_event_type")
    assert _rows(got, *cols) == _rows(twin, *cols)


def test_foreach_batch_upsert_accumulates_and_skips_redelivery(spark, tmp_path):
    """Multi-batch semantics of the idempotent merge sink: counts add
    across batches, latest-event wins by (ts, event_id), and re-delivering
    an already-committed batch id changes NOTHING (exactly-once from
    at-least-once delivery)."""
    from pycaim_spark.streaming.runner import (
        latest_upsert_snapshot,
        make_idempotent_upsert,
    )

    out = str(tmp_path / "upsert")
    upsert = make_idempotent_upsert(out)
    b0 = spark.createDataFrame(
        [(1, _t(1, 0), 10, "view"), (2, _t(1, 5), 10, "click"),
         (3, _t(1, 0), 20, "view")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    b1 = spark.createDataFrame(
        [(4, _t(2, 0), 10, "purchase"), (5, _t(0, 30), 20, "click")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    upsert(b0, 0)
    upsert(b1, 1)
    snap = {
        r.user_id: (r.n_events, r.last_event_id, r.last_event_type)
        for r in latest_upsert_snapshot(spark, out).collect()
    }
    # user 10: 3 events total, latest is the batch-1 purchase;
    # user 20: 2 events, but batch 1's event is EARLIER -> batch-0 view wins
    assert snap == {10: (3, 4, "purchase"), 20: (2, 3, "view")}
    # re-deliver batch 1 (sink crash after write, before checkpoint commit)
    upsert(b1, 1)
    snap2 = {
        r.user_id: (r.n_events, r.last_event_id, r.last_event_type)
        for r in latest_upsert_snapshot(spark, out).collect()
    }
    assert snap2 == snap  # no double-count


def test_foreach_batch_upsert_retention_prunes_and_still_skips(spark, tmp_path):
    """Version retention (ADVICE r8): only the newest keep_versions
    snapshot dirs survive, re-delivering a PRUNED batch id still skips
    (versions commit in order, so the newest snapshot folded it in), and
    an empty store raises a clear error instead of IndexError."""
    import os

    import pytest

    from pycaim_spark.streaming.runner import (
        latest_upsert_snapshot,
        make_idempotent_upsert,
    )

    out = str(tmp_path / "upsert_retention")
    with pytest.raises(FileNotFoundError, match="no completed upsert"):
        os.makedirs(out)
        latest_upsert_snapshot(spark, out)

    upsert = make_idempotent_upsert(out, keep_versions=2)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    for bid in range(4):
        upsert(
            spark.createDataFrame([(bid, _t(bid, 0), 10, "view")], schema), bid
        )
    versions = sorted(d for d in os.listdir(out) if d.startswith("v"))
    assert versions == ["v2", "v3"]  # v0/v1 pruned
    snap = {
        r.user_id: r.n_events for r in latest_upsert_snapshot(spark, out).collect()
    }
    assert snap == {10: 4}
    # re-deliver batch 0, whose version dir no longer exists: must SKIP
    upsert(spark.createDataFrame([(0, _t(0, 0), 10, "view")], schema), 0)
    snap2 = {
        r.user_id: r.n_events for r in latest_upsert_snapshot(spark, out).collect()
    }
    assert snap2 == {10: 4}  # unchanged — no double-count after pruning


def test_stream_sink_roundtrip_preserves_rows(spark, sf_dir):
    got = REGISTRY["stream_sink"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert _rows(got, "event_id", "user_id") == _rows(ev, "event_id", "user_id")


def _t(h, m):
    import datetime

    return datetime.datetime(2024, 1, 1, h, m)


def _write_ordered_files(dirpath, files):
    """Write parquet micro-batch files with forced modification-time order
    (FileStreamSource replays oldest-modified first)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000
    for i, (name, cols) in enumerate(files):
        path = str(dirpath / name)
        pq.write_table(
            pa.table(
                {
                    k: pa.array(v, type=pa.timestamp("us")) if k == "ts" else pa.array(v)
                    for k, v in cols.items()
                }
            ),
            path,
        )
        os.utime(path, (base + 100 * i, base + 100 * i))


def _run_stream(result, output_mode):
    """availableNow run returning (materialized rows DataFrame, progress)."""
    import os
    import uuid

    from pycaim_spark.streaming.runner import _SCRATCH

    name = f"mem_{uuid.uuid4().hex[:12]}"
    query = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(_SCRATCH, "checkpoints", name))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return result.sparkSession.table(name), query.recentProgress


def test_out_of_order_replay_drops_exactly_the_late_rows(spark, tmp_path):
    """True late-data semantics (VERDICT r2 #4): an out-of-order replay in
    which one row is genuinely late past the watermark, asserted against a
    hand computation of Spark's documented two-watermark rule (late-row
    filtering uses the PREVIOUS batch's eviction watermark; eviction uses
    the current one — SPARK-24634 semantics):

    - file 0: 3 events in [10:00,11:00) + one at 12:00 → eviction
      watermark after this batch = 11:50.
    - file 1: an out-of-order row 11:51 (admitted: > watermark) — during
      this batch the 10:00 window (end 11:00 ≤ 11:50) finalizes with n=3.
    - file 2: a LATE row 10:30 — its window finalized a batch ago, the
      late filter (now at 11:50) DROPS it — plus 12:30 (admitted).
    - final: watermark 12:20 finalizes the 11:00 window (n=1); the 12:00
      window (end 13:00 > 12:20) is open and correctly never emitted.

    Removing withWatermark fails this test: append-mode streaming
    aggregation requires one, and the late row would otherwise count.
    """
    src = tmp_path / "stream_src"
    src.mkdir()
    _write_ordered_files(
        src,
        [
            ("f0.parquet", {"ts": [_t(10, 0), _t(10, 15), _t(10, 45), _t(12, 0)]}),
            ("f1.parquet", {"ts": [_t(11, 51)]}),
            ("f2.parquet", {"ts": [_t(10, 30), _t(12, 30)]}),
        ],
    )
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    table, progress = _run_stream(agg, "append")
    got = _rows(table, "window_start", "n_events")
    # 10:00 window: 3 on-time rows, late 10:30 DROPPED; 11:00 window: the
    # out-of-order 11:51 row; 12:00 window: still open, not emitted.
    assert got == [(_t(10, 0), 3), (_t(11, 0), 1)]
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for so in p["stateOperators"]
    )
    assert dropped == 1, f"exactly the 10:30 row must be watermark-dropped: {dropped}"

    # The naive no-watermark batch aggregation counts the late row and the
    # open tail — the streaming result is genuinely watermark-governed.
    naive = (
        spark.createDataFrame(
            [(ts,) for ts in [_t(10, 0), _t(10, 15), _t(10, 45), _t(12, 0),
                              _t(11, 51), _t(10, 30), _t(12, 30)]],
            "ts timestamp",
        )
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    assert _rows(naive, "window_start", "n_events") == [
        (_t(10, 0), 4),
        (_t(11, 0), 1),
        (_t(12, 0), 2),
    ]


def test_out_of_order_dedup_reemits_after_state_expiry(spark, tmp_path):
    """dropDuplicatesWithinWatermark under out-of-order replay: duplicates
    within the watermark are suppressed (including in-batch); a duplicate
    arriving after its key's state expired is re-emitted — exactly-once
    holds only within the watermark, by contract."""
    src = tmp_path / "dedup_src"
    src.mkdir()
    _write_ordered_files(
        src,
        [
            # K first seen 10:00 (state expires at 11:00 with 1h delay);
            # the 10:05 duplicate is suppressed; X pushes event time ahead.
            ("f0.parquet", {"k": ["K", "K", "X"],
                            "ts": [_t(10, 0), _t(10, 5), _t(14, 0)]}),
            # watermark advances to 13:00 during this batch → K's state
            # (expiry 11:00) is evicted.
            ("f1.parquet", {"k": ["Y"], "ts": [_t(14, 30)]}),
            # K returns at 13:30: above the late filter, state gone → re-emitted.
            ("f2.parquet", {"k": ["K"], "ts": [_t(13, 30)]}),
        ],
    )
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["k"])
    table, _ = _run_stream(deduped, "append")
    got = sorted((r.k, r.ts) for r in table.collect())
    assert got == [
        ("K", _t(10, 0)),
        ("K", _t(13, 30)),
        ("X", _t(14, 0)),
        ("Y", _t(14, 30)),
    ], "K must appear exactly twice (pre- and post-expiry), 10:05 dup suppressed"


def test_session_window_spark_semantics_match_islands(spark, sf_dir):
    """Redundant with the oracle hash but pins the exact gap boundary:
    Spark merges while ts < prev_end (gap ≥ 30 min ⇒ new session)."""
    rows = REGISTRY["stream_session"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events_total = sum(r.n_events for r in rows)
    assert n_events_total == ev.count()  # partition of all events


def test_stream_join_interval_state_operator_and_batch_equality(spark, sf_dir):
    """The stream-stream interval join must run as symmetricHashJoin state
    (both sides watermarked → bounded state, evictable) and its complete
    availableNow result must equal the batch interval join row-for-row."""
    import pyspark.sql.functions as F

    from pycaim_spark.streaming.runner import (
        batch_events_with_tz_ts,
        read_events_stream,
    )

    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 hour")
    )
    buys = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("buy_id"),
                F.col("ts").alias("b_ts"))
        .withWatermark("b_ts", "1 hour")
    )
    joined = views.join(
        buys,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("b_ts") >= F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("user_id", "view_id", "buy_id")
    table, progress = _run_stream(joined, "append")
    ops = {
        s["operatorName"]
        for p in progress
        for s in p.get("stateOperators", [])
    }
    assert "symmetricHashJoin" in ops, f"expected stream-stream join state, got {ops}"

    ev = batch_events_with_tz_ts(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("a_ts"))
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), F.col("ts").alias("b_ts"))
    batch = a.join(
        b,
        (F.col("u") == F.col("user_id"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("user_id", "view_id", "buy_id")
    got = sorted((r.user_id, r.view_id, r.buy_id) for r in table.collect())
    want = sorted((r.user_id, r.view_id, r.buy_id) for r in batch.collect())
    assert got == want and got, "stream result must equal batch interval join"
