"""Time semantics + triggers (SURVEY §2 #66): ingestion-time stamping,
processing-time windows, and trigger policies (availableNow drain,
processingTime cadence plumbing)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.sinks.streaming import memory_sink
from flink_learning_practise_spark.sources.streaming import file_stream_source
from flink_learning_practise_spark.streaming import time_semantics as ts


EVENT_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"


def write_events(path, events):
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"part-{len(os.listdir(path))}.jsonl")
    with open(fname, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_ingestion_time_stamps_arrival(spark):
    before = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    df = ts.with_ingestion_time(spark.range(3))
    rows = df.collect()
    after = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    # session runs in UTC; stamps must fall inside the call window
    for r in rows:
        assert before - dt.timedelta(seconds=1) <= r.ingest_ts <= after + dt.timedelta(seconds=1)
    # one deterministic stamp per batch (current_timestamp is query-start time)
    assert len({r.ingest_ts for r in rows}) == 1


def test_processing_time_window_preserves_totals(spark):
    """Which wall-clock window a row lands in is nondeterministic; that
    every row lands in exactly one is not."""
    df = spark.range(100).withColumn("k", F.col("id") % 3)
    out = ts.processing_time_window(
        df, "10 seconds", keys=["k"], aggs=[F.count(F.lit(1)).alias("n")]
    )
    got = out.groupBy("k").agg(F.sum("n").alias("total")).collect()
    assert {r.k: r.total for r in got} == {0: 34, 1: 33, 2: 33}
    assert "window_start" in out.columns and "window_end" in out.columns


def test_available_now_drains_and_stops(spark, tmp_path):
    """availableNow: process the full backlog with streaming semantics,
    then terminate on its own — no manual stop."""
    src_dir = str(tmp_path / "an_in")
    write_events(src_dir, [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 10.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:40", "user_id": 2, "value": 5.0},
    ])
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    writer = ts.with_trigger(
        memory_sink(src.select("event_id", "user_id"), "an_out", mode="append"),
        available_now=True,
    )
    q = writer.start()
    q.awaitTermination(60)
    assert not q.isActive  # drained the backlog and stopped itself
    assert {r.event_id for r in spark.table("an_out").collect()} == {1, 2}


def test_trigger_policy_is_exclusive(spark, tmp_path):
    src_dir = str(tmp_path / "tp_in")
    write_events(src_dir, [{"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 1.0}])
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    w = memory_sink(src, "tp_out", mode="append")
    with pytest.raises(ValueError, match="one trigger policy"):
        ts.with_trigger(w, processing_time="5 seconds", available_now=True)


def _punct_events():
    # user 1: events then a "flush" (value<0 is the punctuation mark),
    # more events, second flush, then a trailing unfired event.
    return [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 10.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:20", "user_id": 1, "value": 5.0},
        {"event_id": 3, "ts": "2024-01-01 00:00:30", "user_id": 1, "value": -1.0},
        {"event_id": 4, "ts": "2024-01-01 00:01:10", "user_id": 1, "value": 7.0},
        {"event_id": 5, "ts": "2024-01-01 00:01:20", "user_id": 1, "value": -1.0},
        {"event_id": 6, "ts": "2024-01-01 00:02:00", "user_id": 1, "value": 3.0},
        {"event_id": 7, "ts": "2024-01-01 00:00:15", "user_id": 2, "value": 2.0},
        {"event_id": 8, "ts": "2024-01-01 00:00:25", "user_id": 2, "value": -1.0},
    ]


def test_punctuated_window_fires_and_purges(spark, tmp_path):
    """GlobalWindows + punctuation trigger (FIRE_AND_PURGE): each flush
    event closes and emits the window open for its key, including the
    firing element; unfired trailing state emits nothing."""
    src_dir = str(tmp_path / "pw_in")
    write_events(src_dir, _punct_events())
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    out = ts.punctuated_window(
        src.select("user_id", "ts", "value"), fire=F.col("value") < 0
    )
    q = memory_sink(out, "pw_out", mode="append").start()
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        spark.table("pw_out").collect(), key=lambda r: (r.user_id, r.fire_ts)
    )
    got = [
        (r.user_id, r.window_start.isoformat(), r.fire_ts.isoformat(),
         r.n_events, r.sum_value)
        for r in rows
    ]
    assert got == [
        (1, "2024-01-01T00:00:10", "2024-01-01T00:00:30", 3, 14.0),
        (1, "2024-01-01T00:01:10", "2024-01-01T00:01:20", 2, 6.0),
        (2, "2024-01-01T00:00:15", "2024-01-01T00:00:25", 2, 1.0),
    ]  # event 6 (after user 1's last flush) never fires — stays pending


def test_punctuated_window_matches_batch_twin(spark, tmp_path):
    """Streaming/batch parity: on a single ordered backlog the
    stateful trigger and the batch gaps-and-islands twin must emit
    identical windows."""
    src_dir = str(tmp_path / "pwb_in")
    write_events(src_dir, _punct_events())
    fire = F.col("value") < 0
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    q = memory_sink(
        ts.punctuated_window(src.select("user_id", "ts", "value"), fire=fire),
        "pwb_out",
        mode="append",
    ).start()
    q.processAllAvailable()
    q.stop()
    stream_rows = sorted(map(tuple, spark.table("pwb_out").collect()))
    batch_df = spark.read.schema(EVENT_SCHEMA).json(src_dir)
    batch_rows = sorted(
        map(tuple, ts.punctuated_window_batch(batch_df, fire).collect())
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) == 3


def test_count_trigger_fires_every_n(spark, tmp_path):
    """CountTrigger.of(2) on the global window: every second element
    per key fires and purges."""
    src_dir = str(tmp_path / "ct_in")
    write_events(src_dir, [
        {"event_id": i, "ts": f"2024-01-01 00:00:{10+i:02d}", "user_id": 1,
         "value": float(i)} for i in range(1, 6)
    ])
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    out = ts.punctuated_window(src.select("user_id", "ts", "value"), count=2)
    q = memory_sink(out, "ct_out", mode="append").start()
    q.processAllAvailable()
    q.stop()
    rows = sorted(spark.table("ct_out").collect(), key=lambda r: r.fire_ts)
    assert [(r.n_events, r.sum_value) for r in rows] == [(2, 3.0), (2, 7.0)]
    # element 5 pending: no fifth-element window until a sixth arrives


def test_punctuated_window_requires_a_trigger(spark):
    with pytest.raises(ValueError, match="fire predicate or a count"):
        ts.punctuated_window(spark.range(1), fire=None, count=None)
