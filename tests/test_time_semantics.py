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
