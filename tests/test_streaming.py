"""Structured Streaming runtime tests (SURVEY §2 #25-36): file-drop
source → watermark + windowed agg → memory sink; streaming dedup;
foreachBatch sink; custom stateful sessionizer."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.num import dsum
from flink_learning_practise_spark.sinks.streaming import foreach_batch_sink, memory_sink
from flink_learning_practise_spark.sources.streaming import file_stream_source
from flink_learning_practise_spark.streaming import pipeline as sp
from flink_learning_practise_spark.streaming.stateful import sessionize, streaming_dedup

EVENT_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"


def write_events(path, events):
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"part-{len(os.listdir(path))}.jsonl")
    with open(fname, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


@pytest.fixture()
def event_dir(tmp_path):
    path = str(tmp_path / "events_in")
    write_events(
        path,
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 10.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:40", "user_id": 1, "value": 5.0},
            {"event_id": 3, "ts": "2024-01-01 00:01:10", "user_id": 2, "value": 7.0},
            {"event_id": 4, "ts": "2024-01-01 00:03:05", "user_id": 1, "value": 1.0},
        ],
    )
    return path


def test_windowed_stats_stream(spark, event_dir):
    src = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json")
    assert src.isStreaming
    stats = sp.windowed_stats(
        src,
        "ts",
        "1 minute",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
        watermark_delay="30 seconds",
    )
    q = memory_sink(stats, "win_stats", mode="complete").start()
    sp.run_until_drained(q)
    rows = {(r.window_start.isoformat(), r.user_id): r for r in spark.table("win_stats").collect()}
    assert rows[("2024-01-01T00:00:00", 1)].n_events == 2
    assert rows[("2024-01-01T00:00:00", 1)].sum_value == 15.0
    assert rows[("2024-01-01T00:01:00", 2)].n_events == 1
    assert rows[("2024-01-01T00:03:00", 1)].sum_value == 1.0


def test_streaming_dedup(spark, tmp_path):
    path = str(tmp_path / "dups_in")
    write_events(
        path,
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01 00:00:11", "user_id": 1, "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:12", "user_id": 2, "value": 2.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:13", "user_id": 2, "value": 2.0},
        ],
    )
    src = file_stream_source(spark, path, EVENT_SCHEMA, fmt="json")
    deduped = streaming_dedup(src, ["event_id"], "ts", "1 minute")
    q = memory_sink(deduped, "dedup_out", mode="append").start()
    sp.run_until_drained(q)
    out = spark.table("dedup_out").collect()
    assert sorted(r.event_id for r in out) == [1, 2]


def test_foreach_batch_parquet_sink(spark, event_dir, tmp_path):
    out_dir = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    src = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json")
    q = foreach_batch_sink(src, write_batch, ckpt, mode="append").start()
    sp.run_until_drained(q)
    assert spark.read.parquet(out_dir).count() == 4


def test_etl_pipeline_composition(spark, event_dir, tmp_path):
    src = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json")
    q = sp.etl_pipeline(
        src,
        transform=lambda df: df.filter(F.col("value") >= 5.0).withColumn(
            "value_cents", (F.col("value") * 100).cast("long")
        ),
        sink=lambda df: memory_sink(df, "etl_out", mode="append"),
    )
    sp.run_until_drained(q)
    out = spark.table("etl_out").collect()
    assert sorted(r.value_cents for r in out) == [500, 700, 1000]


def test_sessionize_stateful(spark, event_dir):
    src = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json")
    sessions = sessionize(src.select("user_id", "ts", "value"), gap="2 minutes")
    q = memory_sink(sessions, "sessions_out", mode="update").start()
    sp.run_until_drained(q)
    out = spark.table("sessions_out").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    # user 1: events at 00:00:10, 00:00:40 then 00:03:05 (> 2 min gap)
    u1 = sorted(by_user[1], key=lambda r: r.session_start)
    assert u1[0].n_events == 2 and u1[0].sum_value == 15.0 and u1[0].closed is True
    assert u1[1].n_events == 1 and u1[1].closed is False
    assert by_user[2][0].n_events == 1


def test_sessionize_matches_batch_session_window(spark, tmp_path):
    """The two session implementations (streaming applyInPandasWithState
    vs batch gaps-and-islands) must agree: every CLOSED streaming
    session equals a batch session — same (user, start, end, n, sum)."""
    real = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:02:00", "user_id": 1, "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 00:04:00", "user_id": 1, "value": 3.0},
        {"event_id": 4, "ts": "2024-01-01 00:20:00", "user_id": 1, "value": 10.0},
        {"event_id": 5, "ts": "2024-01-01 00:01:00", "user_id": 2, "value": 5.0},
        {"event_id": 6, "ts": "2024-01-01 00:30:00", "user_id": 2, "value": 7.0},
        {"event_id": 7, "ts": "2024-01-01 00:31:00", "user_id": 2, "value": 8.0},
        {"event_id": 8, "ts": "2024-01-01 00:00:00", "user_id": 3, "value": 1.5},
        {"event_id": 9, "ts": "2024-01-01 00:04:30", "user_id": 3, "value": 2.5},
        {"event_id": 10, "ts": "2024-01-01 00:09:00", "user_id": 3, "value": 3.0},
    ]
    # flush events advance the watermark far past every session's
    # timeout so ALL real sessions close; they sit in their own session
    # (> gap after the last real event) which stays open.
    flush = [
        {"event_id": 90 + u, "ts": "2024-01-01 02:00:00", "user_id": u, "value": 0.0}
        for u in (1, 2, 3)
    ]
    src_dir = str(tmp_path / "parity_in")
    write_events(src_dir, real)
    write_events(src_dir, flush)
    src = file_stream_source(
        spark, src_dir, EVENT_SCHEMA, fmt="json", max_files_per_trigger=1
    )
    sessions = sessionize(src.select("user_id", "ts", "value"), gap="5 minutes")
    q = memory_sink(sessions, "session_parity_out", mode="update").start()
    sp.run_until_drained(q)
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.table("session_parity_out").collect()
        if r.closed
    }

    from flink_learning_practise_spark.operators.windows import session_window_batch

    batch_df = spark.createDataFrame(
        [(e["user_id"], e["ts"], e["value"]) for e in real],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in session_window_batch(
            batch_df,
            "ts",
            "5 minutes",
            keys=["user_id"],
            aggs=[
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            ],
        ).collect()
    }
    assert streamed == batched
    assert len(batched) == 5  # u1: 2, u2: 2, u3: 1 (4.5m gaps merge)


def test_stream_session_agg_matches_batch(spark, tmp_path):
    """Built-in F.session_window streaming sessions must equal the batch
    gaps-and-islands sessions (accounting for the built-in's end = last
    event + gap convention)."""
    import datetime as dt

    from flink_learning_practise_spark.operators.windows import session_window_batch

    real = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:02:00", "user_id": 1, "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 00:20:00", "user_id": 1, "value": 10.0},
        {"event_id": 4, "ts": "2024-01-01 00:01:00", "user_id": 2, "value": 5.0},
    ]
    flush = [
        {"event_id": 90 + u, "ts": "2024-01-01 02:00:00", "user_id": u, "value": 0.0}
        for u in (1, 2)
    ]
    src_dir = str(tmp_path / "bsess_in")
    write_events(src_dir, real)
    write_events(src_dir, flush)
    src = file_stream_source(
        spark, src_dir, EVENT_SCHEMA, fmt="json", max_files_per_trigger=1
    )
    out = sp.stream_session_agg(
        src, "ts", "5 minutes", keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")],
        watermark_delay="1 minute",
    )
    q = memory_sink(out, "bsess_out", mode="append").start()
    sp.run_until_drained(q)
    gap = dt.timedelta(minutes=5)
    streamed = {
        (r.user_id, r.session_start, r.session_end - gap, r.n_events, r.sum_value)
        for r in spark.table("bsess_out").collect()
        if r.sum_value != 0.0  # exclude the flush sessions
    }
    batch_df = spark.createDataFrame(
        [(e["user_id"], e["ts"], e["value"]) for e in real],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in session_window_batch(
            batch_df, "ts", "5 minutes", keys=["user_id"],
            aggs=[F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")],
        ).collect()
    }
    assert streamed == batched
    assert len(batched) == 3


def test_funnel_stream_matches_batch(spark, tmp_path):
    """Streaming CEP parity: the continuous matcher must produce exactly
    the batch funnel's matches once the watermark passes everything —
    including when events arrive OUT OF ORDER across micro-batches."""
    from flink_learning_practise_spark.operators.cep import funnel
    from flink_learning_practise_spark.streaming.cep import funnel_stream

    def e(eid, minute, user, typ, second=0):
        return {
            "event_id": eid,
            "ts": f"2024-01-01 00:{minute:02d}:{second:02d}",
            "user_id": user,
            "event_type": typ,
        }

    real = [
        e(1, 0, 1, "view"),
        e(2, 1, 1, "click"),
        e(3, 2, 1, "purchase"),
        e(4, 3, 1, "view"),
        e(5, 30, 1, "click"),  # out of 10m gap: view 4 must not convert
        e(6, 0, 2, "view"),
        e(7, 1, 2, "view"),  # both views share click 8
        e(8, 2, 2, "click"),
        e(9, 3, 2, "purchase"),
    ]
    flush = [e(99, 59, u, "noise") for u in (1, 2)]
    src_dir = str(tmp_path / "cep_in")
    # deliberately deliver the SECOND half first: batch 1 gets late
    # minutes, batch 2 the early ones (still within the 30m watermark
    # delay), so correctness requires the state buffer's reordering.
    write_events(src_dir, real[4:])
    write_events(src_dir, real[:4])
    write_events(src_dir, flush)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    src = file_stream_source(
        spark, src_dir, schema, fmt="json", max_files_per_trigger=1
    )
    out = funnel_stream(
        src, ["view", "click", "purchase"], "10 minutes",
        watermark_delay="30 minutes",
    )
    q = memory_sink(out, "funnel_stream_out", mode="append").start()
    sp.run_until_drained(q)
    streamed = {
        (r.user_id, r.step1_id, r.step2_id, r.step3_id)
        for r in spark.table("funnel_stream_out").collect()
    }

    batch_df = spark.createDataFrame(
        [(x["event_id"], x["ts"], x["user_id"], x["event_type"]) for x in real + flush],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.step1_id, r.step2_id, r.step3_id)
        for r in funnel(batch_df, ["view", "click", "purchase"], "10 minutes").collect()
    }
    assert streamed == batched
    assert streamed == {(1, 1, 2, 3), (2, 6, 8, 9), (2, 7, 8, 9)}


def test_not_followed_by_stream_matches_batch(spark, tmp_path):
    """Streaming absence detection: emit views the watermark proves
    unclicked within the gap; must equal the batch operator, with
    out-of-order delivery across micro-batches."""
    from flink_learning_practise_spark.operators.cep import not_followed_by
    from flink_learning_practise_spark.streaming.cep import not_followed_by_stream

    def e(eid, minute, user, typ):
        return {
            "event_id": eid,
            "ts": f"2024-01-01 00:{minute:02d}:00",
            "user_id": user,
            "event_type": typ,
        }

    real = [
        e(1, 0, 1, "view"),
        e(2, 1, 1, "click"),   # view 1 clicked -> not abandoned
        e(3, 10, 1, "view"),   # never clicked -> abandoned
        e(4, 0, 2, "view"),
        e(5, 40, 2, "click"),  # out of 10m gap -> view 4 abandoned
        e(6, 45, 2, "view"),   # clicked at 46 -> not abandoned
        e(7, 46, 2, "click"),
    ]
    flush = [e(90 + u, 59, u, "noise") for u in (1, 2)]
    src_dir = str(tmp_path / "nfb_in")
    write_events(src_dir, real[3:])  # second half first: out-of-order
    write_events(src_dir, real[:3])
    write_events(src_dir, flush)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    src = file_stream_source(
        spark, src_dir, schema, fmt="json", max_files_per_trigger=1
    )
    out = not_followed_by_stream(
        src, "view", "click", "10 minutes", watermark_delay="30 minutes"
    )
    q = memory_sink(out, "nfb_out", mode="append").start()
    sp.run_until_drained(q)
    streamed = {
        (r.user_id, r.step1_id) for r in spark.table("nfb_out").collect()
    }

    batch_df = spark.createDataFrame(
        [(x["event_id"], x["ts"], x["user_id"], x["event_type"]) for x in real + flush],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.step1_id)
        for r in not_followed_by(batch_df, "view", "click", "10 minutes").collect()
    }
    assert streamed == batched
    assert streamed == {(1, 3), (2, 4)}


def test_stream_stream_window_join(spark, event_dir, tmp_path):
    # second stream: purchases by the same users, some in matching windows
    purchases = str(tmp_path / "purchases_in")
    write_events(
        purchases,
        [
            {"event_id": 101, "ts": "2024-01-01 00:00:30", "user_id": 1, "value": 99.0},
            {"event_id": 102, "ts": "2024-01-01 00:02:10", "user_id": 2, "value": 42.0},
        ],
    )
    clicks = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json")
    buys = file_stream_source(spark, purchases, EVENT_SCHEMA, fmt="json")
    joined = sp.stream_window_join(
        clicks, buys, "ts", "ts", "1 minute", on=[("user_id", "user_id")],
        watermark_delay="30 seconds",
    )
    assert joined.isStreaming
    q = memory_sink(joined.select("event_id", "event_id_r", "window_start"),
                    "joined_stream", mode="append").start()
    sp.run_until_drained(q)
    got = {(r.event_id, r.event_id_r) for r in spark.table("joined_stream").collect()}
    # events 1 & 2 (user 1, window 00:00) match purchase 101 (same window);
    # event 3 (user 2, 00:01) and 4 (user 1, 00:03) have no same-window buy
    assert got == {(1, 101), (2, 101)}


def test_stream_window_outer_join_emits_nulls_on_watermark(spark, event_dir, tmp_path):
    """LEFT OUTER stream-stream window join: unmatched left rows must
    emit with NULL partner columns — but only after the watermark
    passes their window (Flink's outer window-join fire semantics)."""
    purchases = str(tmp_path / "outer_purchases")
    write_events(
        purchases,
        [
            {"event_id": 101, "ts": "2024-01-01 00:00:30", "user_id": 1, "value": 99.0},
            {"event_id": 102, "ts": "2024-01-01 00:02:10", "user_id": 2, "value": 42.0},
        ],
    )
    # flush events in SECOND files (one batch each) push BOTH sources'
    # watermarks past every real window + delay, so unmatched rows
    # become provably unmatchable and the outer side fires.
    write_events(
        event_dir,
        [{"event_id": 999, "ts": "2024-01-01 01:00:00", "user_id": 99, "value": 0.0}],
    )
    write_events(
        purchases,
        [{"event_id": 998, "ts": "2024-01-01 01:00:00", "user_id": 99, "value": 0.0}],
    )
    clicks = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json",
                                max_files_per_trigger=1)
    buys = file_stream_source(spark, purchases, EVENT_SCHEMA, fmt="json",
                              max_files_per_trigger=1)
    joined = sp.stream_window_join(
        clicks, buys, "ts", "ts", "1 minute", on=[("user_id", "user_id")],
        watermark_delay="30 seconds", how="left_outer",
    )
    assert joined.isStreaming
    q = memory_sink(joined.select("event_id", "event_id_r"),
                    "outer_join_stream", mode="append").start()
    sp.run_until_drained(q)
    got = {(r.event_id, r.event_id_r)
           for r in spark.table("outer_join_stream").collect()}
    # matched pairs identical to the inner join; clicks 3 (user 2,
    # window 00:01) and 4 (user 1, 00:03) have no same-window purchase
    # and emit with NULL once the flush watermark closes their windows.
    # 999/998 are the flush rows (999 pairs with 998: same user+window).
    assert got == {(1, 101), (2, 101), (3, None), (4, None), (999, 998)}


def test_stream_interval_join_matches_batch(spark, event_dir, tmp_path):
    """Streaming interval join must agree with the batch operator on the
    same data once everything is processed."""
    from flink_learning_practise_spark.operators.joins import interval_join

    purchases = str(tmp_path / "iv_purchases")
    write_events(
        purchases,
        [
            {"event_id": 201, "ts": "2024-01-01 00:00:20", "user_id": 1, "value": 9.0},
            {"event_id": 202, "ts": "2024-01-01 00:02:30", "user_id": 2, "value": 8.0},
            {"event_id": 203, "ts": "2024-01-01 00:07:00", "user_id": 1, "value": 7.0},
        ],
    )
    clicks_s = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json")
    buys_s = file_stream_source(spark, purchases, EVENT_SCHEMA, fmt="json")
    joined = sp.stream_interval_join(
        clicks_s, buys_s, "ts", "ts", "30 seconds", "2 minutes",
        on=[("user_id", "user_id")], watermark_delay="30 seconds",
    )
    assert joined.isStreaming
    q = memory_sink(joined.select("event_id", "event_id_r"), "iv_stream",
                    mode="append").start()
    sp.run_until_drained(q)
    streamed = {(r.event_id, r.event_id_r) for r in spark.table("iv_stream").collect()}

    clicks_b = spark.read.schema(EVENT_SCHEMA).json(event_dir)
    buys_b = spark.read.schema(EVENT_SCHEMA).json(purchases)
    batch = interval_join(
        clicks_b, buys_b.select(*[F.col(c).alias(f"{c}_r") for c in buys_b.columns]),
        "ts", "ts_r", "30 seconds", "2 minutes", on=[("user_id", "user_id_r")],
    )
    batched = {(r.event_id, r.event_id_r) for r in batch.collect()}
    assert streamed == batched
    assert streamed  # fixture must actually produce matches


def test_etl_pipeline_with_dlq(spark, tmp_path):
    src_dir = str(tmp_path / "dlq_in")
    write_events(
        src_dir,
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 10.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:20", "user_id": 1, "value": -3.0},
            {"event_id": 3, "ts": "2024-01-01 00:00:30", "user_id": 2, "value": 7.0},
            {"event_id": 4, "ts": "2024-01-01 00:00:40", "user_id": 2, "value": None},
        ],
    )
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    main_out, err_out = str(tmp_path / "main"), str(tmp_path / "dlq")
    q = sp.etl_pipeline_with_dlq(
        src,
        validity=F.col("value").isNotNull() & (F.col("value") >= 0),
        transform=lambda df: df.withColumn("value_cents", (F.col("value") * 100).cast("long")),
        main_writer=lambda df: df.write.mode("append").parquet(main_out),
        error_writer=lambda df: df.write.mode("append").parquet(err_out),
        checkpoint=str(tmp_path / "ckpt"),
    )
    sp.run_until_drained(q)
    main = {r.event_id: r.value_cents for r in spark.read.parquet(main_out).collect()}
    dlq = {r.event_id for r in spark.read.parquet(err_out).collect()}
    assert main == {1: 1000, 3: 700}
    assert dlq == {2, 4}


def test_dlq_captures_null_validity_rows(spark, tmp_path):
    """Under three-valued logic a NULL validity predicate fails BOTH
    filter(p) and filter(~p) — malformed rows must still reach the DLQ,
    not vanish. The predicate here is deliberately null-unsafe."""
    src_dir = str(tmp_path / "dlq_null_in")
    write_events(
        src_dir,
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 10.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:20", "user_id": 2, "value": None},
        ],
    )
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    main_out, err_out = str(tmp_path / "main"), str(tmp_path / "dlq")
    q = sp.etl_pipeline_with_dlq(
        src,
        validity=F.col("value") >= 0,  # NULL for event 2, not False
        transform=lambda df: df,
        main_writer=lambda df: df.write.mode("append").parquet(main_out),
        error_writer=lambda df: df.write.mode("append").parquet(err_out),
        checkpoint=str(tmp_path / "ckpt"),
    )
    sp.run_until_drained(q)
    assert {r.event_id for r in spark.read.parquet(main_out).collect()} == {1}
    assert {r.event_id for r in spark.read.parquet(err_out).collect()} == {2}


def test_streaming_windowed_top_n(spark, tmp_path):
    """Per-window top-N (the classic Flink exercise): complete-mode
    windowed aggregate -> rank per window in foreachBatch -> overwrite
    sink. Works whenever (window, key) cardinality is bounded; at scale
    the same ranking runs on the update stream into a keyed store."""
    from pyspark.sql import Window as W

    src_dir = str(tmp_path / "topn_in")
    write_events(
        src_dir,
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:05", "user_id": 1, "value": 5.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:15", "user_id": 2, "value": 9.0},
            {"event_id": 3, "ts": "2024-01-01 00:00:25", "user_id": 3, "value": 1.0},
            {"event_id": 4, "ts": "2024-01-01 00:01:10", "user_id": 2, "value": 4.0},
            {"event_id": 5, "ts": "2024-01-01 00:01:20", "user_id": 1, "value": 6.0},
        ],
    )
    src = file_stream_source(spark, src_dir, EVENT_SCHEMA, fmt="json")
    stats = sp.windowed_stats(
        src, "ts", "1 minute", keys=["user_id"],
        aggs=[dsum("value", "sum_value")], watermark_delay="30 seconds",
    )
    out_dir = str(tmp_path / "topn_out")

    def write_top_n(batch_df, batch_id):
        w = W.partitionBy("window_start").orderBy(
            F.desc("sum_value"), F.asc("user_id")
        )
        top = (
            batch_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
        )
        top.write.mode("overwrite").parquet(out_dir)

    q = (
        stats.writeStream.foreachBatch(write_top_n)
        .option("checkpointLocation", str(tmp_path / "topn_ckpt"))
        .outputMode("complete")
        .start()
    )
    sp.run_until_drained(q)
    got = {
        (r.window_start.isoformat(), r.rank): (r.user_id, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("2024-01-01T00:00:00", 1)] == (2, 9.0)
    assert got[("2024-01-01T00:00:00", 2)] == (1, 5.0)  # user 3 cut by N=2
    assert got[("2024-01-01T00:01:00", 1)] == (1, 6.0)
    assert got[("2024-01-01T00:01:00", 2)] == (2, 4.0)


def test_funnel_stream_microsecond_precision_matches_batch(spark, tmp_path):
    """Regression: the stream matcher once truncated timestamps to ms,
    tying events <1ms apart and binding by id order instead of the
    batch operator's (µs ts, id) order. Events 200µs apart with
    INVERTED id order must bind identically on both engines."""
    from flink_learning_practise_spark.operators.cep import funnel
    from flink_learning_practise_spark.streaming.cep import funnel_stream

    real = [
        # view at 100µs; the µs-earliest click (300µs) has the LARGER id,
        # so ms-truncated (ts, id) ordering would bind click id=5 instead
        {"event_id": 1, "ts": "2024-01-01 00:00:00.000100", "user_id": 1, "event_type": "view"},
        {"event_id": 9, "ts": "2024-01-01 00:00:00.000300", "user_id": 1, "event_type": "click"},
        {"event_id": 5, "ts": "2024-01-01 00:00:00.000900", "user_id": 1, "event_type": "click"},
    ]
    flush = [{"event_id": 99, "ts": "2024-01-01 01:00:00", "user_id": 1, "event_type": "noise"}]
    src_dir = str(tmp_path / "cep_us_in")
    write_events(src_dir, real)
    write_events(src_dir, flush)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    src = file_stream_source(spark, src_dir, schema, fmt="json", max_files_per_trigger=1)
    out = funnel_stream(src, ["view", "click"], "10 minutes", watermark_delay="1 minute")
    q = memory_sink(out, "cep_us_out", mode="append").start()
    sp.run_until_drained(q)
    streamed = {
        (r.user_id, r.step1_id, r.step1_ts, r.step2_id, r.step2_ts)
        for r in spark.table("cep_us_out").collect()
    }
    batch_df = spark.createDataFrame(
        [(x["event_id"], x["ts"], x["user_id"], x["event_type"]) for x in real + flush],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.step1_id, r.step1_ts, r.step2_id, r.step2_ts)
        for r in funnel(batch_df, ["view", "click"], "10 minutes").collect()
    }
    assert streamed == batched
    assert {s[3] for s in streamed} == {9}  # µs-earliest click, not id order


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static broadcast join: every micro-batch enriches against
    the dim table; unmatched stream rows survive with nulls (left)."""
    src_dir = str(tmp_path / "enrich_in")
    write_events(src_dir, [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 10.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:20", "user_id": 99, "value": 5.0},
    ])
    write_events(src_dir, [
        {"event_id": 3, "ts": "2024-01-01 00:01:10", "user_id": 2, "value": 7.0},
    ])
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    src = file_stream_source(
        spark, src_dir, EVENT_SCHEMA, fmt="json", max_files_per_trigger=1
    )
    out = sp.stream_static_enrich(src, dim, on=["user_id"])
    assert out.isStreaming
    q = memory_sink(out.select("event_id", "user_id", "tier"), "enrich_out").start()
    sp.run_until_drained(q)
    got = {r.event_id: r.tier for r in spark.table("enrich_out").collect()}
    assert got == {1: "gold", 2: None, 3: "silver"}


def test_funnel_stream_predicate_steps_match_batch(spark, tmp_path):
    """Streaming CEP predicate steps (where()): the stream matcher must
    bind exactly what the batch operator binds — including skipping a
    type-matching event that FAILS the predicate."""
    from pyspark.sql import functions as F

    from flink_learning_practise_spark.operators.cep import funnel
    from flink_learning_practise_spark.streaming.cep import funnel_stream

    real = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "view", "value": 0.0},
        # purchase below threshold: type matches, predicate doesn't — skipped
        {"event_id": 2, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "purchase", "value": 50.0},
        {"event_id": 3, "ts": "2024-01-01 00:02:00", "user_id": 1, "event_type": "purchase", "value": 500.0},
        # user 2: only a small purchase — no match
        {"event_id": 4, "ts": "2024-01-01 00:00:30", "user_id": 2, "event_type": "view", "value": 0.0},
        {"event_id": 5, "ts": "2024-01-01 00:01:30", "user_id": 2, "event_type": "purchase", "value": 10.0},
    ]
    flush = [{"event_id": 99, "ts": "2024-01-01 01:00:00", "user_id": 1, "event_type": "noise", "value": 0.0}]
    steps = [
        "view",
        ("big_buy", (F.col("event_type") == "purchase") & (F.col("value") > 100)),
    ]
    src_dir = str(tmp_path / "cep_pred_in")
    write_events(src_dir, real)
    write_events(src_dir, flush)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    src = file_stream_source(spark, src_dir, schema, fmt="json", max_files_per_trigger=1)
    out = funnel_stream(src, steps, "10 minutes", watermark_delay="1 minute")
    q = memory_sink(out, "cep_pred_out", mode="append").start()
    sp.run_until_drained(q)
    streamed = {
        (r.user_id, r.step1_id, r.step2_id)
        for r in spark.table("cep_pred_out").collect()
    }
    batch_df = spark.createDataFrame(
        [(x["event_id"], x["ts"], x["user_id"], x["event_type"], x["value"]) for x in real + flush],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.step1_id, r.step2_id)
        for r in funnel(batch_df, steps, "10 minutes").collect()
    }
    assert streamed == batched == {(1, 1, 3)}


def test_funnel_stream_times_n_repeated_steps(spark, tmp_path):
    """Flink times(n) on the stream: a repeated step is the same
    predicate twice — each occurrence binds a DISTINCT next event."""
    from flink_learning_practise_spark.operators.cep import funnel
    from flink_learning_practise_spark.streaming.cep import funnel_stream

    real = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "click"},
        {"event_id": 2, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "click"},
        {"event_id": 3, "ts": "2024-01-01 00:02:00", "user_id": 1, "event_type": "click"},
        {"event_id": 4, "ts": "2024-01-01 00:00:00", "user_id": 2, "event_type": "click"},
    ]
    flush = [{"event_id": 99, "ts": "2024-01-01 01:00:00", "user_id": 1, "event_type": "noise"}]
    src_dir = str(tmp_path / "cep_times_in")
    write_events(src_dir, real)
    write_events(src_dir, flush)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    src = file_stream_source(spark, src_dir, schema, fmt="json", max_files_per_trigger=1)
    out = funnel_stream(src, ["click", "click"], "10 minutes", watermark_delay="1 minute")
    q = memory_sink(out, "cep_times_out", mode="append").start()
    sp.run_until_drained(q)
    streamed = {
        (r.user_id, r.step1_id, r.step2_id)
        for r in spark.table("cep_times_out").collect()
    }
    batch_df = spark.createDataFrame(
        [(x["event_id"], x["ts"], x["user_id"], x["event_type"]) for x in real + flush],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.step1_id, r.step2_id)
        for r in funnel(batch_df, ["click", "click"], "10 minutes").collect()
    }
    # two matches for user 1 (1→2, 2→3), none for user 2 (single click)
    assert streamed == batched == {(1, 1, 2), (1, 2, 3)}


def test_not_followed_by_stream_predicates_match_batch(spark, tmp_path):
    """Streaming absence with predicate steps: a big view is 'abandoned'
    unless followed by a LARGE purchase — a small purchase must NOT
    refute it."""
    from flink_learning_practise_spark.operators.cep import not_followed_by
    from flink_learning_practise_spark.streaming.cep import not_followed_by_stream

    real = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "view", "value": 0.0},
        # small purchase: type matches, predicate doesn't — no refute
        {"event_id": 2, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "purchase", "value": 10.0},
        {"event_id": 3, "ts": "2024-01-01 00:00:00", "user_id": 2, "event_type": "view", "value": 0.0},
        {"event_id": 4, "ts": "2024-01-01 00:01:00", "user_id": 2, "event_type": "purchase", "value": 500.0},
    ]
    flush = [{"event_id": 99, "ts": "2024-01-01 01:00:00", "user_id": 1, "event_type": "noise", "value": 0.0}]
    first = "view"
    absent = ("big_buy", (F.col("event_type") == "purchase") & (F.col("value") > 100))
    src_dir = str(tmp_path / "cep_nfb_pred_in")
    write_events(src_dir, real)
    write_events(src_dir, flush)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    src = file_stream_source(spark, src_dir, schema, fmt="json", max_files_per_trigger=1)
    out = not_followed_by_stream(src, first, absent, "10 minutes", watermark_delay="1 minute")
    q = memory_sink(out, "cep_nfb_pred_out", mode="append").start()
    sp.run_until_drained(q)
    streamed = {(r.user_id, r.step1_id) for r in spark.table("cep_nfb_pred_out").collect()}
    batch_df = spark.createDataFrame(
        [(x["event_id"], x["ts"], x["user_id"], x["event_type"], x["value"]) for x in real + flush],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batched = {
        (r.user_id, r.step1_id)
        for r in not_followed_by(batch_df, first, absent, "10 minutes").collect()
    }
    # user 1's view abandoned (only a small purchase), user 2's refuted
    assert streamed == batched == {(1, 1)}


def test_sessionize_on_rocksdb_state_store(spark, event_dir):
    """Large-state backend surface (SURVEY §2 #35/#57; reference
    flink_learning/flink_typora.md:651 RocksDBStateBackend): the
    stateful sessionizer must run unchanged on the RocksDB state-store
    provider, and the state operator's metrics must prove RocksDB was
    actually in use (not silently defaulted back to HDFS-backed)."""
    from flink_learning_practise_spark.session import get_spark

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    s = get_spark(state_store="rocksdb")
    assert s is spark  # getOrCreate reuses the test session
    try:
        src = file_stream_source(spark, event_dir, EVENT_SCHEMA, fmt="json")
        sessions = sessionize(src.select("user_id", "ts", "value"), gap="2 minutes")
        q = memory_sink(sessions, "sessions_rocks", mode="update").start()
        try:
            q.processAllAvailable()
            progress = [p for p in q.recentProgress if p.get("stateOperators")]
            assert progress, "no stateful progress recorded"
            metrics = progress[-1]["stateOperators"][0]["customMetrics"]
            assert any(k.startswith("rocksdb") for k in metrics), metrics
        finally:
            q.stop()
        out = spark.table("sessions_rocks").collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r.user_id, []).append(r)
        u1 = sorted(by_user[1], key=lambda r: r.session_start)
        assert u1[0].n_events == 2 and u1[0].sum_value == 15.0 and u1[0].closed is True
        assert u1[1].n_events == 1 and u1[1].closed is False
        assert by_user[2][0].n_events == 1
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def test_curation_projections_work_on_streams(spark, tmp_path):
    """The curation tier's map-only operators (PII scrub, Gopher gates)
    are plain projections, so the SAME operator code runs unchanged on
    an unbounded source — Structured Streaming's batch/stream
    unification. Prove it: stream a file-drop source through scrub_pii
    and repetition_features and compare against the batch run."""
    import json

    from flink_learning_practise_spark.operators import curation

    path = str(tmp_path / "cur_in")
    rows = [
        {"doc_id": 1, "text": "contact bob@example.com id 12345"},
        {"doc_id": 2, "text": "buy now " * 40},
        {"doc_id": 3, "text": " ".join(f"word{i}" for i in range(40))},
    ]
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/part1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    schema = "doc_id long, text string"
    src = spark.readStream.schema(schema).json(path)
    batch = spark.read.schema(schema).json(path)

    scrub_q = (
        curation.scrub_pii(src, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("cur_scrub")
        .outputMode("append")
        .start()
    )
    gates_q = (
        curation.repetition_features(src, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("cur_gates")
        .outputMode("append")
        .start()
    )
    for q in (scrub_q, gates_q):
        q.processAllAvailable()
        q.stop()

    def rows_of(df):
        return sorted(map(tuple, df.collect()))

    assert rows_of(spark.table("cur_scrub")) == rows_of(
        curation.scrub_pii(batch, "doc_id", "text")
    )
    assert rows_of(spark.table("cur_gates")) == rows_of(
        curation.repetition_features(batch, "doc_id", "text")
    )


def test_trending_tokens_matches_batch_topk(spark, tmp_path):
    """Streaming windowed token counts + foreachBatch ranking == the
    batch vocab ranking per window, under out-of-order delivery across
    micro-batches."""
    import json
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        rank_topk_batch,
        trending_tokens,
    )

    path = str(tmp_path / "trend_in")
    os.makedirs(path, exist_ok=True)
    batch1 = [
        {"ts": "2024-01-01 00:00:05", "text": "spark spark flink"},
        {"ts": "2024-01-01 00:00:40", "text": "spark table table"},
        {"ts": "2024-01-01 00:01:10", "text": "rows rows rows"},
    ]
    batch2 = [
        {"ts": "2024-01-01 00:00:50", "text": "flink flink flink"},  # late, in window 0
        {"ts": "2024-01-01 00:03:00", "text": "done done done"},  # advances watermark
    ]
    with open(f"{path}/b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in batch1))

    schema = "ts timestamp, text string"
    src = spark.readStream.schema(schema).json(path)
    counts = trending_tokens(src, "ts", "text", window="1 minute")

    ranked_batches = []

    def sink(batch, _bid):
        ranked_batches.append(rank_topk_batch(batch, k=2).collect())

    q = counts.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    with open(f"{path}/b2.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in batch2))
    q.processAllAvailable()
    q.stop()

    got = {
        (r["window_start"].isoformat(), r["rank"]): (r["token"], r["n"])
        for rows in ranked_batches
        for r in rows
    }
    # window 00:00 closed only after batch2's late row arrived: counts
    # include it (spark 2+1=3, flink 1+3=4 -> flink ranks first)
    assert got[("2024-01-01T00:00:00", 1)] == ("flink", 4)
    assert got[("2024-01-01T00:00:00", 2)] == ("spark", 3)
    assert got[("2024-01-01T00:01:00", 1)] == ("rows", 3)


def test_stream_incremental_dedup_matches_batch_semantics(spark, tmp_path):
    """Stream-vs-snapshot dedup: snapshot copies are dropped,
    stream-internal copies keep the first arrival, novel docs pass."""
    import json
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        stream_incremental_dedup,
    )

    path = str(tmp_path / "inc_in")
    os.makedirs(path, exist_ok=True)
    rows = [
        {"doc_id": 10, "ts": "2024-01-01 00:00:01", "text": "already in corpus"},
        {"doc_id": 11, "ts": "2024-01-01 00:00:02", "text": "novel one"},
        {"doc_id": 12, "ts": "2024-01-01 00:00:03", "text": "repeated stream doc"},
        {"doc_id": 13, "ts": "2024-01-01 00:00:04", "text": "Repeated  STREAM doc"},
        {"doc_id": 14, "ts": "2024-01-01 00:00:05", "text": "novel two"},
    ]
    with open(f"{path}/b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    snapshot = spark.createDataFrame(
        [(1, "already in corpus"), (2, "other old doc")], "doc_id long, text string"
    )
    src = spark.readStream.schema("doc_id long, ts timestamp, text string").json(path)
    out = stream_incremental_dedup(src, snapshot, "doc_id", "text", "ts")
    q = out.writeStream.format("memory").queryName("inc_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = sorted(r["doc_id"] for r in spark.table("inc_out").collect())
    assert got == [11, 12, 14]  # 10: snapshot dup; 13: stream dup of 12


def test_exactly_once_across_restart_from_checkpoint(spark, tmp_path):
    """The exactly-once contract end-to-end: a query stopped and
    RESTARTED from its checkpoint must not re-deliver already-committed
    micro-batches, and an idempotent per-batch-id sink must absorb any
    replay of the in-flight batch — each source row lands exactly once
    across the restart."""
    import glob
    import json
    import os

    src = str(tmp_path / "eo_in")
    sink = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ckpt")
    os.makedirs(src, exist_ok=True)

    def start_query():
        stream = spark.readStream.schema("event_id long, value double").json(src)

        def write_batch(batch, batch_id):
            # idempotent: a replayed batch id overwrites its own dir
            batch.write.mode("overwrite").parquet(f"{sink}/b{batch_id}")

        return (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )

    with open(f"{src}/f1.json", "w") as f:
        f.write(json.dumps({"event_id": 1, "value": 1.0}) + "\n")
        f.write(json.dumps({"event_id": 2, "value": 2.0}) + "\n")
    q = start_query()
    q.processAllAvailable()
    q.stop()

    with open(f"{src}/f2.json", "w") as f:
        f.write(json.dumps({"event_id": 3, "value": 3.0}) + "\n")
    q = start_query()  # same checkpoint: resumes at committed offsets
    q.processAllAvailable()
    q.stop()

    # restart once more with NO new data: must deliver nothing new
    q = start_query()
    q.processAllAvailable()
    q.stop()

    batches = sorted(glob.glob(f"{sink}/b*"))
    rows = sorted(
        r["event_id"] for r in spark.read.parquet(f"{sink}/b*").collect()
    )
    assert rows == [1, 2, 3], f"each row exactly once, got {rows}"
    assert len(batches) == 2  # batch1 (rows 1,2) + batch2 (row 3); no replays


def test_streaming_merge_sink_maintains_snapshot(spark, tmp_path):
    """merge_parquet_sink: a changelog stream (upserts + tombstones)
    lands as an upsert-compacted parquet snapshot that equals the batch
    merge of the same changelog — and survives a restart without
    duplicating (idempotent versioned rewrites)."""
    import json as _json
    import os

    from flink_learning_practise_spark.sinks.streaming import (
        merge_parquet_sink,
        read_merge_snapshot,
    )

    src_dir = str(tmp_path / "merge_in")
    table = str(tmp_path / "merge_table")
    ckpt = str(tmp_path / "merge_ckpt")
    schema = "k long, id long, ts long, v string, del boolean"

    def drop(rows):
        os.makedirs(src_dir, exist_ok=True)
        fname = os.path.join(src_dir, f"part-{len(os.listdir(src_dir))}.jsonl")
        with open(fname, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    drop([
        {"k": 1, "id": 1, "ts": 10, "v": "a", "del": False},
        {"k": 2, "id": 2, "ts": 10, "v": "b", "del": False},
    ])
    src = spark.readStream.schema(schema).json(src_dir)
    q = merge_parquet_sink(
        src, table, ckpt, ["k"], "ts", "id", "del"
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    snap1 = {(r.k, r.v) for r in read_merge_snapshot(spark, table).collect()}
    assert snap1 == {(1, "a"), (2, "b")}

    # second run: an upsert, a tombstone, and a new key
    drop([
        {"k": 1, "id": 3, "ts": 20, "v": "a2", "del": False},
        {"k": 2, "id": 4, "ts": 20, "v": None, "del": True},
        {"k": 3, "id": 5, "ts": 20, "v": "c", "del": False},
    ])
    q = merge_parquet_sink(
        spark.readStream.schema(schema).json(src_dir),
        table, ckpt, ["k"], "ts", "id", "del",
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    snap2 = {(r.k, r.v) for r in read_merge_snapshot(spark, table).collect()}
    assert snap2 == {(1, "a2"), (3, "c")}
    # restart with NOTHING new: checkpoint prevents re-delivery, the
    # snapshot is unchanged
    q = merge_parquet_sink(
        spark.readStream.schema(schema).json(src_dir),
        table, ckpt, ["k"], "ts", "id", "del",
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    snap3 = {(r.k, r.v) for r in read_merge_snapshot(spark, table).collect()}
    assert snap3 == snap2
    # time travel: version 0 (the first batch) is still a complete,
    # immutable snapshot
    old = {(r.k, r.v) for r in read_merge_snapshot(spark, table, version=0).collect()}
    assert old == snap1


def test_streaming_merge_sink_replay_never_reads_own_version(spark, tmp_path):
    """Crash-replay safety: when batch N re-runs (its version committed
    but the checkpoint didn't), the merge must NOT read v{N} — it reads
    the last version with id < N and deterministically rewrites v{N}.
    Simulate the crashed attempt by planting a committed v0 with a
    ghost row, then running batch 0 from a fresh checkpoint: the ghost
    must vanish, not be merged or clobber-read mid-overwrite."""
    import json as _json
    import os

    from flink_learning_practise_spark.sinks.streaming import (
        merge_parquet_sink,
        read_merge_snapshot,
    )

    src_dir = str(tmp_path / "replay_in")
    table = str(tmp_path / "replay_table")
    schema = "k long, id long, ts long, v string, del boolean"

    # the "crashed attempt": a fully-committed v0 containing a row the
    # replay's input does NOT contain
    spark.createDataFrame(
        [(99, 99, 99, "ghost")], "k long, id long, ts long, v string"
    ).write.parquet(os.path.join(table, "v0"))

    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "part-0.jsonl"), "w") as f:
        f.write(_json.dumps({"k": 1, "id": 1, "ts": 10, "v": "a", "del": False}) + "\n")

    q = merge_parquet_sink(
        spark.readStream.schema(schema).json(src_dir),
        table, str(tmp_path / "replay_ckpt"), ["k"], "ts", "id", "del",
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {(r.k, r.v) for r in read_merge_snapshot(spark, table).collect()}
    assert got == {(1, "a")}  # ghost rewritten away, no self-read crash


def test_stream_semantic_dedup_matches_batch(spark, tmp_path):
    """Streaming SemDeDup vs snapshot: survivors of the stream must be
    exactly the rows with no over-τ cosine neighbor in their snapshot
    cluster — checked against a brute-force batch computation."""
    import json as _json
    import math
    import os

    dim = 4

    def vec(theta, axis):
        v = [0.0] * dim
        v[axis] = math.cos(theta)
        v[(axis + 1) % dim] = math.sin(theta)
        return v

    # snapshot: two clusters around axis 0 and axis 2
    snap_rows = [(100, vec(0.0, 0)), (101, vec(0.05, 0)), (102, vec(0.0, 2))]
    snapshot = spark.createDataFrame(
        snap_rows, "vec_id long, embedding array<double>"
    )
    cents = ([vec(0.0, 0), vec(0.0, 2)], [1.0, 1.0])

    # stream: 1 near-dup of cluster A, 1 novel-in-A, 1 near-dup of B
    stream_rows = [
        {"vec_id": 1, "embedding": vec(0.02, 0)},   # dup of 100
        {"vec_id": 2, "embedding": vec(0.7, 0)},    # same cluster, far
        {"vec_id": 3, "embedding": vec(-0.03, 2)},  # dup of 102
    ]
    src_dir = str(tmp_path / "sem_in")
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "p0.jsonl"), "w") as f:
        for r in stream_rows:
            f.write(_json.dumps(r) + "\n")

    src = spark.readStream.schema("vec_id long, embedding array<double>").json(src_dir)
    out = sp.stream_semantic_dedup(
        src, snapshot, tau=0.9, nlist=2, dim=dim, centroids=cents
    )
    assert out.isStreaming
    q = memory_sink(out.select("vec_id"), "sem_dedup_out", mode="append").start()
    sp.run_until_drained(q)
    survivors = {r.vec_id for r in spark.table("sem_dedup_out").collect()}

    # brute-force batch check with the same assignment rule
    batch = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in stream_rows],
        "vec_id long, embedding array<double>",
    )
    from flink_learning_practise_spark.operators.similarity import (
        assign_to_centroids,
    )

    s_assign = {r.vec_id: r.list_id for r in assign_to_centroids(
        snapshot, *cents, dim=dim).collect()}
    b_assign = {r.vec_id: r.list_id for r in assign_to_centroids(
        batch, *cents, dim=dim).collect()}
    def cosine(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)); nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)
    expect = set()
    for r in stream_rows:
        dup = any(
            b_assign[r["vec_id"]] == s_assign[sid]
            and cosine(r["embedding"], semb) >= 0.9
            for sid, semb in snap_rows
        )
        if not dup:
            expect.add(r["vec_id"])
    assert survivors == expect == {2}


def test_stream_dedup_shuffled_snapshot_variants_match_broadcast(spark, tmp_path):
    """The 100 TB scale path (broadcast_snapshot=False → shuffled
    stream-static hash join; snapshot never broadcast) must produce
    EXACTLY the survivors of the default broadcast path, for both the
    digest tier and the SemDeDup tier, and its plan must carry no
    BroadcastHashJoin for the snapshot side."""
    import json as _json
    import math
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        stream_incremental_dedup,
    )

    # --- digest tier ---
    path = str(tmp_path / "inc_sh_in")
    os.makedirs(path, exist_ok=True)
    rows = [
        {"doc_id": 10, "ts": "2024-01-01 00:00:01", "text": "already in corpus"},
        {"doc_id": 11, "ts": "2024-01-01 00:00:02", "text": "novel one"},
        {"doc_id": 12, "ts": "2024-01-01 00:00:03", "text": "repeated stream doc"},
        {"doc_id": 13, "ts": "2024-01-01 00:00:04", "text": "Repeated  STREAM doc"},
        {"doc_id": 14, "ts": "2024-01-01 00:00:05", "text": "novel two"},
    ]
    with open(f"{path}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))
    snapshot = spark.createDataFrame(
        [(1, "already in corpus"), (2, "other old doc")], "doc_id long, text string"
    )
    src = spark.readStream.schema("doc_id long, ts timestamp, text string").json(path)
    out = stream_incremental_dedup(
        src, snapshot, "doc_id", "text", "ts", broadcast_snapshot=False
    )
    q = out.writeStream.format("memory").queryName("inc_sh_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = sorted(r["doc_id"] for r in spark.table("inc_sh_out").collect())
    assert got == [11, 12, 14]  # identical to the broadcast-path test

    # bloom-prefiltered scale path: same survivors, tiny filter sizing
    # on purpose so the join still sees FP rows and must remove them
    out_b = stream_incremental_dedup(
        src, snapshot, "doc_id", "text", "ts",
        broadcast_snapshot=False, bloom_bits=256,
    )
    qb = out_b.writeStream.format("memory").queryName("inc_bl_out").outputMode("append").start()
    qb.processAllAvailable()
    qb.stop()
    got_b = sorted(r["doc_id"] for r in spark.table("inc_bl_out").collect())
    assert got_b == [11, 12, 14]

    # plan pin (batch equivalent of the per-micro-batch join): the
    # anti-join must be a ShuffledHashJoin, never a broadcast
    from pyspark.sql import functions as F

    from flink_learning_practise_spark.operators.text import normalize

    snap_h = snapshot.select(F.md5(normalize(F.col("text"))).alias("_h")).distinct()
    batch_side = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    ).withColumn("_h", F.md5(normalize(F.col("text"))))
    joined = batch_side.join(snap_h.hint("shuffle_hash"), "_h", "left_anti")
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in jplan and "BroadcastHashJoin" not in jplan

    # --- SemDeDup tier ---
    dim = 4

    def vec(theta, axis):
        v = [0.0] * dim
        v[axis] = math.cos(theta)
        v[(axis + 1) % dim] = math.sin(theta)
        return v

    snap_rows = [(100, vec(0.0, 0)), (101, vec(0.05, 0)), (102, vec(0.0, 2))]
    vsnapshot = spark.createDataFrame(snap_rows, "vec_id long, embedding array<double>")
    cents = ([vec(0.0, 0), vec(0.0, 2)], [1.0, 1.0])
    stream_rows = [
        {"vec_id": 1, "embedding": vec(0.02, 0)},
        {"vec_id": 2, "embedding": vec(0.7, 0)},
        {"vec_id": 3, "embedding": vec(-0.03, 2)},
    ]
    vdir = str(tmp_path / "sem_sh_in")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "p0.jsonl"), "w") as f:
        for r in stream_rows:
            f.write(_json.dumps(r) + "\n")
    vsrc = spark.readStream.schema("vec_id long, embedding array<double>").json(vdir)
    vout = sp.stream_semantic_dedup(
        vsrc, vsnapshot, tau=0.9, nlist=2, dim=dim, centroids=cents,
        broadcast_snapshot=False,
    )
    vq = memory_sink(vout.select("vec_id"), "sem_sh_out", mode="append").start()
    sp.run_until_drained(vq)
    survivors = {r.vec_id for r in spark.table("sem_sh_out").collect()}
    assert survivors == {2}  # identical to the broadcast-path test


def test_stream_semantic_dedup_carries_original_columns(spark, tmp_path):
    """Survivors keep EVERY original stream column (the documented
    contract), not just id+embedding."""
    import json as _json
    import os

    src_dir = str(tmp_path / "semcol_in")
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "p0.jsonl"), "w") as f:
        f.write(_json.dumps({"vec_id": 1, "embedding": [1.0, 0.0],
                             "ts": "2024-01-01", "payload": "keep-me"}) + "\n")
    snapshot = spark.createDataFrame(
        [(100, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    src = spark.readStream.schema(
        "vec_id long, embedding array<double>, ts string, payload string"
    ).json(src_dir)
    out = sp.stream_semantic_dedup(
        src, snapshot, tau=0.9, nlist=1, dim=2,
        centroids=([[1.0, 0.0]], [1.0]),
    )
    assert set(out.columns) == {"vec_id", "embedding", "ts", "payload"}
    q = memory_sink(out, "semcol_out", mode="append").start()
    sp.run_until_drained(q)
    rows = spark.table("semcol_out").collect()
    assert len(rows) == 1 and rows[0].payload == "keep-me"


def test_streaming_last_touch_matches_batch(spark, tmp_path):
    """Streaming attribution must agree with the batch operator (#99)
    when views precede purchases in batch order; state must be the
    latest view only (a newer view replaces the older)."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import (
        streaming_last_touch,
    )

    src = str(tmp_path / "attr_in")
    os.makedirs(src, exist_ok=True)
    b1 = [
        {"event_id": 1, "user_id": 7, "ts": "2024-01-01 00:00:00", "event_type": "view"},
        {"event_id": 2, "user_id": 7, "ts": "2024-01-01 00:10:00", "event_type": "view"},
        {"event_id": 3, "user_id": 7, "ts": "2024-01-01 00:20:00", "event_type": "purchase"},
        {"event_id": 4, "user_id": 8, "ts": "2024-01-01 00:00:00", "event_type": "purchase"},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, event_type string"
    ).json(src)
    out = streaming_last_touch(stream, window="30 minutes")
    q = out.writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    q.processAllAvailable()
    # batch 2: purchase attributable across batches to batch-1's view 2,
    # plus a purchase outside the 30-min lookback
    b2 = [
        {"event_id": 5, "user_id": 7, "ts": "2024-01-01 00:35:00", "event_type": "purchase"},
        {"event_id": 6, "user_id": 7, "ts": "2024-01-01 02:00:00", "event_type": "purchase"},
    ]
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    got = {
        r.purchase_id: (r.view_id, r.latency_sec)
        for r in spark.table("attr_out").collect()
    }
    assert got == {
        3: (2, 600),      # latest view (2) wins over view 1
        4: (None, None),  # user 8 never viewed
        5: (2, 1500),     # attribution carries across micro-batches
        6: (None, None),  # beyond the 30-min lookback
    }


def test_streaming_heavy_hitters_sharded_mg_bounds(spark, tmp_path):
    """Per-shard MG guarantees on an unbounded token stream: estimates
    are lower bounds within n_shard/(k+1), every shard-heavy token
    survives, and state stays <= k per shard. Verified against exact
    counts computed offline over both micro-batches."""
    import collections
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    texts1 = ["spark spark flink", "spark row batch", "flink flink row"]
    texts2 = ["spark batch batch", "row row spark flink"]
    src = str(tmp_path / "hh_in")
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps({"text": t}) for t in texts1))
    stream = spark.readStream.schema("text string").json(src)
    k = 3
    out = streaming_heavy_hitters(stream, "text", k=k, n_shards=2)
    q = out.writeStream.format("memory").queryName("hh_out").outputMode("update").start()
    q.processAllAvailable()
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps({"text": t}) for t in texts2))
    q.processAllAvailable()
    q.stop()

    rows = spark.table("hh_out").collect()
    # latest emission per shard = the one with max shard_tokens
    latest_n = {}
    for r in rows:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.shard_tokens)
    summary = {
        (r.shard, r.token): r.est
        for r in rows
        if r.shard_tokens == latest_n[r.shard]
    }
    # exact counts + shard assignment computed through the same hash
    from pyspark.sql import functions as F

    all_tokens = [
        t for txt in texts1 + texts2 for t in txt.split()
    ]
    exact = collections.Counter(all_tokens)
    shard_of = {
        r.t: r.s
        for r in spark.createDataFrame(
            [(t,) for t in exact], "t string"
        ).select("t", F.pmod(F.xxhash64("t"), F.lit(2)).cast("int").alias("s")).collect()
    }
    n_shard = collections.Counter()
    for t, c in exact.items():
        n_shard[shard_of[t]] += c
    # state bound: <= k counters per shard
    per_shard = collections.Counter(s for s, _ in summary)
    assert all(v <= k for v in per_shard.values())
    for (s, tok), est in summary.items():
        assert est <= exact[tok]
        assert exact[tok] - est <= n_shard[s] // (k + 1) + 1
    # completeness: shard-heavy tokens all present
    for tok, c in exact.items():
        s = shard_of[tok]
        if c * (k + 1) > n_shard[s]:
            assert (s, tok) in summary, f"heavy {tok} missing from shard {s}"


def test_streaming_ewma_matches_batch_fold(spark, tmp_path):
    """In-order streaming EWMA across two micro-batches must equal the
    batch array-fold operator on the union of the data; a late
    (behind-state) event must be dropped, not re-folded."""
    import json as _json
    import os

    from flink_learning_practise_spark.operators.transforms import ewma
    from flink_learning_practise_spark.streaming.stateful import streaming_ewma

    src = str(tmp_path / "ewma_in")
    os.makedirs(src, exist_ok=True)
    b1 = [
        {"user_id": 1, "ts": "2024-01-01 00:00:01", "event_id": 1, "value": 10.0},
        {"user_id": 1, "ts": "2024-01-01 00:00:02", "event_id": 2, "value": 20.0},
        {"user_id": 2, "ts": "2024-01-01 00:00:01", "event_id": 3, "value": 5.0},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long, value double"
    ).json(src)
    out = streaming_ewma(stream, alpha=0.25)
    q = out.writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    q.processAllAvailable()
    b2 = [
        {"user_id": 1, "ts": "2024-01-01 00:00:03", "event_id": 4, "value": 30.0},
        # late event behind user 1's state high-water mark: dropped
        {"user_id": 1, "ts": "2024-01-01 00:00:01", "event_id": 0, "value": 99.0},
        {"user_id": 2, "ts": "2024-01-01 00:00:05", "event_id": 5, "value": 15.0},
    ]
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in spark.table("ewma_out").collect()
    }
    # batch fold over the in-order union (late event 0 excluded)
    batch_rows = [r for r in b1 + b2 if r["event_id"] != 0]
    df = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["event_id"], r["value"]) for r in batch_rows],
        "user_id long, ts string, event_id long, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "event_id", "value")
    want = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma(df, ["user_id"], ["ts", "event_id"], "value", alpha=0.25).collect()
    }
    assert got == want and (1, 0) not in got


def test_sessionize_late_event_extends_session_start(spark, tmp_path):
    """A late in-watermark event that PRECEDES the stored session start
    must extend session_start backwards (review r4: the old fold
    absorbed it without the min-update, mis-reporting bounds)."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import sessionize

    src = str(tmp_path / "sess_late_in")
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/b1.json", "w") as f:
        f.write(_json.dumps(
            {"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0}) + "\n")
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).json(src)
    out = sessionize(stream, gap="30 minutes", watermark_delay="1 hour")
    q = out.writeStream.format("memory").queryName("sess_late_out").outputMode("update").start()
    q.processAllAvailable()
    # batch 2: in-watermark late event 20s BEFORE the stored start
    with open(f"{src}/b2.json", "w") as f:
        f.write(_json.dumps(
            {"user_id": 1, "ts": "2024-01-01 09:59:40", "value": 2.0}) + "\n")
    q.processAllAvailable()
    q.stop()
    rows = [r for r in spark.table("sess_late_out").collect() if not r.closed]
    latest = max(rows, key=lambda r: r.n_events)
    assert str(latest.session_start) == "2024-01-01 09:59:40"
    assert str(latest.session_end) == "2024-01-01 10:00:00"
    assert latest.n_events == 2 and latest.sum_value == 3.0


def test_streaming_last_touch_subsecond_matches_batch_truncation(spark, tmp_path):
    """Window check and latency must use SECOND-truncated arithmetic
    like the batch operator's unix_timestamp (review r4: ms arithmetic
    rejected view->purchase spans the batch op attributes)."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import (
        streaming_last_touch,
    )

    src = str(tmp_path / "attr_sub_in")
    os.makedirs(src, exist_ok=True)
    rows = [
        # span = 1800.8s in full precision, but 1800s after per-operand
        # second truncation -> batch attributes; streaming must agree
        {"event_id": 1, "user_id": 5, "ts": "2024-01-01 00:00:00.100", "event_type": "view"},
        {"event_id": 2, "user_id": 5, "ts": "2024-01-01 00:30:00.900", "event_type": "purchase"},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, event_type string"
    ).json(src)
    out = streaming_last_touch(stream, window="30 minutes")
    q = out.writeStream.format("memory").queryName("attr_sub_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = {r.purchase_id: (r.view_id, r.latency_sec)
           for r in spark.table("attr_sub_out").collect()}
    assert got == {2: (1, 1800)}


def test_streaming_activity_bitmap_matches_batch(spark, tmp_path):
    """Bitmap/streak state across two micro-batches: the LAST upsert per
    user must equal the batch gaps-and-islands computation on the union
    of the data (same mask, same streak), and repeated days must not
    change the mask (idempotent bit-or)."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import (
        streaming_activity_bitmap,
    )

    src = str(tmp_path / "bm_in")
    os.makedirs(src, exist_ok=True)
    b1 = [
        {"user_id": 1, "ts": "2024-01-01 10:00:00"},
        {"user_id": 1, "ts": "2024-01-02 09:00:00"},
        {"user_id": 1, "ts": "2024-01-02 23:00:00"},  # repeat day
        {"user_id": 2, "ts": "2024-01-05 00:00:00"},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema("user_id long, ts timestamp").json(src)
    out = streaming_activity_bitmap(stream, epoch_date="2024-01-01")
    q = (
        out.writeStream.format("memory")
        .queryName("bm_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    mid = {r.user_id: r for r in spark.table("bm_out").collect()}
    assert mid[1].day_mask == 0b11 and mid[1].longest_streak == 2
    assert mid[2].day_mask == 1 << 4 and mid[2].longest_streak == 1
    b2 = [
        {"user_id": 1, "ts": "2024-01-03 05:00:00"},  # extends streak to 3
        {"user_id": 1, "ts": "2024-01-07 05:00:00"},  # new island
        {"user_id": 2, "ts": "2024-01-05 12:00:00"},  # repeat day only
        {"user_id": 3, "ts": "2023-12-25 00:00:00"},  # before epoch: ignored
    ]
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    rows = spark.table("bm_out").collect()
    # last upsert per user wins (update-mode MERGE contract)
    last = {}
    for r in rows:
        last[r.user_id] = r
    assert last[1].day_mask == 0b1000111
    assert last[1].days_active == 4
    assert last[1].longest_streak == 3
    assert last[2].day_mask == 1 << 4  # unchanged by the repeat day
    assert 3 not in last  # pre-epoch event created no state and no row


def test_streaming_cumulate_matches_batch(spark, tmp_path):
    """CUMULATE upserts across two micro-batches: the LAST upsert per
    (window, key) must equal the batch cumulate_window on the union of
    the data — including a late-but-inside-watermark event landing in
    an interior slice (upsert semantics absorb the correction), and
    windows untouched by a batch must NOT re-emit."""
    import json as _json
    import os

    from flink_learning_practise_spark.operators.windows import cumulate_window
    from flink_learning_practise_spark.streaming.stateful import (
        streaming_cumulate_window,
    )

    src = str(tmp_path / "cum_in")
    os.makedirs(src, exist_ok=True)
    b1 = [
        {"ts": "2024-01-01 00:05:00", "event_type": "click", "value": 1.5},
        {"ts": "2024-01-01 00:25:00", "event_type": "click", "value": 2.25},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).json(src)
    out = streaming_cumulate_window(
        stream, max_size_sec=3600, step_sec=600, watermark_delay="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cum_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    n_after_b1 = spark.table("cum_out").count()
    assert n_after_b1 == 6  # slices 0..5 of the click frame
    b2 = [
        # late (inside watermark) interior-slice event: corrects windows >= [,00:20)
        {"ts": "2024-01-01 00:15:00", "event_type": "click", "value": 0.5},
        {"ts": "2024-01-01 00:45:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01 00:35:00", "event_type": "view", "value": 2.0},
    ]
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    rows = spark.table("cum_out").collect()
    # click batch-2 upserts start at slice 1 — window [00:00,00:10) must
    # not re-emit (its only row is the batch-1 value)
    w010 = [
        r for r in rows
        if r.event_type == "click" and r.window_end.minute == 10
    ]
    assert len(w010) == 1 and w010[0].n_events == 1 and w010[0].sum_value == 1.5
    last = {}
    for r in rows:
        last[(r.window_start, r.window_end, r.event_type)] = (
            r.n_events,
            r.sum_value,
        )
    union = spark.createDataFrame(
        [(r["ts"], r["event_type"], r["value"]) for r in b1 + b2],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in cumulate_window(
            union, "ts", 3600, 600, keys=["event_type"], value_col="value"
        ).collect()
    }
    assert last == batch


def test_streaming_ewma_null_value_poisons_not_crashes(spark, tmp_path):
    """A null value row must not kill the query (q9(NaN) raised before
    the r5 fix) — it poisons the key's recursion and reaches the sink
    as SQL NULL, mirroring the batch fold."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import streaming_ewma

    src = str(tmp_path / "ewma_null_in")
    os.makedirs(src, exist_ok=True)
    b1 = [
        {"user_id": 1, "ts": "2024-01-01 00:00:01", "event_id": 1, "value": 8.0},
        {"user_id": 1, "ts": "2024-01-01 00:00:02", "event_id": 2, "value": None},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long, value double"
    ).json(src)
    q = (
        streaming_ewma(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("ewma_null_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    b2 = [  # second batch: the carried NaN state must keep poisoning
        {"user_id": 1, "ts": "2024-01-01 00:00:03", "event_id": 3, "value": 2.0},
    ]
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    got = {r.event_id: r.ewma for r in spark.table("ewma_null_out").collect()}
    assert got[1] == 8.0
    assert got[2] is None and got[3] is None


def test_streaming_cumulate_null_value_counts_not_crashes(spark, tmp_path):
    """Null value: the event COUNTS but adds nothing to the sum — the
    batch aggregate's null semantics (math.floor(NaN) crashed pre-r5)."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import (
        streaming_cumulate_window,
    )

    src = str(tmp_path / "cum_null_in")
    os.makedirs(src, exist_ok=True)
    rows = [
        {"ts": "2024-01-01 00:05:00", "event_type": "click", "value": 1.5},
        {"ts": "2024-01-01 00:06:00", "event_type": "click", "value": None},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).json(src)
    q = (
        streaming_cumulate_window(stream, max_size_sec=3600, step_sec=600)
        .writeStream.format("memory")
        .queryName("cum_null_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows_out = spark.table("cum_null_out").collect()
    first = [r for r in rows_out if r.window_end.minute == 10][0]
    assert first.n_events == 2 and first.sum_value == 1.5


def test_streaming_activity_bitmap_day63_wraps_like_batch(spark, tmp_path):
    """Epoch-day 63 sets bit 63: the mask must store as the NEGATIVE
    two's-complement long (the batch twin's shiftleft wraparound), not
    overflow the BIGINT state schema (crashed pre-r5)."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.stateful import (
        streaming_activity_bitmap,
    )

    src = str(tmp_path / "bm63_in")
    os.makedirs(src, exist_ok=True)
    rows = [
        {"user_id": 1, "ts": "2024-01-01 12:00:00"},  # day 0
        {"user_id": 1, "ts": "2024-03-04 12:00:00"},  # day 63 (2024 is a leap year)
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema("user_id long, ts timestamp").json(src)
    q = (
        streaming_activity_bitmap(stream, epoch_date="2024-01-01")
        .writeStream.format("memory")
        .queryName("bm63_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    b2 = [{"user_id": 1, "ts": "2024-03-03 12:00:00"}]  # day 62, reload negative state
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    rows_out = spark.table("bm63_out").collect()
    last = rows_out[-1]
    expected_unsigned = 1 | (1 << 62) | (1 << 63)
    assert last.day_mask == expected_unsigned - (1 << 64)  # negative long
    assert last.days_active == 3
    assert last.longest_streak == 2


def test_streaming_drift_monitor_psi(spark, tmp_path):
    """Windowed histogram + PSI vs a Python-computed expectation: two
    micro-batches, out-of-order rows inside the watermark, a sentinel
    advancing the watermark to close the first window; closed-window
    PSI must equal the direct formula on the union of that window's
    data, including zero-mass reference buckets."""
    import json as _json
    import math
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        psi_batch,
        windowed_value_histogram,
    )

    src = str(tmp_path / "drift_in")
    os.makedirs(src, exist_ok=True)
    # window [00:00, 00:10): values in buckets 0 (0-25), 1 (25-50), 3 (75-100)
    b1 = [
        {"ts": "2024-01-01 00:01:00", "value": 10.0},
        {"ts": "2024-01-01 00:03:00", "value": 30.0},
        {"ts": "2024-01-01 00:02:00", "value": 12.0},  # out of order
        {"ts": "2024-01-01 00:09:00", "value": 90.0},
        {"ts": "2024-01-01 00:05:00", "value": None},  # dropped
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema("ts timestamp, value double").json(src)
    hist = windowed_value_histogram(
        stream, window="10 minutes", watermark_delay="1 minute", n_bins=4
    )
    ref = {0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25}
    out_rows = []

    def sink(batch, _bid):
        out_rows.extend(psi_batch(batch, ref).collect())

    q = hist.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    # sentinel far ahead: watermark passes 00:10, closing the window
    with open(f"{src}/b2.json", "w") as f:
        f.write(_json.dumps({"ts": "2024-01-01 01:00:00", "value": 50.0}))
    q.processAllAvailable()
    q.stop()
    closed = [r for r in out_rows if r.window_start.minute == 0 and r.window_start.hour == 0]
    assert len(closed) == 1
    r = closed[0]
    assert r.n_events == 4
    eps = 1e-6
    p = {0: 0.5, 1: 0.25, 2: 0.0, 3: 0.25}
    want = round(sum(
        (p[b] - ref[b]) * math.log((p[b] + eps) / (ref[b] + eps)) for b in ref
    ), 9)
    assert abs(r.psi - want) < 1e-12


def test_psi_batch_sees_appeared_mass(spark):
    """A bucket observed in the window but ABSENT from ref_shares must
    enter the PSI with ref_share=0 (appeared mass is the strongest
    drift signal — the r5 review case where a ref-keys-only grid
    dropped it and reported 'stable')."""
    import math

    from flink_learning_practise_spark.streaming.pipeline import psi_batch

    batch = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 00:10:00", b, n)
         for b, n in [(0, 5), (1, 4), (2, 1)]],
        "window_start string, window_end string, bucket int, n long",
    ).selectExpr(
        "cast(window_start as timestamp) window_start",
        "cast(window_end as timestamp) window_end",
        "bucket", "n",
    )
    ref = {0: 0.5, 1: 0.5}  # reference never saw bucket 2
    r = psi_batch(batch, ref).collect()[0]
    eps = 1e-6
    p = {0: 0.5, 1: 0.4, 2: 0.1}
    rs = {0: 0.5, 1: 0.5, 2: 0.0}
    want = round(sum(
        (p[b] - rs[b]) * math.log((p[b] + eps) / (rs[b] + eps)) for b in p
    ), 9)
    assert r.n_events == 10
    assert abs(r.psi - want) < 1e-12
    assert r.psi > 0.25  # this IS a major shift — must not read stable


def test_stream_ann_probe_full_probe_matches_brute_force(spark, tmp_path):
    """With nprobe = nlist every list is probed, so the per-batch
    top-k must equal the brute-force cosine top-k exactly (same
    (cosine DESC, id ASC) tie rule)."""
    import json as _json
    import math
    import os
    import random

    dim = 8
    rng = random.Random(5)

    def rvec():
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        return v

    idx_rows = [(i, rvec()) for i in range(40)]
    index = spark.createDataFrame(idx_rows, "vec_id long, embedding array<double>")

    q_rows = [{"vec_id": 1000 + i, "embedding": rvec()} for i in range(5)]
    src_dir = str(tmp_path / "ann_in")
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "p0.jsonl"), "w") as f:
        for r in q_rows:
            f.write(_json.dumps(r) + "\n")
    src = spark.readStream.schema("vec_id long, embedding array<double>").json(src_dir)

    out = sp.stream_ann_probe(src, index, nlist=4, nprobe=4, dim=dim)
    assert out.isStreaming

    got: dict = {}

    def sink(batch, _bid):
        for r in sp.ann_topk_batch(batch, k=3).collect():
            got.setdefault(r.vec_id, []).append((r.rank, r.match_id, r.cosine))

    q = (out.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ann_ck"))
         .start())
    sp.run_until_drained(q)

    def cosine(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    for qr in q_rows:
        brute = sorted(
            ((cosine(qr["embedding"], e), mid) for mid, e in idx_rows),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        want = [(i + 1, mid, c) for i, (c, mid) in enumerate(brute)]
        assert sorted(got[qr["vec_id"]]) == want, qr["vec_id"]


def test_stream_ann_probe_partial_probe_subset_and_shuffled_variant(spark, tmp_path):
    """nprobe < nlist: candidates must be a subset of the full probe's
    (the IVF contract), and the shuffled-index scale path must emit
    exactly the broadcast path's rows with no broadcast of the index."""
    import json as _json
    import os
    import random

    dim = 8
    rng = random.Random(9)
    idx_rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(30)]
    index = spark.createDataFrame(idx_rows, "vec_id long, embedding array<double>")
    q_rows = [{"vec_id": 2000 + i,
               "embedding": [rng.uniform(-1, 1) for _ in range(dim)]}
              for i in range(4)]
    src_dir = str(tmp_path / "ann2_in")
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "p0.jsonl"), "w") as f:
        for r in q_rows:
            f.write(_json.dumps(r) + "\n")

    def run(nprobe, broadcast):
        src = spark.readStream.schema(
            "vec_id long, embedding array<double>").json(src_dir)
        out = sp.stream_ann_probe(
            src, index, nlist=4, nprobe=nprobe, dim=dim,
            broadcast_index=broadcast,
        )
        rows = []
        q = (out.writeStream
             .foreachBatch(lambda b, _i: rows.extend(
                 (r.vec_id, r.match_id, r.cosine) for r in b.collect()))
             .option("checkpointLocation",
                     str(tmp_path / f"ck_{nprobe}_{broadcast}"))
             .start())
        sp.run_until_drained(q)
        return set(rows)

    full = run(4, True)
    partial = run(2, True)
    assert partial and partial < full
    shuffled = run(2, False)
    assert shuffled == partial


def test_streaming_holt_matches_batch_fold(spark, tmp_path):
    """In-order streaming Holt across two micro-batches must equal the
    batch two-state fold on the union; a behind-state event drops; a
    null value poisons the key's remaining steps as SQL NULL."""
    import json as _json
    import os

    from flink_learning_practise_spark.operators.transforms import holt_linear
    from flink_learning_practise_spark.streaming.stateful import streaming_holt

    src = str(tmp_path / "holt_in")
    os.makedirs(src, exist_ok=True)
    b1 = [
        {"user_id": 1, "ts": "2024-01-01 00:00:01", "event_id": 1, "value": 10.0},
        {"user_id": 1, "ts": "2024-01-01 00:00:02", "event_id": 2, "value": 14.0},
        {"user_id": 2, "ts": "2024-01-01 00:00:01", "event_id": 3, "value": 5.0},
        {"user_id": 3, "ts": "2024-01-01 00:00:01", "event_id": 6, "value": 4.0},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long, value double"
    ).json(src)
    out = streaming_holt(stream, alpha=0.5, beta=0.3)
    q = (out.writeStream.format("memory").queryName("holt_out")
         .outputMode("append").start())
    q.processAllAvailable()
    b2 = [
        {"user_id": 1, "ts": "2024-01-01 00:00:03", "event_id": 4, "value": 18.0},
        # behind user 1's high-water mark: dropped
        {"user_id": 1, "ts": "2024-01-01 00:00:01", "event_id": 0, "value": 99.0},
        # null poisons user 3 from here on
        {"user_id": 3, "ts": "2024-01-01 00:00:02", "event_id": 7, "value": None},
        {"user_id": 3, "ts": "2024-01-01 00:00:03", "event_id": 8, "value": 6.0},
    ]
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.event_id): (r.level, r.trend)
        for r in spark.table("holt_out").collect()
    }
    batch_rows = [r for r in b1 + b2 if r["event_id"] != 0]
    df = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["event_id"], r["value"]) for r in batch_rows],
        "user_id long, ts string, event_id long, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "event_id", "value")
    want = {
        (r.user_id, r.event_id): (r.level, r.trend)
        for r in holt_linear(
            df, ["user_id"], ["ts", "event_id"], "value", alpha=0.5, beta=0.3
        ).collect()
    }
    assert got == want and (1, 0) not in got
    assert got[(3, 7)] == (None, None) and got[(3, 8)] == (None, None)


def test_streaming_seasonal_anomaly_matches_batch(spark, tmp_path):
    """seasonal_anomaly_stream counts exactly the events the batch
    formula flags: baseline trained on a static history, stream scored
    against it, windowed counts compared to a hand/batch recomputation
    (including out-of-order arrivals inside the watermark)."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        seasonal_anomaly_stream,
        seasonal_baseline,
    )

    # history: type A at hour 0 has mu=10, sd=tight; hour 1 mu=100
    hist_rows = (
        [("2024-01-01 00:%02d:00" % m, "A", 10.0 + (m % 3) - 1) for m in range(30)]
        + [("2024-01-01 01:%02d:00" % m, "A", 100.0 + (m % 3) - 1) for m in range(30)]
        + [("2024-01-01 00:%02d:00" % m, "B", 50.0) for m in range(10)]
    )
    hist = spark.createDataFrame(hist_rows, "ts string, event_type string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    base = seasonal_baseline(hist)
    rows = {(r.event_type, r.hour): (r._mu, r._sd) for r in base.collect()}
    mu_a0, sd_a0 = rows[("A", 0)]

    src = str(tmp_path / "anom_in")
    os.makedirs(src, exist_ok=True)
    live = [
        {"ts": "2024-01-02 00:01:00", "event_type": "A", "value": 10.0},          # normal
        {"ts": "2024-01-02 00:05:00", "event_type": "A", "value": 999.0},         # anomaly at hour 0
        {"ts": "2024-01-02 00:03:00", "event_type": "A", "value": mu_a0 + 3 * sd_a0},  # boundary: NOT > mu+3sd
        {"ts": "2024-01-02 00:04:00", "event_type": "A", "value": 100.0},         # anomalous at hour 0 (normal at hour 1!)
        {"ts": "2024-01-02 00:02:00", "event_type": "B", "value": 50.0},          # sd=0, not above
        {"ts": "2024-01-02 00:06:00", "event_type": "B", "value": 50.5},          # sd=0 -> any excess flags
        {"ts": "2024-01-02 00:07:00", "event_type": "C", "value": 1e9},           # unseen cell: inner join drops
        {"ts": "2024-01-02 00:08:00", "event_type": "A", "value": None},          # null drops
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in live))
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").json(src)
    out = seasonal_anomaly_stream(stream, base, window="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("seasonal_anom")
        .start()
    )
    q.processAllAvailable()
    with open(f"{src}/b2.json", "w") as f:
        f.write(_json.dumps({"ts": "2024-01-02 02:00:00", "event_type": "A", "value": 10.0}))
    q.processAllAvailable()
    q.stop()
    got = {
        (r.event_type): r.n_anomalies
        for r in spark.sql(
            "SELECT * FROM seasonal_anom WHERE window_start = '2024-01-02 00:00:00'"
        ).collect()
    }
    # A: 999.0 and 100.0 flag (calendar-aware: 100 is normal at hour 1,
    # anomalous at hour 0); the exact mu+3sd boundary does NOT flag
    assert got.get("A") == 2
    # B: sd=0 so 50.5 > mu flags
    assert got.get("B") == 1
    # C never appears (unseen cell)
    assert "C" not in got


def test_streaming_burst_alerts(spark, tmp_path):
    """burst_alert_stream emits exactly the (window, key) cells at/over
    the threshold — sliding windows, out-of-order arrival inside the
    watermark, sub-threshold keys silent."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        burst_alert_stream,
    )

    src = str(tmp_path / "burst_in")
    os.makedirs(src, exist_ok=True)
    # user 1 fires 4 events inside [00:00:00, 00:01:00); user 2 only 1
    b1 = [
        {"ts": "2024-01-01 00:00:05", "user_id": 1},
        {"ts": "2024-01-01 00:00:20", "user_id": 1},
        {"ts": "2024-01-01 00:00:10", "user_id": 1},  # out of order
        {"ts": "2024-01-01 00:00:40", "user_id": 1},
        {"ts": "2024-01-01 00:00:30", "user_id": 2},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema("ts timestamp, user_id long").json(src)
    out = burst_alert_stream(
        stream, window="60 seconds", slide="30 seconds", threshold=3
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("burst_alerts")
        .start()
    )
    q.processAllAvailable()
    with open(f"{src}/b2.json", "w") as f:
        f.write(_json.dumps({"ts": "2024-01-01 01:00:00", "user_id": 9}))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT * FROM burst_alerts ORDER BY window_start, user_id"
    ).collect()
    got = {(str(r.window_start), r.user_id): r.n_events for r in rows}
    # sliding 60s/30s: user 1's 4 events all fall in [00:00, 00:01) and
    # the first three also in [23:59:30->00:00:30) window starting
    # 2023-12-31 23:59:30; the [00:00:30, 00:01:30) window holds only 1.
    assert got[("2024-01-01 00:00:00", 1)] == 4
    assert got[("2023-12-31 23:59:30", 1)] == 3
    # no alert for the 1-event window or for user 2 anywhere
    assert ("2024-01-01 00:00:30", 1) not in got
    assert not any(u == 2 for (_, u) in got)


def test_stream_hybrid_rrf_matches_batch(spark, sf_small, tmp_path):
    """Streaming hybrid retrieval serving (#210s) must reproduce the
    batch q_hybrid_rrf result for the same fixed query: terms =
    BM25_TERMS, embedding = vec 0's, self-excluded by id. The indexes
    are static snapshots of the same corpus."""
    from flink_learning_practise_spark.datasets import load
    from flink_learning_practise_spark.plans import llm_pipeline as llm

    docs = load(spark, sf_small, "documents")
    emb = load(spark, sf_small, "embeddings")
    indexes = sp.HybridIndexes(docs, emb)

    qvec = (
        emb.filter(F.col("vec_id") == llm.RRF_QUERY_VEC_ID)
        .select("embedding")
        .collect()[0][0]
    )
    qdir = str(tmp_path / "hybrid_queries")
    write_events(
        qdir,
        [
            {
                "query_id": llm.RRF_QUERY_VEC_ID,
                # repeated term: BM25 sums per UNIQUE term, so the
                # duplicate must not double its postings (review r8)
                "terms": list(llm.BM25_TERMS) + [llm.BM25_TERMS[0]],
                "embedding": [float(x) for x in qvec],
            }
        ],
    )
    stream = file_stream_source(
        spark,
        qdir,
        "query_id BIGINT, terms ARRAY<STRING>, embedding ARRAY<FLOAT>",
        fmt="json",
    )
    assert stream.isStreaming
    got = {}

    def sink(df, batch_id):
        for r in df.collect():
            got[r["doc_id"]] = (
                r["sparse_rank"], r["dense_rank"], r["rrf_score"]
            )

    q = sp.stream_hybrid_rrf(
        stream,
        indexes,
        sink,
        checkpoint=str(tmp_path / "hybrid_ckpt"),
        k=llm.RRF_TOP_N,
        rrf_k=llm.RRF_K,
    ).start()
    sp.run_until_drained(q)

    expect = {
        r.doc_id: (r.sparse_rank, r.dense_rank, r.rrf_score)
        for r in llm.hybrid_rrf(spark, sf_small).collect()
    }
    assert got == expect
    assert len(got) == llm.RRF_TOP_N


def test_stream_rerank_serving_matches_batch(spark, sf_small, tmp_path):
    """Streaming inference-reranked serving (#234s) must reproduce the
    batch q_rerank_inference result bit-for-bit for the same fixed
    query: the fused #210s list re-scored by the deterministic
    cross-encoder, pruned to the pool before inference."""
    from flink_learning_practise_spark.datasets import load
    from flink_learning_practise_spark.plans import llm_pipeline as llm

    docs = load(spark, sf_small, "documents")
    emb = load(spark, sf_small, "embeddings")
    indexes = sp.HybridIndexes(docs, emb)

    qvec = (
        emb.filter(F.col("vec_id") == llm.RRF_QUERY_VEC_ID)
        .select("embedding")
        .collect()[0][0]
    )
    qdir = str(tmp_path / "rerank_queries")
    write_events(
        qdir,
        [
            {
                "query_id": llm.RRF_QUERY_VEC_ID,
                "terms": list(llm.BM25_TERMS),
                "embedding": [float(x) for x in qvec],
            }
        ],
    )
    stream = file_stream_source(
        spark,
        qdir,
        "query_id BIGINT, terms ARRAY<STRING>, embedding ARRAY<FLOAT>",
        fmt="json",
    )
    got = {}

    def sink(df, batch_id):
        for r in df.collect():
            got[r["doc_id"]] = (
                r["rrf_rank"], r["ce_rank"], r["rank_shift"], r["ce_score"]
            )

    q = sp.stream_rerank_serving(
        stream,
        indexes,
        docs.select("doc_id", "text"),
        sink,
        checkpoint=str(tmp_path / "rerank_ckpt"),
        k=llm.RRF_TOP_N,
        rrf_k=llm.RRF_K,
    ).start()
    sp.run_until_drained(q)

    expect = {
        r.doc_id: (r.rrf_rank, r.ce_rank, r.rank_shift, r.ce_score)
        for r in llm.rerank_inference(spark, sf_small).collect()
    }
    assert got == expect
    assert len(got) == llm.RRF_TOP_N


def test_streaming_pack_matches_batch(spark, sf_small, tmp_path):
    """Streaming sequence packing (#71s) must reproduce the batch
    packer's per-pack rollup when docs arrive in doc_id order — state
    (running token count) carries across micro-batches: the corpus is
    dropped as two files with processAllAvailable between drops."""
    from flink_learning_practise_spark.datasets import load
    from flink_learning_practise_spark.plans.curation import (
        PACK_CAPACITY,
        pack_sequences,
    )
    from flink_learning_practise_spark.streaming.stateful import streaming_pack

    docs = [
        r.asDict()
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
        .collect()
    ]
    cut = len(docs) // 2
    src_dir = str(tmp_path / "pack_docs")
    write_events(src_dir, docs[:cut])

    stream = file_stream_source(
        spark,
        src_dir,
        "doc_id BIGINT, source STRING, text STRING",
        fmt="json",
    )
    out = streaming_pack(stream, capacity=PACK_CAPACITY)
    assert out.isStreaming
    q = memory_sink(out, "pack_stream", mode="append").start()
    q.processAllAvailable()
    write_events(src_dir, docs[cut:])  # second drop, live query
    q.processAllAvailable()
    q.stop()

    got = {}
    for r in (
        spark.table("pack_stream")
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .collect()
    ):
        got[(r.source, r.pack_id)] = (
            r.n_docs, r.n_tokens, r.first_doc, r.last_doc
        )
    expect = {
        (r.source, r.pack_id): (r.n_docs, r.n_tokens, r.first_doc, r.last_doc)
        for r in pack_sequences(spark, sf_small).collect()
    }
    assert got == expect
    # the split point must actually exercise cross-batch state: at
    # least one pack spans the two drops
    spanning = [
        k for k, (_, _, first, last) in expect.items()
        if first < docs[cut]["doc_id"] <= last
    ]
    assert spanning


def test_streaming_order_backlog_matches_sweep(spark, tmp_path):
    """Two micro-batches of order-lifecycle events fold into the same
    backlog step function the batch sweep line (#231) produces: +1 on
    the placement day, −1 the day AFTER the final shipment, cumulative
    in event-time order across batches; the monthly rollup matches the
    hand-computed sweep on the union of the data."""
    import datetime as _dt
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        BacklogSink,
        stream_daily_order_deltas,
    )

    src = str(tmp_path / "bl_in")
    os.makedirs(src, exist_ok=True)
    b1 = [
        {"ts": "2024-01-01 08:00:00", "order_id": 1, "kind": "placed"},
        {"ts": "2024-01-01 09:00:00", "order_id": 2, "kind": "placed"},
        {"ts": "2024-01-03 10:00:00", "order_id": 1, "kind": "shipped_final"},
        {"ts": "2024-01-05 10:00:00", "order_id": 3, "kind": "placed"},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b1))
    stream = spark.readStream.schema(
        "ts timestamp, order_id long, kind string"
    ).json(src)
    sink = BacklogSink()
    q = (
        stream_daily_order_deltas(stream, watermark_delay="1 day")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    b2 = [
        {"ts": "2024-01-31 10:00:00", "order_id": 2, "kind": "shipped_final"},
        {"ts": "2024-02-02 09:00:00", "order_id": 4, "kind": "placed"},
        {"ts": "2024-02-20 10:00:00", "order_id": 3, "kind": "shipped_final"},
        {"ts": "2024-02-20 11:00:00", "order_id": 4, "kind": "shipped_final"},
        # watermark pusher so every prior day finalizes
        {"ts": "2024-03-05 00:00:00", "order_id": 5, "kind": "placed"},
        {"ts": "2024-03-09 00:00:00", "order_id": 5, "kind": "shipped_final"},
        {"ts": "2024-03-20 00:00:00", "order_id": 6, "kind": "placed"},
        # April pusher: advances the watermark past every March day so
        # the whole March step function finalizes; its own day stays
        # open, so April is the (allowed-missing) final month
        {"ts": "2024-04-25 00:00:00", "order_id": 7, "kind": "placed"},
    ]
    with open(f"{src}/b2.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()

    # hand sweep on the union: delta map day -> net
    events = b1 + b2
    deltas: dict = {}
    for e in events:
        d = _dt.date.fromisoformat(e["ts"][:10])
        if e["kind"] == "shipped_final":
            d = d + _dt.timedelta(days=1)
            deltas[d] = deltas.get(d, 0) - 1
        else:
            deltas[d] = deltas.get(d, 0) + 1
    total, expect_monthly = 0, {}
    for d in sorted(deltas):
        total += deltas[d]
        m = d.replace(day=1)
        peak, _ = expect_monthly.get(m, (total, total))
        expect_monthly[m] = (max(peak, total), total)

    got = sink.monthly()
    # the stream can only fold days whose window FINALIZED (watermark
    # passed); the last event day may still be open — compare the
    # months the sink emitted, and require it emitted every month the
    # sweep has except possibly the final one
    assert got, "sink saw no finalized days"
    for m, pe in got.items():
        assert expect_monthly[m] == pe, (m, pe, expect_monthly[m])
    assert set(expect_monthly) - set(got) <= {max(expect_monthly)}
    # cumulative order: backlog after January must be 1 (orders 1, 2
    # shipped; order 3 open)
    jan = _dt.date(2024, 1, 1)
    assert got[jan][0] == 2  # peak two concurrent open orders


def test_streaming_token_js_drift(spark, tmp_path):
    """Token-JS drift per closed window vs a fixed reference: an
    identical-distribution window scores ~0, a fully-disjoint window
    scores exactly ln 2, and a mixed window matches the hand-computed
    closed form."""
    import json as _json
    import math
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        token_js_batch,
        token_reference,
        windowed_token_counts,
    )

    ref_docs = spark.createDataFrame(
        [("a b a b",), ("a b",)], "text string"
    )  # ref: P(a)=P(b)=0.5
    ref = token_reference(ref_docs)

    src = str(tmp_path / "js_in")
    os.makedirs(src, exist_ok=True)
    rows = [
        # window 1 [00:00, 00:10): same distribution as ref -> js ~ 0
        {"ts": "2024-01-01 00:01:00", "text": "a b a b"},
        # window 2 [00:10, 00:20): disjoint vocab -> js = ln 2
        {"ts": "2024-01-01 00:11:00", "text": "x y x y"},
        # window 3 [00:20, 00:30): mixed -> hand-computed below
        {"ts": "2024-01-01 00:21:00", "text": "a x"},
        # watermark pusher so all three close
        {"ts": "2024-01-01 01:00:00", "text": "z"},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema("ts timestamp, text string").json(src)
    got: dict = {}

    def sink(batch, _bid):
        for r in token_js_batch(batch, ref).collect():
            got[r.window_start.minute] = (
                r.n_tokens,
                r.n_shared_tokens,
                r.js_nats,
            )

    q = (
        windowed_token_counts(
            stream, window="10 minutes", watermark_delay="1 minute"
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert set(got) >= {0, 10, 20}
    assert got[0] == (4, 2, 0.0)  # identical distribution
    n, s, js = got[10]
    assert (n, s) == (4, 0) and abs(js - math.log(2)) < 1e-9  # disjoint
    # window 3: P(a)=P(x)=0.5 vs ref P(a)=P(b)=0.5; shared = {a}
    # js = 0.5*(pa*ln(2pa/(pa+ra)) + (1-pa)*ln2)
    #    + 0.5*(ra*ln(2ra/(pa+ra)) + (1-ra)*ln2) with pa=ra=0.5
    expect = 0.5 * (0.0 + 0.5 * math.log(2)) * 2
    n, s, js = got[20]
    assert (n, s) == (2, 1) and abs(js - expect) < 1e-9


def test_streaming_dim_drift_flags_shifted_dim(spark, tmp_path):
    """Dimension drift per closed window vs a batch reference: a window
    drawn from the reference distribution scores ~0 everywhere; a
    window with ONE coordinate shifted by many reference sigmas flags
    exactly that dim."""
    import json as _json
    import os

    from flink_learning_practise_spark.streaming.pipeline import (
        dim_drift_batch,
        windowed_dim_stats,
    )

    # reference: dim 1 mean 0 var 0.01, dim 2 mean 1 var 0.01, dim 3
    # mean -1 var 0.01 (the #223 output shape)
    ref = spark.createDataFrame(
        [(1, 0.0, 0.01), (2, 1.0, 0.01), (3, -1.0, 0.01)],
        "dim int, mean_val double, var_val double",
    )
    src = str(tmp_path / "dd_in")
    os.makedirs(src, exist_ok=True)
    rows = [
        # window 1: on-reference vectors
        {"ts": "2024-01-01 00:01:00", "embedding": [0.0, 1.0, -1.0]},
        {"ts": "2024-01-01 00:02:00", "embedding": [0.1, 0.9, -1.1]},
        {"ts": "2024-01-01 00:03:00", "embedding": [-0.1, 1.1, -0.9]},
        # window 2: dim 2 shifted by +1 (10 reference sigmas)
        {"ts": "2024-01-01 00:11:00", "embedding": [0.0, 2.0, -1.0]},
        {"ts": "2024-01-01 00:12:00", "embedding": [0.0, 2.0, -1.0]},
        # pusher closes both windows
        {"ts": "2024-01-01 01:00:00", "embedding": [0.0, 1.0, -1.0]},
    ]
    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "ts timestamp, embedding array<float>"
    ).json(src)
    got: dict = {}

    def sink(batch, _bid):
        for r in dim_drift_batch(batch, ref).collect():
            got[r.window_start.minute] = (
                r.n_dims, r.worst_dim, r.max_z, r.n_flagged,
            )

    q = (
        windowed_dim_stats(
            stream, window="10 minutes", watermark_delay="1 minute"
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert set(got) >= {0, 10}
    n_dims, _worst, max_z, n_flagged = got[0]
    assert n_dims == 3 and n_flagged == 0 and max_z < 1.0
    n_dims, worst, max_z, n_flagged = got[10]
    assert n_dims == 3 and worst == 2 and n_flagged == 1
    assert abs(max_z - 10.0) < 0.01  # +1 shift / sigma 0.1


def test_stream_semantic_decontaminate_matches_batch(spark, sf_medium, tmp_path):
    """#232s (VERDICT r10 ask #5): the streaming decontamination twin,
    fed the real sf0.001 corpus as a two-drop file stream against the
    batch twin's benchmark slice and quantizer, must flag EXACTLY the
    pairs q_decontaminate_semantic reports — bit-for-bit, rounding and
    tie policy included."""
    import pyarrow.compute as pc  # noqa: F401
    import pyarrow.parquet as pq

    from flink_learning_practise_spark.datasets import load
    from flink_learning_practise_spark.operators.similarity import ivf_centroids
    from flink_learning_practise_spark.plans import llm_pipeline as llm
    from flink_learning_practise_spark.registry import all_queries

    batch_rows = {
        (r.vec_id, r.bench_id, r.list_id, r.cosine)
        for r in all_queries()["q_decontaminate_semantic"].fn(spark, sf_medium).collect()
    }
    assert batch_rows, "batch decontamination found no leaks at sf0.01"

    emb = load(spark, sf_medium, "embeddings")
    bench_static = emb.filter(F.col("vec_id") % llm.SEMDECON_MOD == 0)
    cents = ivf_centroids(emb, llm.IVF_NLIST)

    # corpus side as a TWO-drop parquet stream (continuous-ingest shape)
    t = pq.read_table(os.path.join(sf_medium, "embeddings.parquet"))
    ids = t["vec_id"].to_pylist()
    corpus = t.filter(
        pc.field("vec_id").isin(  # no %-kernel in this pyarrow build
            [v for v in ids if v % llm.SEMDECON_MOD != 0]
        )
    )
    src_dir = str(tmp_path / "decon_in")
    os.makedirs(src_dir, exist_ok=True)
    half = corpus.num_rows // 2
    pq.write_table(corpus.slice(0, half), os.path.join(src_dir, "p0.parquet"))

    src = spark.readStream.schema(emb.schema).parquet(src_dir)
    out = sp.stream_semantic_decontaminate(
        src, bench_static, tau=llm.SEMDECON_TAU, nlist=llm.IVF_NLIST,
        dim=llm.EMB_DIM, centroids=cents,
    )
    assert out.isStreaming
    q = memory_sink(out, "decon_out", mode="append").start()
    q.processAllAvailable()
    pq.write_table(
        corpus.slice(half), os.path.join(src_dir, "p1.parquet")
    )
    q.processAllAvailable()
    q.stop()

    stream_rows = {
        (r.vec_id, r.bench_id, r.list_id, r.cosine)
        for r in spark.table("decon_out").collect()
    }
    assert stream_rows == batch_rows


def test_stream_bpe_encode_matches_canonical(spark, sf_small, tmp_path):
    """#235s: tokenizing a document stream under the TRAINED merge
    table (stateless map, no state/shuffle) must count exactly the
    tokens the canonical priority-based BPE encoder produces — checked
    per document against an independent Python encoder over the real
    sf0.001 merge table."""
    import pyarrow.parquet as pq

    from flink_learning_practise_spark.datasets import load
    from flink_learning_practise_spark.plans import llm_pipeline as llm

    merges = [
        (m.left_sym, m.right_sym)
        for m in sorted(
            llm.bpe_merges(spark, sf_small).collect(),
            key=lambda m: m.merge_round,
        )
    ]
    assert merges

    t = pq.read_table(os.path.join(sf_small, "documents.parquet"))
    src_dir = str(tmp_path / "bpe_in")
    os.makedirs(src_dir, exist_ok=True)
    pq.write_table(t.slice(0, 40), os.path.join(src_dir, "p0.parquet"))

    schema = load(spark, sf_small, "documents").schema
    src = spark.readStream.schema(schema).parquet(src_dir)
    out = sp.stream_bpe_encode(src, merges)
    assert out.isStreaming
    q = memory_sink(
        out.select("doc_id", "n_words", "n_bpe_tokens"), "bpe_enc_out",
        mode="append",
    ).start()
    q.processAllAvailable()
    pq.write_table(t.slice(40, 20), os.path.join(src_dir, "p1.parquet"))
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in spark.table("bpe_enc_out").collect()
    }
    assert len(got) == 60

    # independent canonical encoder (tests/test_round11's reference)
    from test_round11 import _canonical_bpe_encode

    import re as _re

    for row in t.slice(0, 60).to_pylist():
        text = _re.sub(r"\s+", " ", row["text"]).strip().lower()
        ws = [w for w in text.split(" ") if w != ""]
        want_tokens = sum(
            len(_canonical_bpe_encode(w, merges)) for w in ws
        )
        assert got[row["doc_id"]] == (len(ws), want_tokens), row["doc_id"]
