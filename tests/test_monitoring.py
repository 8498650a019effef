"""Metrics/monitoring: in-job observed metrics (batch + streaming) and
the streaming progress listener — the Flink Metrics API analog."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.monitoring import (
    MetricsListener,
    observe_batch,
    observe_stream,
    spark_ui_rest_url,
)


def test_observe_batch_single_pass_metrics(spark, sf_small):
    """Counters/meters ride the job itself: one action yields both the
    result and the metrics, no second aggregation query."""
    from flink_learning_practise_spark.datasets import load

    ev = load(spark, sf_small, "events")
    cleaned = ev.filter(F.col("value") >= 1.0)
    instrumented, obs = observe_batch(
        cleaned,
        "clean_stage",
        {
            "rows_out": F.count(F.lit(1)),
            "sum_value": F.sum("value"),
            "null_props": F.count(F.when(F.col("props").isNull(), 1)),
        },
    )
    n = instrumented.count()  # the single action
    got = obs.get
    assert got["rows_out"] == n
    assert got["sum_value"] == pytest.approx(
        cleaned.agg(F.sum("value")).collect()[0][0]
    )
    assert got["null_props"] >= 0


def test_streaming_listener_collects_progress(spark, tmp_path):
    from flink_learning_practise_spark.sources.streaming import file_stream_source
    from flink_learning_practise_spark.sinks.streaming import memory_sink

    src_dir = str(tmp_path / "metrics_in")
    os.makedirs(src_dir)
    with open(os.path.join(src_dir, "a.jsonl"), "w") as f:
        for i in range(10):
            f.write(
                json.dumps(
                    {
                        "event_id": i,
                        "ts": f"2024-01-01 00:00:{i:02d}",
                        "user_id": i % 3,
                        "value": float(i),
                    }
                )
                + "\n"
            )
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        src = file_stream_source(
            spark,
            src_dir,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE",
            fmt="json",
        )
        instrumented = observe_stream(
            src, "ingest", {"rows": F.count(F.lit(1)), "max_value": F.max("value")}
        )
        q = (
            memory_sink(instrumented, "metrics_out", mode="append")
            .queryName("metrics_query")
            .start()
        )
        q.processAllAvailable()
        # listener events are async; give the bus a moment
        for _ in range(40):
            if listener.totals("metrics_query")["rows_in"] >= 10:
                break
            time.sleep(0.25)
        q.stop()
    finally:
        spark.streams.removeListener(listener)

    totals = listener.totals("metrics_query")
    assert totals["rows_in"] == 10
    assert totals["batches"] >= 1
    latest = [
        r for r in listener.history("metrics_query") if r["observed_metrics"]
    ]
    assert latest, "observed metrics should surface in progress events"
    ingest = latest[0]["observed_metrics"]["ingest"]
    assert ingest["rows"] == 10
    assert ingest["max_value"] == 9.0


def test_spark_ui_rest_url_shape(spark):
    url = spark_ui_rest_url(spark)
    assert url is None or url.endswith("/api/v1")


def test_listener_history_bounded_totals_lifetime():
    """History evicts beyond max_batches (driver-leak guard) while
    totals stay lifetime-accurate via running sums; termination status
    must transition under the query NAME even though the terminated
    event carries only the id."""
    from types import SimpleNamespace as NS

    lst = MetricsListener(max_batches=5)
    lst.onQueryStarted(NS(id="uuid-1", name="q"))
    assert lst.status("q") == "RUNNING"
    for b in range(12):
        lst.onQueryProgress(
            NS(
                progress=NS(
                    batchId=b,
                    name="q",
                    id="uuid-1",
                    numInputRows=10,
                    inputRowsPerSecond=1.0,
                    processedRowsPerSecond=1.0,
                    observedMetrics={},
                    stateOperators=[NS(numRowsTotal=b)],
                    eventTime={"watermark": "2024-01-01T00:00:00"},
                )
            )
        )
    assert len(lst.history("q")) == 5  # bounded
    assert lst.history("q")[-1]["batch_id"] == 11
    t = lst.totals("q")
    assert t == {"batches": 12, "rows_in": 120, "max_state_rows": 11}
    lst.onQueryTerminated(NS(id="uuid-1", exception=None))
    assert lst.status("q") == "TERMINATED"
    lst.onQueryStarted(NS(id="uuid-2", name="q2"))
    lst.onQueryTerminated(NS(id="uuid-2", exception="boom"))
    assert lst.status("q2") == "FAILED: boom"
