"""Kafka end-to-end integration — gated on a real broker.

The reference's spine is Kafka → parse → transform → MySQL
(flink_source_utils.py:66, flink_kafka_to_mysql_utils.py:71). This
container ships no broker, so the suite normally proves that pipeline
over a file-drop stream (test_streaming.py::test_etl_pipeline_*) and
checks the Kafka builders' options only (test_connectors.py). This
module closes the seam: set ``SPARK_KAFKA_BOOTSTRAP`` to a reachable
broker and the SAME pipeline logic runs end-to-end through Kafka —
producer → kafka_source → decode_json_value → transform → sink —
without code changes. Skipped (not failed) when the env var is unset.

The Spark session must carry the Kafka connector on its classpath;
when ``SPARK_KAFKA_BOOTSTRAP`` is set, conftest adds
``spark.jars.packages`` with the spark-sql-kafka package matching the
installed PySpark (override via ``SPARK_KAFKA_PACKAGES``).
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.sinks.streaming import memory_sink
from flink_learning_practise_spark.sources.streaming import (
    decode_json_value,
    kafka_source,
)
from flink_learning_practise_spark.streaming import pipeline as sp

BOOTSTRAP = os.environ.get("SPARK_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="SPARK_KAFKA_BOOTSTRAP not set (no Kafka broker in this environment)",
)

EVENT_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"


def _produce(spark, topic: str, rows) -> None:
    """Batch-produce JSON records — the test stand-in for the
    reference's order producer (order1_request_walmart_order.py)."""
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    (
        df.select(
            F.col("event_id").cast("string").alias("key"),
            F.to_json(F.struct(*df.columns)).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )


def test_kafka_etl_roundtrip(spark):
    """Kafka → parse → transform → sink, identical logic to the
    file-stream e2e (test_streaming.py::test_etl_pipeline_composition):
    same transform, same expected rows — only the transport differs."""
    import datetime as dt

    topic = f"flp-spark-e2e-{uuid.uuid4().hex[:8]}"
    _produce(
        spark,
        topic,
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 10), 1, 10.0),
            (2, dt.datetime(2024, 1, 1, 0, 0, 40), 1, 5.0),
            (3, dt.datetime(2024, 1, 1, 0, 1, 10), 2, 7.0),
            (4, dt.datetime(2024, 1, 1, 0, 3, 5), 1, 1.0),
        ],
    )
    raw = kafka_source(
        spark, topic, BOOTSTRAP.split(","), starting_offsets="earliest"
    )
    q = sp.etl_pipeline(
        decode_json_value(raw, EVENT_SCHEMA),
        transform=lambda df: df.filter(F.col("value") >= 5.0).withColumn(
            "value_cents", (F.col("value") * 100).cast("long")
        ),
        sink=lambda df: memory_sink(df, "kafka_etl_out", mode="append"),
    )
    sp.run_until_drained(q)
    out = spark.table("kafka_etl_out").collect()
    assert sorted(r.value_cents for r in out) == [500, 700, 1000]


def test_kafka_windowed_agg(spark):
    """Kafka transport under the watermark+window aggregation path
    (mirrors test_streaming.py::test_windowed_stats_stream)."""
    import datetime as dt

    from flink_learning_practise_spark.num import dsum

    topic = f"flp-spark-win-{uuid.uuid4().hex[:8]}"
    _produce(
        spark,
        topic,
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 10), 1, 10.0),
            (2, dt.datetime(2024, 1, 1, 0, 0, 40), 1, 5.0),
            (3, dt.datetime(2024, 1, 1, 0, 1, 10), 2, 7.0),
        ],
    )
    raw = kafka_source(
        spark, topic, BOOTSTRAP.split(","), starting_offsets="earliest"
    )
    stats = sp.windowed_stats(
        decode_json_value(raw, EVENT_SCHEMA),
        "ts",
        "1 minute",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
        watermark_delay="30 seconds",
    )
    q = memory_sink(stats, "kafka_win_out", mode="complete").start()
    sp.run_until_drained(q)
    rows = {
        (r.window_start.isoformat(), r.user_id): r
        for r in spark.table("kafka_win_out").collect()
    }
    assert rows[("2024-01-01T00:00:00", 1)].sum_value == 15.0
    assert rows[("2024-01-01T00:01:00", 2)].n_events == 1
