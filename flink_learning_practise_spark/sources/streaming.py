"""Streaming sources — Spark analog of the reference's
``flink_source_utils.py`` (create_kafka_source:66,
create_kafka_table_source_ddl:130, create_socket_source:333,
create_custom_source:361).

Structured Streaming replaces Flink's SourceFunction machinery: every
source below returns an unbounded DataFrame that the same DataFrame
operators consume (batch/stream parity by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source(
    spark: SparkSession,
    topics: str | list[str],
    bootstrap_servers: list[str],
    starting_offsets: str = "earliest",
    group_id_prefix: str | None = None,
    max_offsets_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Kafka source (ref create_kafka_source:66). Returns the raw
    key/value/topic/partition/offset/timestamp frame; decode value with
    ``decode_json_value``. Requires the spark-sql-kafka package on the
    classpath (no broker in this container — options covered by tests).

    maxOffsetsPerTrigger is the backpressure knob: it bounds per-batch
    state so a backlog replay can't overwhelm executors."""
    topic_list = topics if isinstance(topics, str) else ",".join(topics)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", ",".join(bootstrap_servers))
        .option("subscribe", topic_list)
        .option("startingOffsets", starting_offsets)
    )
    if group_id_prefix:
        reader = reader.option("groupIdPrefix", group_id_prefix)
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def decode_json_value(raw: DataFrame, schema: str, ts_col: str | None = None) -> DataFrame:
    """Kafka value bytes → typed columns (the reference's
    SimpleStringSchema + per-record json.loads, done JVM-side)."""
    parsed = raw.select(
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
    ).select("kafka_ts", "v.*")
    return parsed


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    max_files_per_trigger: int = 10,
    **options: str,
) -> DataFrame:
    """File-drop stream (ref create_file_source:186 made continuous):
    watches a directory, each new file becomes micro-batch input.
    maxFilesPerTrigger bounds batch size for backfill replays."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .options(**options)
        .load(path)
    )


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Socket source (ref create_socket_source:333) — dev/test only."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )


def rate_source(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Synthetic generator (ref create_custom_source:361): monotonically
    increasing (timestamp, value) rows — the built-in replacement for a
    custom SourceFunction."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def synthetic_order_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Deterministic fake order stream shaped like the reference's
    Walmart order topic (order1_request_walmart_order.py producer):
    derives stable pseudo-random fields from the rate source's value."""
    rate = rate_source(spark, rows_per_second)
    return rate.select(
        F.col("timestamp").alias("order_ts"),
        F.concat(F.lit("PO"), F.col("value")).alias("purchase_order_id"),
        (F.pmod(F.xxhash64("value"), F.lit(150)) + 1).alias("customer_id"),
        (F.pmod(F.xxhash64("value", F.lit(1)), F.lit(49900)) / 100.0 + 1.0).alias(
            "amount"
        ),
        F.element_at(
            F.array(F.lit("Created"), F.lit("Acknowledged"), F.lit("Shipped"),
                    F.lit("Delivered"), F.lit("Cancelled")),
            (F.pmod(F.xxhash64("value", F.lit(2)), F.lit(5)) + 1).cast("int"),
        ).alias("order_status"),
    )
