"""Streaming sinks — Spark analog of the reference's
``flink_sink_utils.py`` (create_kafka_sink:63, create_mysql_sink:190,
create_file_sink:434) and ``flink5_build_mysql_sink.py``.

Exactly-once story: file/kafka sinks get it from checkpoint + sink
transaction log; the JDBC path uses idempotent upserts inside
``foreachBatch`` (primary-key ON-CONFLICT update), so replayed batches
converge instead of duplicating — the same design as the reference's
``ON DUPLICATE KEY UPDATE`` writer (flink_sink_utils.py:358).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery


def console_sink(df: DataFrame, mode: str = "update", num_rows: int = 20) -> DataStreamWriter:
    """Print sink (ref create_print_sink:487)."""
    return (
        df.writeStream.format("console")
        .outputMode(mode)
        .option("numRows", str(num_rows))
        .option("truncate", "false")
    )


def memory_sink(df: DataFrame, table_name: str, mode: str = "append") -> DataStreamWriter:
    """In-memory sink for tests (bounded data only)."""
    return df.writeStream.format("memory").queryName(table_name).outputMode(mode)


def file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> DataStreamWriter:
    """File sink (ref create_file_sink:434): append-only, exactly-once
    via the checkpointed file-manifest log."""
    writer = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer


def kafka_sink(
    df: DataFrame,
    topic: str,
    bootstrap_servers: list[str],
    checkpoint: str,
) -> DataStreamWriter:
    """Kafka sink (ref create_kafka_sink:63). Expects `key`/`value`
    string or binary columns (build with to_json)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", ",".join(bootstrap_servers))
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def foreach_batch_sink(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    mode: str = "update",
) -> DataStreamWriter:
    """Generic micro-batch sink: ``batch_fn(batch_df, batch_id)`` runs
    per micro-batch — the escape hatch for any store without a native
    connector (the reference's Python MySQL sink,
    flink_sink_utils.py:288, maps here)."""
    return (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
    )
