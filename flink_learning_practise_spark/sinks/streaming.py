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


def read_merge_snapshot(spark, path: str, version: int | None = None) -> DataFrame | None:
    """State of a :func:`merge_parquet_sink` table, or None if no
    version has committed yet. Readers see a complete, immutable
    version directory — never a half-written one (the pointer file is
    updated only after the version finishes writing).

    ``version`` selects an older committed version (time travel — every
    ``v{batch_id}`` dir is a full immutable snapshot; retention is the
    caller's policy)."""
    import os

    if version is None:
        ptr = os.path.join(path, "_LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            version = int(f.read().strip())
    return spark.read.parquet(os.path.join(path, f"v{version}"))


def merge_parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    delete_col: str | None = None,
) -> DataStreamWriter:
    """Streaming MERGE: maintain an upsert-compacted parquet snapshot
    from a changelog stream — the reference's Kafka→MySQL upsert spine
    (``flink_kafka_to_mysql_utils.py``) re-landed on a lakehouse layout
    instead of a database, via ``operators/cdc.merge_snapshot`` inside
    ``foreachBatch``.

    Exactly-once without a table format, from three properties:
    1. each micro-batch writes a NEW immutable version dir ``v{batch_id}``
       (an overwrite of it on replay is idempotent — same input, same
       deterministic merge);
    2. the ``_LATEST`` pointer flips only after the version is fully
       written (readers never see partial data);
    3. a replayed batch re-merges onto a snapshot that may already
       contain it — and :func:`merge_snapshot` is IDEMPOTENT (rank-1
       with deterministic tie-break), so the rewritten version is
       identical.

    At 100 TB, pair with partition-pruned rewrites (semi-join the
    snapshot scan on the batch's key set) and periodic
    :func:`~..sinks.batch.compact_parquet` of version history; the
    merge itself stays one key shuffle per batch.
    """
    import os

    from ..operators.cdc import merge_snapshot

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = read_merge_snapshot(spark, path)
        chg = batch_df
        if current is None:
            cols = [c for c in chg.columns if c != delete_col]
            current = spark.createDataFrame([], chg.select(*cols).schema)
        merged = merge_snapshot(
            current, chg, key_cols, ts_col, id_col, delete_col
        )
        vdir = os.path.join(path, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(path, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(path, "_LATEST"))  # atomic flip

    return (
        df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
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
