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


def _committed_versions(spark, path: str) -> list[int]:
    """Batch ids of fully-written version dirs, via the table's OWN
    Hadoop FileSystem (works on hdfs://, s3a://, file:// alike — never
    the driver's local os.path, which silently sees nothing on a
    cluster FS). A version is committed iff the parquet committer's
    ``_SUCCESS`` marker exists: a crash mid-write leaves no marker and
    the half-written dir is invisible to every reader."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    glob = jvm.org.apache.hadoop.fs.Path(path + "/v*/_SUCCESS")
    out = []
    for st in fs.globStatus(glob) or []:
        name = st.getPath().getParent().getName()  # "v<batch_id>"
        try:
            out.append(int(name[1:]))
        except ValueError:
            continue
    return sorted(out)


def read_merge_snapshot(spark, path: str, version: int | None = None) -> DataFrame | None:
    """State of a :func:`merge_parquet_sink` table, or None if no
    version has committed yet. Readers only ever see fully-committed,
    immutable version directories (``_SUCCESS``-marked).

    ``version`` selects an older committed version (time travel — every
    ``v{batch_id}`` dir is a full immutable snapshot; retention is the
    caller's policy)."""
    if version is None:
        committed = _committed_versions(spark, path)
        if not committed:
            return None
        version = committed[-1]
    return spark.read.parquet(f"{path}/v{version}")


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
    1. each micro-batch writes a NEW version dir ``v{batch_id}``, valid
       only once the parquet committer's ``_SUCCESS`` marker lands —
       readers (:func:`read_merge_snapshot`) never see partial data;
    2. batch N merges onto the latest committed version with id < N —
       NEVER onto ``v{N}`` itself. A replayed batch (crash after the
       version committed but before the streaming checkpoint did)
       therefore reads exactly what its first attempt read — not the
       directory it is about to overwrite — and deterministically
       rewrites identical content;
    3. all bookkeeping goes through the table path's own Hadoop
       FileSystem, so hdfs:// and s3a:// behave like file:// (a
       driver-local pointer file would silently see nothing on a
       cluster FS).

    At 100 TB, pair with partition-pruned rewrites (semi-join the
    snapshot scan on the batch's key set) and periodic retention
    cleanup of old version dirs; the merge itself stays one key
    shuffle per batch.
    """
    from ..operators.cdc import merge_snapshot

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = [v for v in _committed_versions(spark, path) if v < batch_id]
        current = (
            read_merge_snapshot(spark, path, version=prior[-1])
            if prior
            else None
        )
        chg = batch_df
        if current is None:
            cols = [c for c in chg.columns if c != delete_col]
            current = spark.createDataFrame([], chg.select(*cols).schema)
        merged = merge_snapshot(
            current, chg, key_cols, ts_col, id_col, delete_col
        )
        merged.write.mode("overwrite").parquet(f"{path}/v{batch_id}")

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
