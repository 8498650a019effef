"""Batch sinks — Spark analog of the reference's
``flink_sink_utils.py`` (create_file_sink:434, create_print_sink:487).

Partitioned parquet is the default landing format: column pruning +
predicate pushdown for downstream readers, and ``partitionBy`` gives
partition pruning on the landing keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def print_sink(df: DataFrame, n: int = 20, truncate: bool = False) -> None:
    """Print sink (ref create_print_sink:487)."""
    df.show(n, truncate)
