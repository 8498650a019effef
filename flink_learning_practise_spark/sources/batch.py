"""Batch sources — Spark analog of the reference's
``flink_source_utils.py`` (create_file_source:186 text/CSV/JSON,
create_jdbc_table_source_ddl:261).

Each reader takes an explicit schema where the format can't carry one
(CSV/JSON): schema inference is a full extra pass over the data — never
acceptable at 100 TB — and pinned schemas keep plans stable across
partitions with heterogeneous files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
    **options: str,
) -> DataFrame:
    return (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .options(**options)
        .load(path)
    )


def read_json(spark: SparkSession, path: str, schema: str, **options: str) -> DataFrame:
    """JSON-lines reader (ref create_file_source json mode). For the
    reference's array-of-objects order dumps set multiLine=true."""
    return spark.read.format("json").schema(schema).options(**options).load(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **properties: str,
) -> DataFrame:
    """JDBC source (ref create_jdbc_table_source_ddl:261).

    Always pass a partition_column + bounds for big tables: without them
    Spark reads through a single connection. Requires the vendor driver
    jar on the classpath (not bundled in this container — covered by
    unit tests at the options level only).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()
