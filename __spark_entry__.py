"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``flink_learning_practise_spark.registry`` — every
implemented operator from SURVEY.md §2 registers there with its Spark
plan and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_learning_practise_spark import registry
from flink_learning_practise_spark.plans.tpch import pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
