"""Deterministic numeric aggregation helpers.

Floating-point sums are not associative, so a distributed double-sum
depends on partition order — results would drift run to run and differ
from any single-node oracle. At 100 TB (thousands of partitions) this
matters for reproducibility, not just testing. Fix: aggregate through
``decimal(18,6)`` (exact, associative ⇒ partition-order independent),
then cast back to double. The matching SQL shape is
``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact (decimal-routed) sum, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
