"""Data-quality checks (Deequ/Great-Expectations analog, Spark-first).

The reference validates records row-by-row (``validate_data_format``,
null filters, error side-outputs); production pipelines also need
TABLE-level contracts: key uniqueness, referential integrity, null
budgets, freshness. Each check here is one declarative aggregate —
composable into a single report frame (`dq_report`) whose UNION of
tiny per-check rows costs one pass per involved table.

Scale shapes:
- uniqueness: count vs count(distinct) would double-scan or expand —
  instead ONE groupBy(key) counting groups and rows (map-side partials,
  fixed-width keys);
- referential integrity: LEFT ANTI join child→parent on the key —
  parent side pruned to the key column; AQE broadcasts when the parent
  is small, else shuffles on the key (the only correct plan at scale);
- null/blank budget and freshness: single conditional aggregates over
  the scan, zero shuffle.

Checks return (check_name, table_name, violations, total) — violations == 0
means the contract holds; thresholding is the caller's policy (a
gate can ``assert violations/total <= budget``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


REPORT_SCHEMA = "check_name string, table_name string, violations long, total long"


def check_unique(df: DataFrame, key_cols: list[str], table: str) -> DataFrame:
    """Rows carrying a duplicated key (0 when the key is unique)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.lit(f"unique({','.join(key_cols)})").alias("check_name"),
            F.lit(table).alias("table_name"),
            F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)).alias(
                "violations"
            ),
            F.sum("_n").alias("total"),
        )
    )


def check_fk(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    table: str,
) -> DataFrame:
    """Orphaned child rows: non-null FK values with no parent row."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    total = child.agg(F.count(F.lit(1)).alias("total"))
    return orphans.crossJoin(total).select(
        F.lit(f"fk({child_key})").alias("check_name"),
        F.lit(table).alias("table_name"),
        "violations",
        "total",
    )


def check_condition(
    df: DataFrame, cond: Column, name: str, table: str
) -> DataFrame:
    """Rows VIOLATING ``cond`` (null condition counts as a violation —
    an unknown is not a pass)."""
    holds = F.when(cond, 1).otherwise(0)
    return df.agg(
        F.lit(name).alias("check_name"),
        F.lit(table).alias("table_name"),
        (F.count(F.lit(1)) - F.sum(holds)).alias("violations"),
        F.count(F.lit(1)).alias("total"),
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """UNION the one-row check frames into the report. Each input is an
    independent aggregate; Catalyst runs them as parallel stages."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
