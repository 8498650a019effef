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
    """Rows carrying a duplicated key (0 when the key is unique; an
    EMPTY table passes with violations=0, not NULL)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.lit(f"unique({','.join(key_cols)})").alias("check_name"),
            F.lit(table).alias("table_name"),
            F.coalesce(
                F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)),
                F.lit(0),
            ).alias("violations"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("total"),
        )
    )


def check_fk(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    table: str,
) -> DataFrame:
    """Orphaned child rows: non-null FK values with no parent row.

    ONE pass over the child: a left join against the distinct parent
    keys (a presence marker column), then a single conditional
    aggregate yields orphans AND the row total together — no second
    scan, no crossJoin."""
    marked = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key))
        .distinct()
        .withColumn("_present", F.lit(1)),
        child_key,
        "left_outer",
    )
    return marked.agg(
        F.lit(f"fk({child_key})").alias("check_name"),
        F.lit(table).alias("table_name"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col(child_key).isNotNull() & F.col("_present").isNull(),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("violations"),
        F.count(F.lit(1)).alias("total"),
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
        F.coalesce(F.count(F.lit(1)) - F.sum(holds), F.lit(0)).alias(
            "violations"
        ),
        F.count(F.lit(1)).alias("total"),
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """UNION the one-row check frames into the report. Each input is an
    independent aggregate; Catalyst runs them as parallel stages. Every
    check frame must carry exactly the REPORT_SCHEMA columns — caught
    here, not at sink time."""
    expected = [f.split()[0] for f in REPORT_SCHEMA.split(", ")]
    for c in checks:
        if c.columns != expected:
            raise ValueError(
                f"check frame columns {c.columns} != report schema {expected}"
            )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
