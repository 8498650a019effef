"""DuckDB oracle harness — mirrors the driver's correctness gate.

For each registered query we run the Spark plan and the oracle SQL on the
same parquet directory and compare row count, sorted column names, and the
order-insensitive multiset of canonicalized rows. Running this in pytest
catches parity drift before the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
from collections import Counter

import duckdb

from .datasets import TABLES


def run_duckdb(sql: str, sf_dir: str) -> tuple[list[str], list[tuple], list[str]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        rel = con.sql(sql)
        cols = list(rel.columns)
        types = [str(t) for t in rel.types]
        rows = rel.fetchall()
        return cols, rows, types
    finally:
        con.close()


# The driver's value hash is TYPE-sensitive: DuckDB SUM(INTEGER) yields
# HUGEINT (int128) where Spark yields BIGINT, and identical values then
# hash differently (the round-1 q_json_etl failure). Bucket both engines'
# types coarsely and require bucket equality so that class of drift is
# caught locally, pre-driver.
def _duck_type_bucket(t: str) -> str:
    t = t.upper()
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}:
        return "int"
    if t == "HUGEINT":
        return "int128"
    if t in {"FLOAT", "DOUBLE"}:
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BLOB":
        return "binary"
    if "[" in t or t.startswith(("STRUCT", "LIST", "MAP")):
        return "nested"
    return t


def _spark_type_bucket(dt: str) -> str:
    d = dt.lower()
    if d in {"tinyint", "smallint", "int", "bigint"}:
        return "int"
    if d in {"float", "double"}:
        return "float"
    if d.startswith("decimal"):
        return "decimal"
    if d == "string":
        return "str"
    if d == "boolean":
        return "bool"
    if d == "date":
        return "date"
    if d.startswith("timestamp"):
        return "timestamp"
    if d == "binary":
        return "binary"
    if d.startswith(("array", "struct", "map")):
        return "nested"
    return d


def compare_types(
    spark_dtypes: list[tuple[str, str]],
    duck_cols: list[str],
    duck_types: list[str],
) -> list[str]:
    """Type-bucket mismatches between Spark and DuckDB result schemas."""
    duck = {c: _duck_type_bucket(t) for c, t in zip(duck_cols, duck_types)}
    errors = []
    for col, dt in spark_dtypes:
        sb = _spark_type_bucket(dt)
        db = duck.get(col)
        if db is not None and sb != db:
            errors.append(
                f"type-bucket mismatch on {col!r}: spark={dt}({sb}) duck={db} "
                f"— the driver's value hash is type-sensitive; cast the oracle"
            )
    return errors


def canon(v, float_ndigits: int | None = 9):
    """Canonicalize a value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, _decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if float_ndigits is not None:
            return round(v, float_ndigits)
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x, float_ndigits) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _multiset(cols: list[str], rows: list[tuple], float_ndigits) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i], float_ndigits) for i in order) for r in rows)


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    duck_cols: list[str],
    duck_rows: list[tuple],
    float_ndigits: int | None = 9,
) -> list[str]:
    """Return a list of mismatch descriptions (empty ⇒ parity)."""
    errors: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        errors.append(f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return errors
    if len(spark_rows) != len(duck_rows):
        errors.append(f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")
    s_ms = _multiset(spark_cols, spark_rows, float_ndigits)
    d_ms = _multiset(duck_cols, duck_rows, float_ndigits)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:3]
        only_d = list((d_ms - s_ms).items())[:3]
        errors.append(
            f"value mismatch: {sum((s_ms - d_ms).values())} rows only in spark "
            f"(e.g. {only_s}), {sum((d_ms - s_ms).values())} only in duckdb "
            f"(e.g. {only_d}); sorted cols={sorted(spark_cols)}"
        )
    return errors


def check_query(spark, name: str, sf_dir: str, float_ndigits: int | None = 9) -> list[str]:
    """Run one registered query against its oracle. Empty list ⇒ parity."""
    from .registry import all_queries

    q = all_queries()[name]
    df = q.fn(spark, sf_dir)
    spark_cols = list(df.columns)
    spark_rows = [tuple(r) for r in df.collect()]
    if q.oracle is None:
        return [] if spark_rows is not None else ["query returned None"]
    duck_cols, duck_rows, duck_types = run_duckdb(q.oracle, sf_dir)
    errors = compare_types(df.dtypes, duck_cols, duck_types)
    errors += compare(spark_cols, spark_rows, duck_cols, duck_rows, float_ndigits)
    return errors
