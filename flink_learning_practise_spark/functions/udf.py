"""User-defined functions — Spark analog of the Flink Table API
function surface (reference flink_typora.md:799 — ScalarFunction /
TableFunction / AggregateFunction registration + SQL usage).

The registration mechanics mirror Flink's ``create_temporary_function``:
register once on the session, then call from SQL or the DataFrame API.

**UDFs are the slow path by policy** (SURVEY §6: no Python in hot
paths). Everything this engine ships computes with built-in JVM
expressions; this module exists because *user-supplied* logic is part
of the reference's API surface. The rules it bakes in:

- Scalar UDFs register as **pandas (Arrow-vectorized) UDFs**, never
  row-at-a-time Python — the 10-100× difference is the difference
  between a slow column and an unusable one at scale.
- Aggregate UDFs register as **grouped-agg pandas UDFs** (whole group
  as a Series per call — Flink AggregateFunction's accumulate/get_value
  collapsed into one vectorized call).
- Table functions (one row in, N rows out — Flink TableFunction /
  LATERAL TABLE) register as **Python UDTFs** (Spark 4), used in SQL as
  ``SELECT ... FROM my_udtf(...)`` or ``LATERAL``.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.pandas.functions import pandas_udf


def register_scalar_pandas(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register an Arrow-vectorized scalar UDF for SQL + DataFrame use
    (Flink ScalarFunction analog). ``fn`` maps pandas Series →
    pandas Series of ``return_type``. Returns the registered callable.
    """
    return spark.udf.register(name, pandas_udf(fn, return_type))


def register_grouped_agg(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register a grouped-aggregate pandas UDF (Flink AggregateFunction
    analog): ``fn`` maps the group's pandas Series → one scalar and
    MUST carry type hints (``pd.Series -> scalar``) — that's how Spark
    infers the grouped-agg variant. Usable in ``groupBy().agg()`` and
    SQL GROUP BY."""
    return spark.udf.register(name, pandas_udf(fn, return_type))


def register_table_function(spark: SparkSession, name: str, udtf_cls) -> None:
    """Register a Python UDTF (Flink TableFunction / LATERAL TABLE
    analog): ``udtf_cls`` is a class with ``eval(self, ...)`` yielding
    output tuples, wrapped by ``pyspark.sql.functions.udtf`` with its
    ``returnType``. SQL: ``SELECT * FROM name(...)``."""
    spark.udtf.register(name, udtf_cls)


# ---------------------------------------------------------------------------
# reference implementations (used by tests; templates for user code)


def normalize_text_pandas(s: pd.Series) -> pd.Series:
    """Whitespace-collapsing lowercase normalizer — the same semantics
    as the engine's built-in ``lower(trim(regexp_replace(...)))`` hot
    path, as a vectorized scalar UDF template."""
    return s.str.replace(r"\s+", " ", regex=True).str.strip().str.lower()
