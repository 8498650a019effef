"""Central query registry — the single source of truth behind
``__spark_entry__.py`` (driver contract), ``bench.py`` and the oracle
parity tests.

Every implemented operator from SURVEY.md §2 registers here with
(name, spark plan fn, optional DuckDB oracle SQL). The oracle SQL runs
against the same parquet tables; column aliases match the Spark plan
exactly so the driver's order-insensitive value-hash can line up.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL runnable by DuckDB; None → rows-only check
    headline: bool = False  # included in bench.py timings


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, fn: QueryFn, oracle: str | None = None, headline: bool = False
) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = Query(name, fn, oracle, headline)


def all_queries() -> dict[str, Query]:
    _populate()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}


_POPULATED = False


def _populate() -> None:
    """Import every plan module exactly once; imports self-register."""
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True

    from .plans import tpch

    register(
        "q_sql_pricing_summary",
        tpch.pricing_summary,
        tpch.PRICING_SUMMARY_SQL,
        headline=True,
    )
    register(
        "q_shipping_priority",
        tpch.shipping_priority,
        tpch.SHIPPING_PRIORITY_SQL,
        headline=True,
    )
    register(
        "q_local_supplier_volume",
        tpch.local_supplier_volume,
        tpch.LOCAL_SUPPLIER_VOLUME_SQL,
        headline=True,
    )
