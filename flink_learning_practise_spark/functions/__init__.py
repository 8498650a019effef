"""User-defined function surface (Flink Table API Function analog)."""

from .udf import (  # noqa: F401
    normalize_text_pandas,
    register_grouped_agg,
    register_scalar_pandas,
    register_table_function,
)
