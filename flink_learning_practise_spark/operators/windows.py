"""Window operators — Spark analog of the reference's
``flink_window_utils.py`` (tumbling/sliding/session time windows:89-228,
count windows:229-293, window aggregate:294-397, TUMBLE/HOP/SESSION SQL
generators:467-645).

Batch and streaming share the same ``F.window`` expressions; the batch
gaps-and-islands sessionizer below is the offline twin of streaming
``F.session_window`` (both emit [min ts, max ts] per gap-separated run).

Scale notes:
- time windows are pure projections + one hash aggregate: the window
  struct is computed map-side, partial aggregation combines before the
  shuffle, so the shuffle volume is O(groups), not O(rows).
- sliding windows multiply rows by size/slide BEFORE the partial agg;
  keep that ratio modest (e.g. 5) or pre-aggregate per slide then roll up.
- sessionization is one repartition-by-key + in-partition sort (no
  iterative driver loop); skewed keys are handled by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Tumbling event-time window (ref tumbling_time_window:89,
    tumbling_window_sql:467). Epoch-aligned, [start, end) semantics."""
    grouped = df.groupBy(F.window(ts_col, size).alias("window"), *keys).agg(*aggs)
    return grouped.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in grouped.columns if c != "window"],
    ).drop("window")


def sliding_window(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Sliding/HOP window (ref sliding_time_window:139,
    sliding_window_sql:516). Each row lands in size/slide windows."""
    grouped = df.groupBy(
        F.window(ts_col, size, slide).alias("window"), *keys
    ).agg(*aggs)
    return grouped.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in grouped.columns if c != "window"],
    ).drop("window")


def session_window_batch(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Session window, batch path (ref session_window:186,
    session_window_sql:566): gaps-and-islands — a new session starts when
    the gap to the previous event exceeds ``gap`` (SQL interval string).

    One shuffle (partition by keys, sort by ts); no Python.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}"))
    ).cast("int")
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessionized = df.withColumn("_session_id", F.sum(is_new).over(run))
    return (
        sessionized.groupBy(*keys, "_session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            *aggs,
        )
        .drop("_session_id")
    )


def tumbling_count_window(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    count: int,
    aggs: Sequence[Column],
) -> DataFrame:
    """Tumbling count window (ref tumbling_count_window:229): every
    ``count`` rows per key form one bucket, ordered by ``order``."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    bucketed = df.withColumn(
        "window_id",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(count)).cast("long"),
    )
    return bucketed.groupBy(*keys, "window_id").agg(*aggs)


def sliding_count_window(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    count: int,
    rolling: dict[str, Column],
) -> DataFrame:
    """Sliding count window (ref sliding_count_window:260): window frame
    of the last ``count`` rows per key; ``rolling`` maps output column
    name -> aggregate Column to evaluate over that frame."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-(count - 1), Window.currentRow)
    )
    return df.withColumns({name: c.over(w) for name, c in rolling.items()})
