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


def cumulate_window(
    df: DataFrame,
    ts_col: str,
    max_size_sec: int,
    step_sec: int,
    keys: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """CUMULATE window TVF (ref cumulate SQL generator family alongside
    TUMBLE/HOP/SESSION, flink_window_utils.py:467-645): each max-size
    frame emits growing windows [frame, frame+step), [frame, 2*step), …
    [frame, frame+max_size) — the "running total that resets daily"
    report Flink exposes as ``CUMULATE(...)``.

    Scale shape — NOT the naive size/step row explosion: events
    aggregate once per (frame, slice, keys) slice (ONE keyed exchange
    with map-side partials, shuffle volume O(slices), same as a
    tumbling window at ``step`` grain), then the cumulative roll-up
    runs over the slice tier, whose per-frame partition is bounded by
    ``max_size/step`` rows — the window never sees the fact table.
    Empty interior slices are gap-filled from a (frame, keys) × slice
    grid so a window is emitted iff its prefix holds ≥1 event (exactly
    the explode formulation's output, at a fraction of its shuffle).
    Sums stay decimal through the slice agg AND the running window, so
    the emitted doubles are partition-order independent.

    Output: window_start, window_end, *keys, n_events, sum_value.
    """
    if max_size_sec % step_sec:
        raise ValueError("max_size_sec must be a multiple of step_sec")
    n_slices = max_size_sec // step_sec
    sec = F.unix_timestamp(F.col(ts_col))
    frame0 = (F.floor(sec / max_size_sec) * max_size_sec).cast("long")
    slice_idx = F.floor((sec - frame0) / step_sec).cast("long")
    dec_zero = F.lit(0).cast("decimal(18,6)")
    val = (
        F.col(value_col).cast("decimal(18,6)")
        if value_col
        else dec_zero
    )
    sl = (
        df.select(
            frame0.alias("_f0"), slice_idx.alias("_si"), *keys, val.alias("_v")
        )
        .groupBy("_f0", "_si", *keys)
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_s"))
    )
    grid = (
        sl.select("_f0", *keys)
        .distinct()
        .withColumn("_si", F.explode(F.sequence(F.lit(0), F.lit(n_slices - 1))))
    )
    filled = grid.join(sl, ["_f0", "_si", *keys], "left").select(
        "_f0",
        "_si",
        *keys,
        F.coalesce("_n", F.lit(0)).alias("_n"),
        F.coalesce("_s", dec_zero).alias("_s"),
    )
    w = (
        Window.partitionBy("_f0", *keys)
        .orderBy("_si")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        filled.withColumn("_cn", F.sum("_n").over(w))
        .withColumn("_cs", F.sum("_s").over(w))
        .filter(F.col("_cn") > 0)
        .select(
            F.timestamp_seconds(F.col("_f0")).alias("window_start"),
            F.timestamp_seconds(
                F.col("_f0") + (F.col("_si") + 1) * step_sec
            ).alias("window_end"),
            *keys,
            F.col("_cn").alias("n_events"),
            F.col("_cs").cast("double").alias("sum_value"),
        )
    )
