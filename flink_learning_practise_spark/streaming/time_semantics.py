"""Time semantics and trigger policies — Spark analog of Flink's three
time notions (reference flink_typora.md:516,661 — Event / Processing /
Ingestion Time) and its window triggers (:672 — ProcessingTimeTrigger /
EventTimeTrigger / CountTrigger).

Time semantics, Spark-first:

- **Event time** is the engine's native mode: ``withWatermark`` + a
  window over the data's own timestamp column (everything in
  ``pipeline.py``). Always the right choice when results must be
  replayable and order-independent.
- **Ingestion time** = stamp arrival at the source: a
  ``current_timestamp()`` column added before any shuffle. Cheaper than
  proper event time (no late data by construction — the stamp is
  monotone per task) but results depend on WHEN the pipeline ran.
- **Processing time** = window over the stamp instead of the data's
  timestamp. Deterministic replay is lost; use only for wall-clock
  dashboards ("events seen per minute of runtime").

Trigger mapping (Flink trigger → micro-batch policy):

- ProcessingTimeTrigger → ``trigger(processingTime='N seconds')`` —
  batch cadence, the direct equivalent.
- EventTimeTrigger → not a trigger here: event-time window EMISSION is
  governed by the watermark inside the micro-batch engine, whatever the
  batch cadence. (The trigger picks when work runs; the watermark picks
  what is final.)
- CountTrigger → no per-window row-count trigger exists; the closest
  control is source-side batch sizing (``maxFilesPerTrigger`` /
  ``maxOffsetsPerTrigger``), which bounds rows per micro-batch. Count
  WINDOWS themselves are the batch operators in ``operators/windows.py``.
- Plus Spark's own: ``availableNow`` (drain everything, then stop —
  bounded backfill with streaming semantics) and continuous mode
  (experimental, not wrapped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def with_ingestion_time(df: DataFrame, col: str = "ingest_ts") -> DataFrame:
    """Ingestion-time stamp: arrival wall-clock recorded as a column.
    Apply at the SOURCE (before shuffles/joins) so the stamp reflects
    arrival, not downstream scheduling."""
    from pyspark.sql import functions as F

    return df.withColumn(col, F.current_timestamp())


def processing_time_window(
    df: DataFrame,
    window_size: str,
    keys,
    aggs,
    stamp_col: str = "_proc_ts",
) -> DataFrame:
    """Processing-time windowed aggregation: stamps arrival time and
    windows over it. No watermark — processing-time stamps are monotone
    per task, so nothing is ever late; windows close when wall-clock
    passes them."""
    from pyspark.sql import functions as F

    stamped = df.withColumn(stamp_col, F.current_timestamp())
    grouped = stamped.groupBy(
        F.window(stamp_col, window_size).alias("window"), *keys
    ).agg(*aggs)
    return grouped.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in grouped.columns if c != "window"],
    ).drop("window")


def with_trigger(
    writer: DataStreamWriter,
    processing_time: str | None = None,
    available_now: bool = False,
) -> DataStreamWriter:
    """Apply a trigger policy to a sink writer. Exactly one of:
    ``processing_time`` ('5 seconds' cadence — ProcessingTimeTrigger
    analog), ``available_now`` (drain-and-stop backfill), or neither
    (default: next batch as soon as the previous finishes)."""
    if processing_time is not None and available_now:
        raise ValueError("choose one trigger policy, not both")
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time)
    if available_now:
        return writer.trigger(availableNow=True)
    return writer
