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
- CountTrigger / custom Trigger on GlobalWindows → no built-in
  per-window trigger exists; :func:`punctuated_window` implements the
  FIRE_AND_PURGE semantics directly on keyed state
  (``applyInPandasWithState``): the unbounded per-key window
  accumulates until a *firing condition* — an arbitrary row predicate
  (PunctuatedTrigger) and/or an element count (CountTrigger.of(n)) —
  then emits and purges. Batch twin + parity test in
  tests/test_time_semantics.py. Source-side batch sizing
  (``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger``) remains the
  cadence control; count WINDOWS over bounded data are the batch
  operators in ``operators/windows.py``.
- Plus Spark's own: ``availableNow`` (drain everything, then stop —
  bounded backfill with streaming semantics) and continuous mode
  (experimental, not wrapped).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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


PUNCTUATED_OUTPUT_SCHEMA = (
    "user_id BIGINT, window_start TIMESTAMP, fire_ts TIMESTAMP, "
    "n_events BIGINT, sum_value DOUBLE"
)
PUNCTUATED_STATE_SCHEMA = "start BIGINT, n BIGINT, total DOUBLE"


def _punctuated_fn(count: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        start, n, total = None, 0, 0.0
        if state.exists:
            start, n, total = state.get
        from .stateful import _sorted_rows

        # µs grain via the shared helper (ms truncation mutated emitted
        # window_start/fire_ts and could reorder same-ms events)
        rows = _sorted_rows(pdfs, ("value", "_fire"))
        out: list[tuple[int, int, int, float]] = []
        for ts_us, value, fire in rows:
            if start is None:
                start = ts_us
            n, total = n + 1, total + value
            if fire or (count is not None and n >= count):
                out.append((start, ts_us, n, total))  # FIRE...
                start, n, total = None, 0, 0.0  # ...AND_PURGE
        if start is None:
            if state.exists:
                state.remove()
        else:
            state.update((start, n, total))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "window_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in out],
                    "fire_ts": [pd.Timestamp(f, unit="us") for _, f, _, _ in out],
                    "n_events": [n_ for _, _, n_, _ in out],
                    "sum_value": [t for _, _, _, t in out],
                }
            )

    return fn


def punctuated_window(
    df: DataFrame,
    fire: Column | None = None,
    count: int | None = None,
) -> DataFrame:
    """Global window + custom trigger (reference flink_typora.md:668
    GlobalWindow, :672 Trigger): per-key unbounded window that
    accumulates until a firing condition, then emits one row
    ``(user_id, window_start, fire_ts, n_events, sum_value)`` and
    purges — Flink's ``GlobalWindows.create() +
    Trigger(FIRE_AND_PURGE)``.

    ``fire`` is an arbitrary row predicate (punctuation trigger: e.g.
    ``F.col("event_type") == "flush"``); ``count`` fires every n
    elements (``CountTrigger.of(n)``); given both, whichever trips
    first fires (the firing element is included in its window). Expects
    columns (user_id, ts, value).

    Trigger semantics are arrival-order semantics: rows are applied in
    event-time order WITHIN each micro-batch, so cross-batch
    stragglers join the window open at their ARRIVAL (exactly Flink's
    count/punctuation triggers, which are not event-time constructs —
    use session/tumbling event-time windows when replay determinism is
    required). State per key is one (start, n, total) triple — fixed
    size, no buffered elements, safe at any key cardinality; unfired
    state persists until its key fires (the documented GlobalWindows
    caveat)."""
    if fire is None and count is None:
        raise ValueError("punctuated_window needs a fire predicate or a count")
    from pyspark.sql import functions as F

    fire_col = fire if fire is not None else F.lit(False)
    evs = df.select("user_id", "ts", "value", fire_col.alias("_fire"))
    return evs.groupBy("user_id").applyInPandasWithState(
        _punctuated_fn(count),
        outputStructType=PUNCTUATED_OUTPUT_SCHEMA,
        stateStructType=PUNCTUATED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def punctuated_window_batch(
    df: DataFrame, fire: Column
) -> DataFrame:
    """Batch twin of :func:`punctuated_window` (predicate triggers
    only): segments each key's event-time-ordered history at firing
    rows and aggregates the fired segments — gaps-and-islands with the
    island boundary defined by the trigger instead of a time gap. Used
    to prove streaming/batch parity."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = df.select(
        "user_id",
        "ts",
        "value",
        fire.alias("_fire"),
        F.coalesce(
            F.sum(fire.cast("long")).over(w), F.lit(0)
        ).alias("_seg"),  # fires strictly before this row
    )
    agg = seg.groupBy("user_id", "_seg").agg(
        F.min("ts").alias("window_start"),
        F.max(F.when(F.col("_fire"), F.col("ts"))).alias("fire_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    return agg.filter(F.col("fire_ts").isNotNull()).select(
        "user_id", "window_start", "fire_ts", "n_events", "sum_value"
    )


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
