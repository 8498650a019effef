"""Custom stateful streaming operators.

- :func:`streaming_dedup` — exactly-once-per-key emission with bounded
  state (the streaming twin of operators/dedup.exact_dedup).
- :func:`sessionize` — arbitrary per-key session state via
  ``applyInPandasWithState`` (the Spark analog of a Flink
  KeyedProcessFunction with timers — the machinery the reference's
  stage2 "fill in ProcessWindowFunction" scaffold points at).

State stays bounded through watermarks/timeouts; both operators are
keyed, so state shards across executors with the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    df: DataFrame, keys: Sequence[str], ts_col: str, delay: str
) -> DataFrame:
    """Drop duplicate keys within the watermark horizon. State for a key
    is evicted once the watermark passes its event time + delay, so
    memory is bounded by (arrival rate × delay), not stream length."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))


SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT, sum_value DOUBLE, closed BOOLEAN"
)
SESSION_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT, total DOUBLE"


def _session_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                    "sum_value": [total],
                    "closed": [True],
                }
            )
            return

        start = last = None
        n, total = 0, 0.0
        if state.exists:
            start, last, n, total = state.get
        rows: list[tuple[int, float]] = []
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            rows.extend(zip(ts_ms, pdf["value"].tolist()))
        rows.sort()
        emitted = []
        for ts_ms, value in rows:
            if start is None:
                start, last, n, total = ts_ms, ts_ms, 1, value
            elif ts_ms - last > gap_ms:
                emitted.append((start, last, n, total, True))
                start, last, n, total = ts_ms, ts_ms, 1, value
            else:
                last, n, total = max(last, ts_ms), n + 1, total + value
        state.update((start, last, n, total))
        # Event-time timeout: close when the watermark passes session end
        # + gap. Must be strictly above the current watermark or Spark
        # rejects it (can happen for a key whose data is itself late).
        state.setTimeoutTimestamp(
            max(last + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        emitted.append((start, last, n, total, False))  # open-session snapshot
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(emitted),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _, _ in emitted],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _, _ in emitted],
                "n_events": [n_ for _, _, n_, _, _ in emitted],
                "sum_value": [t for _, _, _, t, _ in emitted],
                "closed": [c for _, _, _, _, c in emitted],
            }
        )

    return fn


def sessionize(
    df: DataFrame, gap: str = "30 minutes", watermark_delay: str = "1 minute"
) -> DataFrame:
    """Session windows with custom per-key state (user_id keyed,
    event-time timeout closes idle sessions once the watermark passes
    session_end + gap). Emits a snapshot row per update (closed=false)
    and a final row on timeout (closed=true).

    Expects columns (user_id, ts, value). The built-in alternative is
    ``F.session_window``; this operator exists for semantics the
    built-in can't express (per-event custom accumulators, early
    snapshots) — the applyInPandasWithState escape hatch. Event-time
    (not processing-time) timeouts keep the query quiescent between
    batches: no data → no triggers → no wasted cluster cycles.
    """
    gap_ms = _interval_to_ms(gap)
    return (
        df.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _interval_to_ms(interval: str) -> int:
    qty, unit = interval.split()
    unit = unit.rstrip("s").lower()
    factors = {"millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000}
    return int(qty) * factors[unit]
