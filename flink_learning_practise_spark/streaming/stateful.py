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


# ---------------------------------------------------------------------------
# Streaming last-touch attribution (the unbounded twin of
# plans/events_analytics.last_touch_attribution #99): per-user state is
# ONLY the latest view (two longs), evicted once the watermark proves
# no future purchase can reach back to it.

ATTR_OUTPUT_SCHEMA = (
    "purchase_id BIGINT, user_id BIGINT, purchase_ts TIMESTAMP, "
    "view_id BIGINT, latency_sec BIGINT"
)
ATTR_STATE_SCHEMA = "view_ts BIGINT, view_id BIGINT"


def _attr_fn(window_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last view + lookback: no in-horizon
            # purchase can attribute to it any more
            state.remove()
            return
        view_ts, view_id = state.get if state.exists else (None, None)
        rows: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            rows.extend(
                zip(ts_ms, pdf["event_id"].tolist(), pdf["event_type"].tolist())
            )
        rows.sort()  # event-time order within the batch = batch-op order
        out: list[tuple[int, int, int | None, int | None]] = []
        for t, eid, et in rows:
            if et == "view":
                if view_ts is None or (t, eid) > (view_ts, view_id):
                    view_ts, view_id = t, eid
            elif et == "purchase":
                if view_ts is not None and 0 <= t - view_ts <= window_ms:
                    out.append((eid, t, view_id, (t - view_ts) // 1000))
                else:
                    out.append((eid, t, None, None))
        if view_ts is not None:
            state.update((view_ts, view_id))
            state.setTimeoutTimestamp(
                max(view_ts + window_ms, state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(
                {
                    "purchase_id": [p for p, _, _, _ in out],
                    "user_id": [user_id] * len(out),
                    "purchase_ts": [pd.Timestamp(t, unit="ms") for _, t, _, _ in out],
                    "view_id": pd.array(
                        [v for _, _, v, _ in out], dtype="Int64"
                    ),
                    "latency_sec": pd.array(
                        [s for _, _, _, s in out], dtype="Int64"
                    ),
                }
            )

    return fn


def streaming_last_touch(
    df: DataFrame,
    window: str = "30 minutes",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Attribute each purchase to the user's latest preceding view
    within ``window``, continuously. Expects (event_id, user_id, ts,
    event_type).

    State per user = ONE (ts, id) pair — bytes, not events — sharded by
    the user key and evicted by event-time timeout once the watermark
    passes last_view + window. Within a micro-batch events process in
    event-time order (matching the batch operator); a view arriving in
    a LATER batch than a purchase it should have touched cannot
    retro-attribute — first-emission wins, the batch op (#99) stays the
    reprocessing authority (same contract as the streaming dedups).
    """
    window_ms = _interval_to_ms(window)
    return (
        df.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _attr_fn(window_ms),
            outputStructType=ATTR_OUTPUT_SCHEMA,
            stateStructType=ATTR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: sharded Misra-Gries over an unbounded token
# stream (the streaming twin of operators/text.heavy_hitter_tokens
# #87). Tokens hash-shard across keys, each shard holds ONE MG(k)
# summary — state is ≤ k (token, count) pairs per shard BY
# CONSTRUCTION, so no timeout/eviction is needed: the operator's
# memory is fixed forever, the defining property of a sketch.

HH_OUTPUT_SCHEMA = "shard INT, token STRING, est BIGINT, shard_tokens BIGINT"
HH_STATE_SCHEMA = "tokens ARRAY<STRING>, counts ARRAY<BIGINT>, n BIGINT"


def _hh_fn(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            tokens, counts, n = state.get
            counters = dict(zip(tokens, counts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            for tok in pdf["token"]:
                n += 1
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:  # decrement-all: the MG step
                    dead = []
                    for t in counters:
                        counters[t] -= 1
                        if counters[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
        state.update((list(counters), list(counters.values()), n))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "token": list(counters),
                "est": list(counters.values()),
                "shard_tokens": [n] * len(counters),
            }
        )

    return fn


def streaming_heavy_hitters(
    df: DataFrame,
    text_col: str,
    k: int = 64,
    n_shards: int = 8,
) -> DataFrame:
    """Frequent tokens over an unbounded text stream. Each token lives
    in exactly ONE hash shard, so the per-shard MG(k) guarantee applies
    per token: any token with frequency > n_shard/(k+1) in its shard
    survives, and its estimate is a lower bound within n_shard/(k+1)
    (Misra-Gries 1982). Emits the full shard summary each batch in
    update mode — downstream takes each shard's latest emission (max
    shard_tokens) and, as in the batch twin, can join exact counts over
    the candidate set for an exact readout.

    State is ≤ n_shards × k counters TOTAL — fixed memory for the life
    of the stream, sharded across executors by the shard key.
    """
    from pyspark.sql import functions as F

    from ..operators.text import normalize

    toks = (
        df.select(
            F.explode(F.split(normalize(F.col(text_col)), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .withColumn(
            "shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)).cast("int")
        )
    )
    return toks.groupBy("shard").applyInPandasWithState(
        _hh_fn(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA (the unbounded twin of operators/transforms.ewma
# #104): per-key state is ONE smoothed value + the last-seen event
# position — bytes per key, forever.

EWMA_OUTPUT_SCHEMA = (
    "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE, ewma DOUBLE"
)
EWMA_STATE_SCHEMA = "prev DOUBLE, last_ts BIGINT, last_id BIGINT"


def _ewma_fn(alpha: float):
    import math

    def q9(x: float) -> float:
        return math.floor(x * 1e9 + 0.5) / 1e9

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev, last_ts, last_id = (
            state.get if state.exists else (None, -1, -1)
        )
        rows: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            rows.extend(
                zip(ts_ms, pdf["event_id"].tolist(), pdf["value"].tolist())
            )
        rows.sort()
        out = {"ts": [], "event_id": [], "value": [], "ewma": []}
        for t, eid, v in rows:
            if (t, eid) <= (last_ts, last_id):
                continue  # out-of-order arrival behind the carried state: drop
            prev = (
                q9(v)
                if prev is None
                else q9(alpha * v + (1.0 - alpha) * prev)
            )
            last_ts, last_id = t, eid
            out["ts"].append(pd.Timestamp(t, unit="ms"))
            out["event_id"].append(eid)
            out["value"].append(v)
            out["ewma"].append(prev)
        state.update((prev, last_ts, last_id))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out["ts"]),
                    **out,
                }
            )

    return fn


def streaming_ewma(
    df: DataFrame,
    alpha: float = 0.3,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Per-user EWMA over an unbounded stream: one smoothed value per
    key carried as state (NoTimeout — the state is a few bytes per
    user, the smallest possible stateful footprint; evicting it would
    RESET the smoothing, which is semantically wrong for EWMA).

    Identical per-step quantization to the batch fold
    (floor(x·1e9+0.5)/1e9), so in-order streams reproduce the batch
    operator's output exactly (pytest-proven across micro-batches).
    Events arriving behind the carried (ts, id) high-water mark are
    DROPPED, not re-folded — a recursive statistic cannot absorb late
    data without replaying everything after it; the batch op is the
    reprocessing authority (same contract as the other streaming twins).

    Expects columns (user_id, ts, event_id, value).
    """
    return (
        df.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_fn(alpha),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
