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
from pyspark.sql import functions as F
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


def _session_fn(gap_us: int):
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
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                    "closed": [True],
                }
            )
            return

        # Interval-merge SWEEP over the sorted union of the new rows and
        # the carried open-session interval - not an append-only fold:
        # a late in-watermark event can precede the stored session start
        # (round-4 review: the old fold absorbed it without extending
        # start, mis-reporting the session bounds). Sorting the state
        # interval in with the rows handles every arrival order: a late
        # row within gap of the open session extends its START; a late
        # row disjointly EARLIER closes as its own session immediately
        # (should even-later data extend such a session, a second closed
        # row is emitted - the batch operator remains the reprocessing
        # authority, as with every streaming twin here).
        items: list[tuple[int, int, int, float]] = [
            (t, t, 1, v) for t, v in _sorted_rows(pdfs, ("value",))
        ]
        if state.exists:
            start, last, n, total = state.get
            items.append((start, last, n, total))
        items.sort(key=lambda it: (it[0], it[1]))
        emitted = []
        acc = None
        for st, en, n_, tot in items:
            if acc is None:
                acc = [st, en, n_, tot]
            elif st - acc[1] > gap_us:
                emitted.append((acc[0], acc[1], acc[2], acc[3], True))
                acc = [st, en, n_, tot]
            else:
                acc[1] = max(acc[1], en)
                acc[2] += n_
                acc[3] += tot
        if acc is None:  # only null-ts rows arrived; nothing to do
            return
        state.update((acc[0], acc[1], acc[2], acc[3]))
        # Event-time timeout: close when the watermark passes session end
        # + gap (timeout API is in ms). Must be strictly above the
        # current watermark or Spark rejects it (can happen for a key
        # whose data is itself late).
        state.setTimeoutTimestamp(
            max((acc[1] + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )
        emitted.append((acc[0], acc[1], acc[2], acc[3], False))  # open snapshot
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(emitted),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _, _ in emitted],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _, _ in emitted],
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

    CLOSED ROWS ARE UPSERT-STYLE, NOT FINAL: a late event that lands
    inside the watermark but disjoint-EARLIER than the carried session
    is closed immediately as its own session, and a later sweep may
    emit a second closed=true row whose range overlaps it. Downstream
    consumers treating closed rows as final per-session aggregates must
    dedup on (user_id, overlapping range) — e.g. MERGE on key + range
    containment — or read only the latest row per key range.
    """
    gap_us = _interval_to_ms(gap) * 1000
    return (
        df.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _interval_to_ms(interval: str) -> int:
    parts = interval.split()
    if len(parts) != 2:
        raise ValueError(
            f"expected a single '<n> <unit>' interval, got {interval!r} "
            "(compound intervals like '1 hour 30 minutes' are not supported here)"
        )
    qty, unit = parts
    unit = unit.rstrip("s").lower()
    factors = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
        "week": 604_800_000,
    }
    if unit not in factors:
        raise ValueError(
            f"unsupported interval unit {unit!r}; accepted: {sorted(factors)}"
        )
    return int(qty) * factors[unit]


def _sorted_rows(pdfs: Iterator[pd.DataFrame], cols: tuple[str, ...]):
    """(ts_us, *cols) tuples across all Arrow batches, sorted by
    (ts, *cols). MICROSECOND grain - Spark timestamps are us-precision,
    and millisecond truncation (the round-4 review finding) both
    reordered same-millisecond events relative to the batch twins and
    mutated every emitted timestamp. Null-ts rows are dropped: NaT
    int-casts to the int64-min sentinel and would corrupt state.
    The ONE shared conversion point for every stateful operator here
    (cep.py keeps its own us variant)."""
    rows: list[tuple] = []
    for pdf in pdfs:
        mask = pdf["ts"].notna()
        ts_us = (pdf["ts"][mask].astype("int64") // 1_000).tolist()
        rows.extend(zip(ts_us, *(pdf[c][mask].tolist() for c in cols)))
    rows.sort()
    return rows


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


def _attr_fn(window_sec: int):
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
        # ordering at full us precision; the WINDOW CHECK and latency
        # truncate to whole seconds, because the batch twin (#99) uses
        # unix_timestamp on both operands - ms/us arithmetic here would
        # attribute differently on sub-second timestamps (review r4)
        rows = _sorted_rows(pdfs, ("event_id", "event_type"))
        out: list[tuple[int, int, int | None, int | None]] = []
        for t, eid, et in rows:
            if et == "view":
                if view_ts is None or (t, eid) > (view_ts, view_id):
                    view_ts, view_id = t, eid
            elif et == "purchase":
                lat = (
                    t // 1_000_000 - view_ts // 1_000_000
                    if view_ts is not None
                    else None
                )
                if lat is not None and 0 <= lat <= window_sec:
                    out.append((eid, t, view_id, lat))
                else:
                    out.append((eid, t, None, None))
        if view_ts is not None:
            state.update((view_ts, view_id))
            state.setTimeoutTimestamp(
                max(
                    view_ts // 1000 + (window_sec + 1) * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        if out:
            yield pd.DataFrame(
                {
                    "purchase_id": [p for p, _, _, _ in out],
                    "user_id": [user_id] * len(out),
                    "purchase_ts": [pd.Timestamp(t, unit="us") for _, t, _, _ in out],
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
    window_sec = _interval_to_ms(window) // 1000
    return (
        df.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _attr_fn(window_sec),
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
        rows = _sorted_rows(pdfs, ("event_id", "value"))
        out = {"ts": [], "event_id": [], "value": [], "ewma": []}
        for t, eid, v in rows:
            # the behind-state guard applies only once state EXISTS:
            # prev is the no-state sentinel otherwise, and comparing a
            # fresh key's (possibly pre-epoch) event against (-1, -1)
            # would silently drop it (review r4)
            if prev is not None and (t, eid) <= (last_ts, last_id):
                continue  # out-of-order arrival behind the carried state: drop
            # NaN (null value) poisons the recursion via the arithmetic
            # itself (NaN prev stays NaN forever) — emitted as null,
            # carried as NaN, same as the batch fold (review r5); q9 on
            # NaN would raise, so it is bypassed for poisoned steps
            t_raw = v if prev is None else alpha * v + (1.0 - alpha) * prev
            prev = t_raw if t_raw != t_raw else q9(t_raw)
            last_ts, last_id = t, eid
            out["ts"].append(pd.Timestamp(t, unit="us"))
            out["event_id"].append(eid)
            out["value"].append(v)
            out["ewma"].append(None if prev != prev else prev)
        # only write state when there is something to carry: a batch of
        # nothing-but-dropped rows for a FRESH key would otherwise pin a
        # permanent (None,-1,-1) entry that no timer ever evicts
        # (NoTimeout by design) — slow state growth on junk keys
        if prev is not None or state.exists:
            state.update((prev, last_ts, last_id))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out["ts"]),
                    **out,
                    # nullable Float64: poisoned steps must reach the
                    # sink as SQL NULL, not NaN (a float64 column would
                    # coerce None back to NaN; review r5)
                    "ewma": pd.array(out["ewma"], dtype="Float64"),
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
    Late policy, two tiers: rows older than the WATERMARK are dropped
    by the engine before reaching the operator (EventTimeTimeout mode —
    under NoTimeout the watermark is inert and ``watermark_delay``
    would be a decoy parameter; review r4); rows inside the watermark
    but behind the carried (ts, id) high-water mark are dropped here —
    a recursive statistic cannot absorb late data without replaying
    everything after it; the batch op is the reprocessing authority
    (same contract as the other streaming twins). No timers are ever
    set, so state still lives forever (the EWMA contract).

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
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming activity bitmap (the unbounded twin of #121
# plans/events_analytics.activity_streaks): per-user state is ONE
# 64-bit day mask — the smallest possible retention footprint, carried
# forever by design (evicting it would forget the user's history;
# NoTimeout is the contract, same as streaming EWMA).

BITMAP_OUTPUT_SCHEMA = (
    "user_id BIGINT, day_mask BIGINT, days_active INT, longest_streak INT"
)
BITMAP_STATE_SCHEMA = "mask BIGINT"


def _bitmap_fn(epoch_date):
    import datetime

    epoch = datetime.date.fromisoformat(epoch_date)

    def longest_run(mask: int) -> int:
        k = 0
        while mask:
            mask &= mask << 1
            k += 1
        return k

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # state/output are signed BIGINT; bit 63 therefore stores as a
        # NEGATIVE long (two's complement), exactly like the batch
        # twin's shiftleft(1L, 63) wraparound — Python's unbounded int
        # would otherwise overflow the schema at 2^63 (review r5)
        (raw,) = state.get if state.exists else (0,)
        mask = int(raw) + (1 << 64 if raw < 0 else 0)
        seen = False
        for ts_us, in ((r[0],) for r in _sorted_rows(pdfs, ())):
            idx = (
                datetime.datetime.fromtimestamp(
                    ts_us / 1e6, tz=datetime.timezone.utc
                ).date()
                - epoch
            ).days
            if 0 <= idx < 64:
                mask |= 1 << idx
                seen = True
        signed = mask - (1 << 64) if mask >= (1 << 63) else mask
        if seen or state.exists:
            state.update((signed,))
        if seen:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "day_mask": [signed],
                    "days_active": [bin(mask).count("1")],
                    "longest_streak": [longest_run(mask)],
                }
            )

    return fn


def streaming_activity_bitmap(
    df: DataFrame, epoch_date: str = "2024-01-01"
) -> DataFrame:
    """Per-user active-day bitmask over an unbounded stream, emitted as
    an UPSERT row per updated user per micro-batch (update mode): the
    streaming twin of the batch activity/streak report, with identical
    columns so a MERGE sink converges to the batch output.

    Day indexing is UTC days since ``epoch_date`` clamped to [0, 64) —
    the same window the batch op uses; out-of-range events leave state
    untouched. NoTimeout: retention state is a permanent 8 bytes per
    user (the point of a bitmap layout); there is nothing to expire
    without forgetting history.

    Expects columns (user_id, ts).
    """
    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            _bitmap_fn(epoch_date),
            outputStructType=BITMAP_OUTPUT_SCHEMA,
            stateStructType=BITMAP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming CUMULATE window (the unbounded twin of
# operators/windows.cumulate_window, SURVEY #133): per-(frame, key)
# state is two fixed-length integer arrays — one (count, micro-sum)
# slot per slice, so state is EXACTLY max_size/step * 16 bytes per
# active frame-key and every emitted sum replays the batch op's
# decimal(18,6) arithmetic (values quantize to integer micros with the
# repo's floor(x*1e6+0.5) idiom; integer sums are order-exact).

CUMULATE_OUTPUT_SCHEMA = (
    "window_start TIMESTAMP, window_end TIMESTAMP, event_type STRING, "
    "n_events BIGINT, sum_value DOUBLE"
)
CUMULATE_STATE_SCHEMA = "counts ARRAY<BIGINT>, micros ARRAY<BIGINT>"


def _cumulate_fn(max_size_sec: int, step_sec: int):
    import math

    n_slices = max_size_sec // step_sec

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # key values arrive as numpy scalars; state goes through a JSON
        # layer that only takes native ints — coerce at the boundary
        frame0_sec, event_type = int(key[0]), key[1]
        if state.hasTimedOut:
            # every window of the frame was already emitted as an
            # upsert; the timer only reclaims the slice arrays
            state.remove()
            return
        counts, micros = (
            ([int(x) for x in state.get[0]], [int(x) for x in state.get[1]])
            if state.exists
            else ([0] * n_slices, [0] * n_slices)
        )
        min_si = n_slices
        for ts_us, v in _sorted_rows(pdfs, ("value",)):
            si = (int(ts_us) // 1_000_000 - frame0_sec) // step_sec
            if 0 <= si < n_slices:
                counts[si] += 1
                # null value arrives as NaN: COUNT it, skip the SUM —
                # the batch aggregate's null semantics (review r5)
                if v == v:
                    micros[si] += math.floor(v * 1e6 + 0.5)
                min_si = min(min_si, si)
        if min_si == n_slices:
            return
        state.update((counts, micros))
        # frame fully closes one max_size past its start; keep state
        # until the watermark proves no slice can still change
        state.setTimeoutTimestamp(
            max(
                (frame0_sec + max_size_sec) * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        out = {
            "window_start": [],
            "window_end": [],
            "event_type": [],
            "n_events": [],
            "sum_value": [],
        }
        cum_n = sum(counts[: min_si + 1])
        cum_m = sum(micros[: min_si + 1])
        for e in range(min_si, n_slices):
            if e > min_si:
                cum_n += counts[e]
                cum_m += micros[e]
            out["window_start"].append(pd.Timestamp(frame0_sec, unit="s"))
            out["window_end"].append(
                pd.Timestamp(frame0_sec + (e + 1) * step_sec, unit="s")
            )
            out["event_type"].append(event_type)
            out["n_events"].append(cum_n)
            out["sum_value"].append(cum_m / 1e6)
        yield pd.DataFrame(out)

    return fn


def streaming_cumulate_window(
    df: DataFrame,
    max_size_sec: int = 86400,
    step_sec: int = 3600,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """CUMULATE windows over an unbounded stream, emitted as UPSERT
    rows (update mode): every window whose prefix gained events this
    micro-batch re-emits with its current cumulative (count, sum), so
    a MERGE sink keyed on (window_start, window_end, event_type)
    converges to the batch operator's output — identical columns and
    identical decimal-exact sums (integer-micros state).

    Late policy: rows older than the watermark never reach the
    operator; rows inside the watermark land in their slice and
    re-emit the affected window suffix (upsert semantics absorb the
    correction — unlike the recursive EWMA, a cumulate window CAN take
    late data, because slice sums are commutative). State is reclaimed
    by an event-time timer one full max_size after the frame start.

    Expects columns (ts, event_type, value).
    """
    frame0 = (
        F.floor(F.unix_timestamp(F.col("ts")) / max_size_sec) * max_size_sec
    ).cast("long")
    return (
        df.withColumn("frame0_sec", frame0)
        .withWatermark("ts", watermark_delay)
        .groupBy("frame0_sec", "event_type")
        .applyInPandasWithState(
            _cumulate_fn(max_size_sec, step_sec),
            outputStructType=CUMULATE_OUTPUT_SCHEMA,
            stateStructType=CUMULATE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming Holt smoothing (the unbounded twin of #160
# plans/events_analytics.holt_smoothing): per-user state is the
# (level, trend) pair plus the (ts, id) high-water mark — EWMA's
# footprint plus one double. Same contracts as streaming EWMA:
# NoTimeout-style permanent state (evicting would reset the
# smoothing), watermark-late rows engine-dropped, inside-watermark
# out-of-order rows dropped at the high-water mark (a recursion cannot
# absorb them; the batch op is the reprocessing authority), per-step
# floor-quantization identical to the batch fold so in-order streams
# reproduce it exactly.

HOLT_OUTPUT_SCHEMA = (
    "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE, "
    "level DOUBLE, trend DOUBLE"
)
HOLT_STATE_SCHEMA = "lvl DOUBLE, trd DOUBLE, last_ts BIGINT, last_id BIGINT"


def _holt_fn(alpha: float, beta: float):
    import math

    def q9(x: float) -> float:
        return math.floor(x * 1e9 + 0.5) / 1e9

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        lvl, trd, last_ts, last_id = (
            state.get if state.exists else (None, None, -1, -1)
        )
        out = {"ts": [], "event_id": [], "value": [], "level": [], "trend": []}
        for t, eid, v in _sorted_rows(pdfs, ("event_id", "value")):
            if lvl is not None and (t, eid) <= (last_ts, last_id):
                continue  # behind the carried state: drop (EWMA's rule)
            if v != v or (lvl is not None and lvl != lvl):
                lvl = trd = float("nan")  # poison, like the batch fold
            elif lvl is None:
                lvl, trd = q9(v), 0.0
            else:
                nl = q9(alpha * v + (1.0 - alpha) * (lvl + trd))
                trd = q9(beta * (nl - lvl) + (1.0 - beta) * trd)
                lvl = nl
            last_ts, last_id = t, eid
            out["ts"].append(pd.Timestamp(t, unit="us"))
            out["event_id"].append(eid)
            out["value"].append(v)
            out["level"].append(None if lvl != lvl else lvl)
            out["trend"].append(None if trd != trd else trd)
        if lvl is not None or state.exists:
            state.update((lvl, trd, last_ts, last_id))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out["ts"]),
                    **out,
                    # poisoned steps reach the sink as SQL NULL, not NaN
                    "level": pd.array(out["level"], dtype="Float64"),
                    "trend": pd.array(out["trend"], dtype="Float64"),
                }
            )

    return fn


def streaming_holt(
    df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.3,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Per-user Holt double-exponential smoothing over an unbounded
    stream — level + trend carried as state. Expects columns
    (user_id, ts, event_id, value); see the module comment above
    :data:`HOLT_OUTPUT_SCHEMA` for the contracts."""
    return (
        df.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _holt_fn(alpha, beta),
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming sequence packing (the unbounded twin of #71
# operators/curation.pack_sequences): per-source state is ONE running
# token count + the doc-id high-water mark — two longs per source, a
# bounded catalog, so NoTimeout is the contract (evicting would restart
# pack numbering mid-stream; the activity-bitmap rule). Each arriving
# document is assigned pack_id = floor(tokens_before_it / capacity),
# exactly the batch packer's running-sum rule, so an in-doc-id-order
# stream reproduces the batch assignment bit-for-bit (pytest-pinned).
# Out-of-order arrivals behind the carried mark are dropped — a
# running-sum assignment cannot absorb late docs without renumbering
# everything after them; the batch op is the reprocessing authority
# (the streaming-EWMA late contract).

PACK_OUTPUT_SCHEMA = (
    "source STRING, doc_id BIGINT, n_tokens BIGINT, pack_id BIGINT"
)
PACK_STATE_SCHEMA = "cum_tokens BIGINT, last_doc BIGINT"


def _pack_fn(capacity: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        cum, last = state.get if state.exists else (0, -1)
        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["doc_id"].tolist(), pdf["tok"].tolist())
            )
        rows.sort()  # doc_id order within the micro-batch
        out = {"doc_id": [], "n_tokens": [], "pack_id": []}
        emitted = False
        for d, tok in rows:
            if d <= last:
                continue  # behind the carried high-water mark: drop
            out["doc_id"].append(int(d))
            out["n_tokens"].append(int(tok))
            out["pack_id"].append(int(cum) // capacity)
            cum = int(cum) + int(tok)
            last = int(d)
            emitted = True
        # fresh key with nothing but dropped rows: don't pin state
        if emitted or state.exists:
            state.update((int(cum), int(last)))
        if out["doc_id"]:
            yield pd.DataFrame(
                {
                    "source": [source] * len(out["doc_id"]),
                    **out,
                }
            )

    return fn


def streaming_pack(
    df: DataFrame,
    capacity: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Continuous sequence packing: documents stream in, each is
    tokenized map-side (the batch op's normalize+split, JVM-only) and
    assigned its running-sum pack id per shard. Output one row per doc:
    (source, doc_id, n_tokens, pack_id)."""
    from pyspark.sql import functions as F

    from ..operators.text import normalize

    tok = df.select(
        F.col(shard_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(normalize(F.col(text_col)), " "))
        .cast("long")
        .alias("tok"),
    )
    return tok.groupBy("source").applyInPandasWithState(
        _pack_fn(capacity),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
