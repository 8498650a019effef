"""Streaming CEP — the real Flink-CEP analog (ref flink_typora.md:505):
the same skip-till-next-match funnel as ``operators/cep.funnel``, run
continuously over an event stream with watermark-correct ordering.

Why not the batch plan on micro-batches: pattern matching is
order-sensitive, and micro-batches deliver events out of order within
the watermark horizon. So events BUFFER in per-user state until the
watermark passes them (no later event can precede them), then feed an
incremental matcher in (ts, id) order. Completed matches emit
append-mode; partial matches live in state.

State is bounded on both axes:
- the buffer holds only events above the watermark (size ∝ arrival
  rate × watermark delay);
- partial matches die once the watermark passes last_bound_ts + gap
  (any future event of the awaited type would be out of gap), enforced
  by an event-time timer — so state never outlives gap + delay.

This is the applyInPandasWithState twin of a Flink KeyedProcessFunction
with CEP's NFA state. Parity with the batch operator is proven in
tests/test_streaming.py (same fixture, same matches).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stateful import _interval_to_ms

_STATE_SCHEMA = (
    "buf_ts ARRAY<BIGINT>, buf_id ARRAY<BIGINT>, buf_sat ARRAY<BIGINT>, "
    "partials ARRAY<STRING>"
)

# step predicates (Flink CEP where()) evaluate JVM-side BEFORE the
# state operator: funnel_stream projects one packed bitmask column —
# bit i set ⇔ the row satisfies step i's predicate — so the Python
# matcher stays a pure sequencer (no expression evaluation per event)
# and the predicate work happens in whole-stage codegen.
_SAT = "_sat"


def _funnel_fn(n: int, gap_ms: int, ts_col: str, id_col: str):
    gap_us = gap_ms * 1000  # matcher runs at µs grain — see below

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        buf: list[tuple[int, int, int]] = []
        partials: list[dict] = []
        if state.exists:
            bt, bi, bs, ps = state.get
            buf = list(zip(bt, bi, bs))
            partials = [json.loads(p) for p in ps]
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                # µs, not ms: the batch operator orders by (µs ts, id),
                # and ms truncation would tie events <1ms apart, letting
                # the stream bind a different event than batch — breaking
                # the documented parity. (Spark timestamps are µs-grain,
                # so ns→µs loses nothing.)
                ts_us = (pdf[ts_col].astype("int64") // 1_000).tolist()
                buf.extend(zip(ts_us, pdf[id_col].tolist(), pdf[_SAT].tolist()))

        wm_us = state.getCurrentWatermarkMs() * 1000
        # events strictly below the watermark are final: later batches
        # are filtered against a watermark at least this high, so
        # nothing can arrive before them in event time (strict < guards
        # the boundary case of an on-watermark peer still in flight).
        ready = sorted(e for e in buf if e[0] < wm_us)
        rest = [e for e in buf if e[0] >= wm_us]

        completed: list[dict] = []
        for t, eid, sat in ready:
            survivors: list[dict] = []
            for p in partials:
                if (sat >> p["step"]) & 1:
                    # the NEXT event satisfying the awaited step: binds
                    # if within gap, otherwise the partial dies
                    # (strict next-match)
                    if t - p["last"] <= gap_us:
                        p2 = {
                            "step": p["step"] + 1,
                            "last": t,
                            "ids": p["ids"] + [eid],
                            "tss": p["tss"] + [t],
                        }
                        (completed if p2["step"] == n else survivors).append(p2)
                else:
                    survivors.append(p)
            partials = survivors
            if sat & 1:
                partials.append({"step": 1, "last": t, "ids": [eid], "tss": [t]})

        # prune doomed partials: any future event has ts > wm, so once
        # wm - last > gap the awaited step can never bind in gap.
        partials = [p for p in partials if wm_us - p["last"] <= gap_us]

        if not rest and not partials:
            state.remove()
        else:
            state.update(
                (
                    [e[0] for e in rest],
                    [e[1] for e in rest],
                    [e[2] for e in rest],
                    [json.dumps(p) for p in partials],
                )
            )
            # wake when the watermark passes the next buffered event (to
            # finalize it) or the earliest partial's gap deadline (to
            # prune it); must sit strictly above the current watermark.
            # Timer API is ms-grain: floor-to-ms + 1 guarantees the fired
            # watermark (ms*1000) strictly exceeds the µs deadline.
            candidates = [e[0] for e in rest] + [p["last"] + gap_us for p in partials]
            state.setTimeoutTimestamp(
                max(min(candidates) // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )

        if completed:
            data: dict = {"user_id": [user] * len(completed)}
            for i in range(n):
                data[f"step{i + 1}_id"] = [m["ids"][i] for m in completed]
                data[f"step{i + 1}_ts"] = [
                    pd.Timestamp(m["tss"][i], unit="us") for m in completed
                ]
            yield pd.DataFrame(data)

    return fn


_ABSENCE_STATE_SCHEMA = (
    "buf_ts ARRAY<BIGINT>, buf_id ARRAY<BIGINT>, buf_sat ARRAY<BIGINT>, "
    "pend_ts ARRAY<BIGINT>, pend_id ARRAY<BIGINT>"
)


def _absence_fn(gap_ms: int, ts_col: str, id_col: str):
    # sat bit 0 = matches `first`, bit 1 = matches `absent` (JVM-side
    # predicate evaluation, same scheme as the funnel matcher)
    gap_us = gap_ms * 1000  # µs grain, matching the batch operator

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        buf: list[tuple[int, int, int]] = []
        pending: list[tuple[int, int]] = []  # (ts, id) of unrefuted firsts
        if state.exists:
            bt, bi, bs, pt, pi = state.get
            buf = list(zip(bt, bi, bs))
            pending = list(zip(pt, pi))
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts_us = (pdf[ts_col].astype("int64") // 1_000).tolist()
                buf.extend(zip(ts_us, pdf[id_col].tolist(), pdf[_SAT].tolist()))

        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = sorted(e for e in buf if e[0] < wm_us)
        rest = [e for e in buf if e[0] >= wm_us]

        for t, eid, sat in ready:
            if (sat >> 1) & 1:
                # refutes every earlier pending first within gap
                pending = [
                    (pt, pi)
                    for pt, pi in pending
                    if not ((pt, pi) < (t, eid) and t - pt <= gap_us)
                ]
            if sat & 1:
                pending.append((t, eid))

        # a pending first is SAFE once the watermark passes its deadline:
        # any future event has ts >= wm > ts + gap, out of refuting range
        emitted = [(pt, pi) for pt, pi in pending if wm_us > pt + gap_us]
        pending = [(pt, pi) for pt, pi in pending if wm_us <= pt + gap_us]

        if not rest and not pending:
            state.remove()
        else:
            state.update(
                (
                    [e[0] for e in rest],
                    [e[1] for e in rest],
                    [e[2] for e in rest],
                    [p[0] for p in pending],
                    [p[1] for p in pending],
                )
            )
            candidates = [e[0] for e in rest] + [p[0] + gap_us for p in pending]
            # timer API is ms-grain: floor-to-ms + 1 makes the fired
            # watermark (ms*1000) strictly exceed the µs deadline
            state.setTimeoutTimestamp(
                max(min(candidates) // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )

        if emitted:
            emitted.sort()
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(emitted),
                    "step1_id": [i for _, i in emitted],
                    "step1_ts": [pd.Timestamp(t, unit="us") for t, _ in emitted],
                }
            )

    return fn


def not_followed_by_stream(
    df: DataFrame,
    first,
    absent,
    gap: str,
    watermark_delay: str = "1 minute",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Continuous absence detection (Flink CEP notFollowedBy + within):
    emit each ``first`` event once the watermark proves NO ``absent``
    event followed it within ``gap`` — the pattern that can only fire on
    the passage of time, hence the event-time timer. State = buffered
    out-of-order events + unrefuted firsts, both watermark-bounded.

    ``first``/``absent`` take the batch operator's step forms: an
    event-type string or a ``(label, Column)`` predicate pair."""
    from pyspark.sql import functions as F

    from ..operators.cep import _normalize_steps

    (_, fpred), (_, apred) = _normalize_steps([first, absent], type_col)
    sat = (
        F.when(fpred, F.lit(1)).otherwise(F.lit(0))
        + F.when(apred, F.lit(2)).otherwise(F.lit(0))
    )
    df = df.filter(F.col(ts_col).isNotNull() & F.col(id_col).isNotNull())
    projected = df.select(
        F.col(user_col), F.col(ts_col), F.col(id_col),
        sat.cast("bigint").alias(_SAT),
    )
    return (
        projected.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            _absence_fn(_interval_to_ms(gap), ts_col, id_col),
            outputStructType="user_id BIGINT, step1_id BIGINT, step1_ts TIMESTAMP",
            stateStructType=_ABSENCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def funnel_stream(
    df: DataFrame,
    steps: Sequence,
    gap: str,
    watermark_delay: str = "1 minute",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Continuous skip-till-next-match funnel over an event stream.

    ``steps`` accepts the same forms as the batch operator: event-type
    strings or ``(label, Column)`` predicate pairs (Flink CEP
    ``where()``), freely mixed. Predicates are evaluated JVM-side into
    a packed bitmask before the state operator, so arbitrary Column
    logic costs nothing per-event in Python.

    Emits one append-mode row per COMPLETED match:
    (user_id, step1_id, step1_ts, ..., stepN_id, stepN_ts) — the same
    shape and semantics as the batch ``operators/cep.funnel``.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    out_schema = "user_id BIGINT, " + ", ".join(
        f"step{i}_id BIGINT, step{i}_ts TIMESTAMP"
        for i in range(1, len(steps) + 1)
    )
    from pyspark.sql import functions as F

    from ..operators.cep import _normalize_steps

    preds = _normalize_steps(steps, type_col)
    sat = None
    for i, (_, pred) in enumerate(preds):
        bit = F.when(pred, F.lit(1 << i)).otherwise(F.lit(0))
        sat = bit if sat is None else sat + bit
    # null-time/id events can't be sequenced (and NaT would corrupt the
    # int64 buffer encoding) — drop them before the watermark.
    df = df.filter(F.col(ts_col).isNotNull() & F.col(id_col).isNotNull())
    projected = df.select(
        F.col(user_col), F.col(ts_col), F.col(id_col),
        sat.cast("bigint").alias(_SAT),
    )
    return (
        projected.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            _funnel_fn(len(preds), _interval_to_ms(gap), ts_col, id_col),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
