"""CEP-lite sequence detection — the Spark batch analog of Flink's CEP
pattern API (ref flink_learning/flink_typora.md:505 lists CEP as a core
capability; Pattern.begin("view").next("click").next("purchase")).

Semantics: *skip-till-next-match*, the default funnel semantic — a
match starts at every event of the first step type, and each subsequent
step binds to the EARLIEST event of its type strictly later in the
per-user sequence, within ``gap`` of the previous bound event. Distinct
starts may share later steps (MATCH_RECOGNIZE "AFTER MATCH SKIP TO NEXT
ROW"). The per-user sequence order is (ts, id) — a deterministic total
order even under timestamp ties.

Scale shape: ONE window over (user, sequence-key) computes, for every
row, the next-event pointer for ALL later step types (k-1 cumulative
mins over the same reverse-ordered frame — one exchange on user_id, one
sort, one WindowExec). Each chain link is then an equi-join on
(user, pointer) — no range join, no per-user cross product, cost linear
in events + matches. That holds at 100 TB: everything is hash-partitioned
by user, and no state ever exceeds a row's fixed set of pointers.
"""

from __future__ import annotations

import weakref
from collections import deque
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class FunnelCache:
    """Bounded LRU pool of the persisted intermediates funnel() creates
    (the chain links re-read the scan+window frame instead of
    recomputing it). Each distinct funnel invocation is a new cache
    entry, so an unbounded pool would pin storage for the life of the
    session; eviction unpersists the oldest entry. Unpersist is always
    correctness-safe — a plan over a released cache just recomputes.

    Ownership is the caller's: pass a pool to ``funnel(..., cache=...)``
    and call :meth:`release` when done. Callers that don't care get a
    default pool scoped to their SparkSession (dropped automatically
    when the session is garbage-collected) — no module-global state.
    """

    def __init__(self, limit: int = 4) -> None:
        self.limit = limit
        self._pinned: deque[DataFrame] = deque()

    def __len__(self) -> int:
        return len(self._pinned)

    def pinned(self) -> tuple[DataFrame, ...]:
        return tuple(self._pinned)

    def pin(self, cached: DataFrame) -> None:
        # CacheManager keys entries by plan equivalence, so two pins of
        # the same plan are ONE cache entry — evicting the older pin
        # would kill the newer one's cache too. Dedupe by sameResult:
        # re-pinning an already-pinned plan is an LRU touch, not a
        # second entry.
        try:
            new_plan = cached._jdf.queryExecution().analyzed()
            for i, d in enumerate(self._pinned):
                if d._jdf.queryExecution().analyzed().sameResult(new_plan):
                    del self._pinned[i]
                    break
        except Exception:
            pass
        self._pinned.append(cached)
        while len(self._pinned) > self.limit:
            old = self._pinned.popleft()
            try:
                old.unpersist()
            except Exception:
                pass  # session already stopped — nothing left to release

    def release(self) -> None:
        """Unpersist every intermediate still pinned in this pool."""
        while self._pinned:
            old = self._pinned.popleft()
            try:
                old.unpersist()
            except Exception:
                pass


# Default pools, one per live SparkSession. Weak keys: when a session is
# garbage-collected its pool (and the unpersist bookkeeping for caches
# that died with the session) goes with it — the module itself keeps no
# session-outliving state.
_SESSION_POOLS: weakref.WeakKeyDictionary[SparkSession, FunnelCache] = (
    weakref.WeakKeyDictionary()
)


def _default_pool(spark: SparkSession) -> FunnelCache:
    pool = _SESSION_POOLS.get(spark)
    if pool is None:
        pool = FunnelCache()
        _SESSION_POOLS[spark] = pool
    return pool


def release_caches(spark: SparkSession | None = None) -> None:
    """Release the session-default pool (explicit cleanup for tests /
    services that want storage back now). With no argument, releases
    the active session's pool, if any."""
    spark = spark or SparkSession.getActiveSession()
    if spark is not None and spark in _SESSION_POOLS:
        _SESSION_POOLS[spark].release()

# (ts, id) encoded as one fixed-width sortable string so a single MIN
# suffices for "earliest later event" (a struct-min would need engine-
# specific tuple ordering; two chained mins would need two windows).
# 20 digits each side: int64 maxes at 19 digits, and lpad TRUNCATES
# inputs longer than the pad width, so anything narrower would silently
# corrupt large ids (e.g. monotonically_increasing_id = partition<<33).
# Negative epochs/ids would break lpad ordering (documented unsupported).
# The cast makes the key type-agnostic: unix_micros only accepts TIMESTAMP
# (instant), but parquet written without a UTC flag arrives as
# TIMESTAMP_NTZ. Under the engine's UTC session timezone (session.py) the
# NTZ->instant cast is value-preserving; with a non-UTC session tz it is
# still a consistent monotone shift on both the key and the deadline, so
# ordering and gap arithmetic are unaffected (DST-ambiguous local times
# are the documented exception — run event-time jobs in UTC).
_KEY = (
    "lpad(cast(unix_micros(cast({ts} as timestamp)) as string), 20, '0')"
    " || lpad(cast({id} as string), 20, '0')"
)


def _normalize_steps(steps, type_col):
    """Each step is a bare event-type string (sugar for type equality)
    or a (label, Column predicate) pair — Flink CEP's where() clauses."""
    out = []
    for s in steps:
        if isinstance(s, str):
            out.append((s, F.col(type_col) == s))
        else:
            label, pred = s
            out.append((label, pred))
    return out


def funnel(
    events: DataFrame,
    steps: Sequence,
    gap: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    cache: FunnelCache | None = None,
) -> DataFrame:
    """Match the ordered event pattern ``steps`` per user.

    A step is an event-type string or a ``(label, Column)`` predicate
    pair (e.g. ``("big_buy", (F.col("event_type") == "purchase") &
    (F.col("value") > 100))`` — the where() clause of a Flink CEP step).
    Flink's ``times(n)`` quantifier is the same step repeated n times
    (``["click", "click", "click"]`` = three consecutive next-matched
    clicks, each within ``gap`` of the previous).

    ``cache`` scopes the persisted scan+window intermediate: pass your
    own :class:`FunnelCache` to own its lifetime (call ``release()``
    when done), or leave None for a pool tied to the SparkSession.

    Returns one row per completed match:
    (user, step1_id, step1_ts, step2_id, step2_ts, ..., stepN_ts) with
    each step within ``gap`` (a SQL interval string, e.g. ``'12 hours'``)
    of the previous one.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    preds = _normalize_steps(steps, type_col)
    key = F.expr(_KEY.format(ts=ts_col, id=id_col))
    # events without a time/id can't take a place in the sequence order;
    # a NULL key would silently float to one end of the window sort.
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(id_col).isNotNull()
    )
    seq = events.select(
        F.col(user_col),
        F.col(id_col),
        F.col(ts_col),
        F.col(type_col),
        key.alias("_k"),
        *[pred.alias(f"_is{i}") for i, (_, pred) in enumerate(preds, start=1)],
    )
    # one reverse-ordered window; min over preceding rows in DESC order
    # == earliest strictly-later event satisfying each sought predicate
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.desc("_k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for i in range(2, len(preds) + 1):
        seq = seq.withColumn(
            f"_nk{i}",
            F.min(F.when(F.col(f"_is{i}"), F.col("_k"))).over(w),
        )
    seq = seq.persist()  # each chain link re-reads seq; scan+window once
    if cache is None:
        cache = _default_pool(events.sparkSession)
    cache.pin(seq)

    # out carries exactly ONE pointer at a time — the key of the next
    # step to bind. After binding step i, the pointer for step i+1 comes
    # from the row just matched (the chain continues from there), never
    # from the start row.
    n = len(preds)
    out = seq.filter(F.col("_is1")).select(
        F.col(user_col),
        F.col(id_col).alias("step1_id"),
        F.col(ts_col).alias("step1_ts"),
        F.col("_nk2"),
    )
    for i in range(2, n + 1):
        nxt = seq.filter(F.col(f"_is{i}")).select(
            F.col(user_col).alias("_u"),
            F.col("_k").alias("_match_k"),
            F.col(id_col).alias(f"step{i}_id"),
            F.col(ts_col).alias(f"step{i}_ts"),
            *([F.col(f"_nk{i + 1}")] if i < n else []),
        )
        out = (
            out.join(
                nxt,
                (out[user_col] == nxt["_u"])
                & (out[f"_nk{i}"] == nxt["_match_k"]),
            )
            .drop("_u", f"_nk{i}", "_match_k")
            .filter(
                F.col(f"step{i}_ts")
                <= F.col(f"step{i - 1}_ts") + F.expr(f"INTERVAL {gap}")
            )
        )
    return out


def not_followed_by(
    events: DataFrame,
    first,
    absent,
    gap: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Absence pattern — Flink CEP's ``notFollowedBy`` within a time
    window: events matching ``first`` with NO ``absent``-matching event
    in the ``gap`` after them (e.g. views never clicked: abandonment).

    Same machinery as :func:`funnel`: one window computes the next
    ``absent`` key per row; the match succeeds when that pointer is
    NULL or decodes to a timestamp beyond the gap (the key embeds
    epoch-micros in its first 20 chars, so no join is needed at all —
    a pure scan + window + filter, nothing else).

    Returns (user, step1_id, step1_ts).
    """
    (flabel, fpred), (alabel, apred) = _normalize_steps(
        [first, absent], type_col
    )
    key = F.expr(_KEY.format(ts=ts_col, id=id_col))
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(id_col).isNotNull()
    )
    seq = events.select(
        F.col(user_col),
        F.col(id_col),
        F.col(ts_col),
        key.alias("_k"),
        fpred.alias("_isf"),
        apred.alias("_isa"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.desc("_k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = seq.withColumn(
        "_na", F.min(F.when(F.col("_isa"), F.col("_k"))).over(w)
    )
    next_absent_us = F.expr("CAST(substring(_na, 1, 20) AS BIGINT)")
    # add the gap BEFORE casting to instant: for NTZ inputs the deadline
    # is then a wall-clock gap, matching funnel's per-link filter
    # (step_ts <= prev_ts + INTERVAL) which compares in the input's own
    # domain. For TIMESTAMP inputs the cast is a no-op, so the two forms
    # agree; they differ only for NTZ across a DST transition under a
    # non-UTC session tz (documented unsupported — run event time in UTC).
    deadline_us = F.expr(
        f"unix_micros(cast(({ts_col} + INTERVAL {gap}) as timestamp))"
    )
    return (
        seq.filter(F.col("_isf"))
        .filter(F.col("_na").isNull() | (next_absent_us > deadline_us))
        .select(
            F.col(user_col),
            F.col(id_col).alias("step1_id"),
            F.col(ts_col).alias("step1_ts"),
        )
    )
