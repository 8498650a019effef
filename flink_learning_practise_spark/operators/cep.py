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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (ts, id) encoded as one fixed-width sortable string so a single MIN
# suffices for "earliest later event" (a struct-min would need engine-
# specific tuple ordering; two chained mins would need two windows).
# 20 digits of epoch-microseconds + 12 of id covers any non-negative
# timestamp/id; negative epochs would break lpad ordering (documented).
_KEY = "lpad(cast(unix_micros({ts}) as string), 20, '0') || lpad(cast({id} as string), 12, '0')"


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    gap: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Match the ordered event pattern ``steps`` per user.

    Returns one row per completed match:
    (user, step1_id, step1_ts, step2_id, step2_ts, ..., stepN_ts) with
    each step within ``gap`` (a SQL interval string, e.g. ``'12 hours'``)
    of the previous one.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    key = F.expr(_KEY.format(ts=ts_col, id=id_col))
    seq = events.select(
        F.col(user_col),
        F.col(id_col),
        F.col(ts_col),
        F.col(type_col),
        key.alias("_k"),
    )
    # one reverse-ordered window; min over preceding rows in DESC order
    # == earliest strictly-later event of each sought type
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.desc("_k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for i, step in enumerate(steps[1:], start=2):
        seq = seq.withColumn(
            f"_nk{i}",
            F.min(F.when(F.col(type_col) == step, F.col("_k"))).over(w),
        )
    seq = seq.persist()  # each chain link re-reads seq; scan+window once

    # out carries exactly ONE pointer at a time — the key of the next
    # step to bind. After binding step i, the pointer for step i+1 comes
    # from the row just matched (the chain continues from there), never
    # from the start row.
    n = len(steps)
    out = seq.filter(F.col(type_col) == steps[0]).select(
        F.col(user_col),
        F.col(id_col).alias("step1_id"),
        F.col(ts_col).alias("step1_ts"),
        F.col("_nk2"),
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = seq.filter(F.col(type_col) == step).select(
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
