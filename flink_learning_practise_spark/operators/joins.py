"""Join operators — Spark analog of the reference's
``flink_transform_utils.py`` joins (join_streams:377 window join,
join_with_lookup_table_sql:430 lookup join) plus the interval and as-of
joins a Flink user would reach for (KeyedCoProcess / interval join).

Scale notes:
- lookup joins broadcast the dimension side: the fact table never
  shuffles, the dim ships once per executor. This is the Spark twin of
  Flink's ``FOR SYSTEM_TIME AS OF`` lookup join.
- window joins co-partition both sides on (key, bucket) — one shuffle
  each, bounded state, no cross product across buckets.
- interval joins use an equi-key plus range predicate; Spark executes
  them as a sort-merge join with range pruning, and at stream time the
  same condition bounds state via watermarks.
- the as-of join avoids a per-row subquery (O(n·m)) by unioning both
  sides and carrying the last dimension value forward with a window
  function — one sort per key partition, linear work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Dimension/lookup join (ref join_with_lookup_table_sql:430):
    broadcast the dim so the fact side never shuffles."""
    return fact.join(F.broadcast(dim), on, how)


def window_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    size: str,
    on: Sequence[tuple[str, str]],
) -> DataFrame:
    """Stream-stream window join (ref join_streams:377): rows join iff
    their event times land in the same epoch-aligned tumbling bucket and
    their keys match. ``on`` is a list of (left_col, right_col) pairs."""
    lw = left.withColumn("window_start", F.window(left_ts, size).start)
    rw = right.withColumn("_rw", F.window(right_ts, size).start)
    cond = lw["window_start"] == rw["_rw"]
    for lc, rc in on:
        cond = cond & (lw[lc] == rw[rc])
    return lw.join(rw, cond).drop("_rw")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    on: Sequence[tuple[str, str]],
) -> DataFrame:
    """Interval join (Flink's KeyedStream.intervalJoin): right row joins
    a left row when right_ts ∈ [left_ts - lower, left_ts + upper]."""
    cond = (
        (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    for lc, rc in on:
        cond = cond & (left[lc] == right[rc])
    return left.join(right, cond)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join for when BOTH sides are too big to
    broadcast and a few hot keys dominate (the 100 TB failure mode a
    plain shuffle join can't survive: one reducer gets the hot key's
    entire partition).

    Left rows scatter across ``salts`` sub-buckets of their key; the
    right side replicates ``salts``× (explode of a literal range — cheap
    when right is the smaller-but-unbroadcastable side). The join runs
    on (key, salt), so a hot key's work spreads over ``salts`` reducers.
    Result set is identical to ``left.join(right, key, how)``.

    AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in
    session.py) handles moderate skew automatically at runtime; explicit
    salting is for the planned-ahead case (known hot keys, or skew
    inside aggregations AQE can't split). Only join types that tolerate
    right-row replication are allowed (every unmatched right copy is
    dropped): inner / left outer / left semi."""
    allowed = {"inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi"}
    if how.lower() not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    # collision-proof internal name: silently overwriting a user column
    # called "_salt" would corrupt it (and drop it from the output).
    salt = "__salted_join_salt__"
    for side, cols in (("left", left.columns), ("right", right.columns)):
        if salt in cols:
            raise ValueError(f"{side} input already has a {salt!r} column")
    # salt only needs to vary within a key; the join result is invariant
    # to the assignment, so a hash of a unique per-row id is fine.
    l = left.withColumn(
        salt,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)).cast("int"),
    )
    r = right.withColumn(
        salt, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l.join(r, [key, salt], how).drop(salt)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right_ts <= left_ts and the same key (latest-version lookup — the
    temporal-table join of ref join_with_lookup_table_sql:430, made
    batch-exact).

    Implementation: tag and union both sides, then last(..., ignorenulls)
    over (key ORDER BY ts, side) carries right values forward. One shuffle
    + sort; no per-row subquery, no skew beyond the key distribution.
    Right rows sort before left rows at equal timestamps so an exact
    timestamp tie counts as "already published".
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumns(
        {f"_r_{c}": F.last(f"_r_{c}", ignorenulls=True).over(w) for c in value_cols}
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(c) for c in value_cols],
    )
    return out
