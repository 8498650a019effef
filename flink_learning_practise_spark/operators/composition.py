"""Multi-stream composition operators — Spark analogs of Flink's
``union`` / ``connect``+CoMap / ``CoGroup`` / keyed running ``reduce``
(reference: flink_learning/flink_typora.md:614 DataStream operator
table — `join`/`connect`, `reduce`; :865 DataSet transformations —
Join/CoGroup, Union).

Spark-first mapping:

- **union**: ``unionByName`` — resolves by column NAME, not position
  (positional ``union`` silently mismatches reordered schemas).
- **connect / CoMap**: Flink keeps two differently-typed streams side by
  side and maps each with its own function. The relational analog is
  *normalize-then-union*: each side projects into a shared schema (its
  "CoMap" half), a tag column records provenance, and missing columns
  null-fill. Downstream logic branches on the tag — same semantics, one
  plan, fully optimizable (Catalyst prunes per-side projections).
- **CoGroup**: two keyed inputs merged per key. The scale path is
  *aggregate-then-join*: each side reduces to one row per key BEFORE the
  join (map-side partial agg ⇒ shuffle is O(groups)), then a full outer
  join aligns the keys. A ``cogroup().applyInPandas`` escape hatch covers
  genuinely non-relational merge logic (Arrow-batched, both groups in
  memory per key — bounded by per-key group size, not table size).
- **keyed running reduce**: Flink's ``keyBy().reduce`` emits the updated
  aggregate on EVERY element. Batch twin: cumulative window frame
  (UNBOUNDED PRECEDING → CURRENT ROW) — one shuffle (partition by key,
  sort within), no iterative state.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def union_all(*dfs: DataFrame) -> DataFrame:
    """Merge same-schema inputs (Flink ``union``). Name-resolved, so
    column order differences are safe; schemas must otherwise match."""
    if not dfs:
        raise ValueError("union_all needs at least one input")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def connect_tagged(
    left: DataFrame,
    right: DataFrame,
    tag_col: str = "source",
    left_tag: str = "left",
    right_tag: str = "right",
) -> DataFrame:
    """Flink ``connect`` + CoMap analog: each input is already projected
    to (a subset of) the shared schema by its own per-side map; this
    tags provenance and unions, null-filling columns the other side
    lacks. Works identically for batch frames and streaming frames.
    """
    if tag_col in left.columns or tag_col in right.columns:
        raise ValueError(f"tag column {tag_col!r} already exists in an input")
    lt = left.withColumn(tag_col, F.lit(left_tag))
    rt = right.withColumn(tag_col, F.lit(right_tag))
    return lt.unionByName(rt, allowMissingColumns=True)


def cogroup_agg(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_aggs: Sequence[Column],
    right_aggs: Sequence[Column],
) -> DataFrame:
    """CoGroup, relational scale path: reduce each side per key, then
    FULL OUTER join so keys present on only one side survive (Flink
    CoGroup invokes the function even when one side's group is empty).
    Key columns come back coalesced; per-side aggregate columns are
    null where that side had no rows for the key.

    Shuffle cost: two partial-agg shuffles of O(groups) each + a join on
    the same key — at 100 TB this beats shipping raw rows to a cogroup
    by the full row-count/group-count ratio.
    """
    la = left.groupBy(*keys).agg(*left_aggs)
    ra = right.groupBy(*keys).agg(*right_aggs)
    cond = [la[k].eqNullSafe(ra[k]) for k in keys]
    # full outer can't broadcast (both sides must be complete); the
    # default would be SortMergeJoin. Both inputs are already hash-
    # partitioned on the key by their aggregates, so a shuffled hash
    # join (supported for full outer since Spark 3.1) reuses that
    # layout and skips both sorts; per-partition build = groups/
    # partitions, the post-agg row count.
    joined = la.join(ra.hint("SHUFFLE_HASH"), cond, "full_outer")
    merged = [F.coalesce(la[k], ra[k]).alias(k) for k in keys]
    rest = [c for c in joined.columns if c not in keys]
    return joined.select(*merged, *rest)


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    schema: str,
) -> DataFrame:
    """CoGroup, custom-merge escape hatch (Flink CoGroupFunction with
    arbitrary Python logic): ``fn(key_tuple, left_pdf, right_pdf) ->
    pandas.DataFrame`` runs per key with BOTH groups materialized as
    Arrow-backed pandas frames. Use only when the merge genuinely can't
    be expressed as aggregate-then-join (``cogroup_agg``) — per-key
    memory is the pair of groups, and the exchange ships raw rows.
    """
    return (
        left.groupby(*keys)
        .cogroup(right.groupby(*keys))
        .applyInPandas(fn, schema=schema)
    )


def running_reduce(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    exprs: dict[str, Column],
) -> DataFrame:
    """Keyed running reduce (Flink ``keyBy().reduce`` emits the updated
    aggregate per element; Table API OVER windows): evaluate each
    aggregate Column over the cumulative frame UNBOUNDED PRECEDING →
    CURRENT ROW, ordered by ``order`` within each key partition.

    ``order`` must be a total order per key (include a unique id as
    tiebreak) or frame contents — and thus results — are nondeterministic.
    One shuffle; the frame evaluates incrementally (running state per
    partition), not O(n²).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns({name: c.over(w) for name, c in exprs.items()})
