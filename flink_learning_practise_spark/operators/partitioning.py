"""Physical partitioning strategies — Spark analog of Flink's
partitioning operators (reference flink_typora.md:892 — Hash/Range
Partitioning, Rebalance; plus DataStream ``broadcast``/``global``).

| Flink            | here                | Spark plan node              |
|------------------|---------------------|------------------------------|
| hash (keyBy)     | ``hash_partition``  | Exchange hashpartitioning    |
| range            | ``range_partition`` | Exchange rangepartitioning   |
| rebalance        | ``rebalance``       | Exchange RoundRobinPartition |
| broadcast        | ``broadcast_dim``   | BroadcastExchange (join hint)|
| global           | ``to_single``       | Exchange SinglePartition     |
| (merge, no shfl) | ``compact``         | Coalesce (NO exchange)       |

Two principles the helpers encode:

1. **Partitioning is usually Catalyst's job.** groupBy/join insert the
   right Exchange themselves; an explicit repartition is only worth a
   shuffle when you're (a) co-locating several downstream ops on one
   key layout, (b) rebalancing skewed/ragged input splits ahead of a
   CPU-heavy map stage, or (c) controlling output file layout before a
   write. Don't hand-schedule what AQE already fixes at runtime.
2. **Compaction must not shuffle.** ``coalesce`` merges co-located
   partitions without an Exchange (unlike ``repartition(n)``), which is
   why it's the right pre-write file-count fix — but it caps upstream
   parallelism, so apply it at the END of a plan, after the wide ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_partition(
    df: DataFrame, cols: Sequence[str | Column], n: int | None = None
) -> DataFrame:
    """Hash-distribute by key (Flink keyBy/hash partitioning): rows with
    equal keys co-locate, so every downstream per-key op (groupBy,
    window, join on the same key) reuses this one exchange."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def range_partition(
    df: DataFrame, cols: Sequence[str | Column], n: int | None = None
) -> DataFrame:
    """Range-distribute by sampled split points (Flink range
    partitioning): partitions hold contiguous, globally-ordered key
    ranges — the layout for sorted output files and merge-friendly
    downstream scans."""
    return (
        df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)
    )


def rebalance(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin redistribute (Flink rebalance): evens out ragged or
    skewed input splits ahead of a CPU-heavy stage. Destroys any key
    co-location — never place between a hash_partition and the op that
    needed it."""
    return df.repartition(n) if n else df.repartition()


def broadcast_dim(df: DataFrame) -> DataFrame:
    """Broadcast (Flink broadcast partitioning): every executor gets the
    whole frame — the join-side hint for small dims; Catalyst plans a
    BroadcastExchange instead of shuffling the big side.

    BROADCAST_POLICY (plans/tpch.py module docstring): callers may only
    pass bounded-cardinality frames (nation/region-like dims, single-row
    aggregates, capped candidate sets) — a hint FORCES the build side
    regardless of runtime size, so a corpus-proportional argument OOMs
    at scale. Leave proportional sides unhinted and let AQE decide."""
    return F.broadcast(df)  # broadcast-policy-exempt: generic wrapper, bound documented above


def to_single(df: DataFrame) -> DataFrame:
    """Everything to one partition (Flink global partitioning). Only
    sane for tiny post-aggregate frames (a final sorted report); on
    anything large it serializes the job through one task."""
    return df.repartition(1)


def compact(df: DataFrame, n: int) -> DataFrame:
    """Merge to ``n`` partitions WITHOUT a shuffle (no Exchange in the
    plan): the pre-write file-count control. Caps the parallelism of
    everything fused above it — apply after the wide ops, not before."""
    return df.coalesce(n)
