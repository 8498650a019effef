"""Changelog → snapshot maintenance (MERGE INTO analog).

The batch half of the reference's Kafka→MySQL upsert spine
(``flink_kafka_to_mysql_utils.py`` builds INSERT ... ON DUPLICATE KEY
UPDATE; ``sinks/jdbc.py`` carries the streaming foreachBatch twin):
given the CURRENT snapshot table and a CHANGELOG of upserts/deletes,
produce the next snapshot — lakehouse MERGE without a table format.

Scale shape: one ``unionByName`` (no shuffle), ONE shuffle on the key
for the rank-1 window with deterministic (ts, id) tie-break, tombstones
dropped AFTER ranking so a delete that is the latest version removes
the key entirely while an older delete is simply superseded. Cost is a
single key-partitioned sort — the same plan as changelog compaction
(plans #80) with the snapshot unioned in.

At 100 TB: pair with partition-pruned rewrites (only partitions whose
keys appear in the changelog need rewriting — compute the affected key
set first and semi-join the snapshot scan) and
``sinks.batch.write_range_clustered`` so the rewrite preserves
clustering. The full-snapshot union here is the semantics; the pruning
is an I/O optimization layered on the same plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_snapshot(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Next snapshot = latest version per key across snapshot ∪ changes.

    ``delete_col`` (boolean in ``changes``; absent/false in the
    snapshot) marks tombstones: if the LATEST version of a key is a
    delete, the key disappears from the result. Ties on ``ts_col``
    break by ``id_col`` (highest wins — later ingest order), making the
    merge deterministic and idempotent: re-merging the same changelog
    is a no-op.
    """
    if delete_col is None:
        snap = snapshot.withColumn("_del", F.lit(False))
        chg = changes.withColumn("_del", F.lit(False))
    else:
        snap = snapshot.withColumn("_del", F.lit(False))
        chg = changes.withColumn(
            "_del", F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        ).drop(delete_col)
    union = snap.unionByName(chg)
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    return (
        union.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col("_del"))
        .drop("_rn", "_del")
    )
