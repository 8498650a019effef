"""SparkSession factory.

Spark-side analog of the reference's environment builders
(``flink1_create_filnk_env.py``, ``flink_table_api_utils.py:70`` —
create env / TableEnvironment): one entry point that returns a session
tuned for large-scale analytics.

Defaults chosen for scale:
- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy).
- Arrow enabled for the few Pandas-UDF paths (multimodal stubs).
- UTC session timezone so event-time semantics are engine-independent.
- ``spark.sql.shuffle.partitions`` sized via env (32 on the test box;
  on a real cluster set to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "flink-learning-practise-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    ``state_store="rocksdb"`` selects the RocksDB state-store provider
    for stateful streaming (sessions, streaming dedup/CEP): state lives
    off-heap in per-partition RocksDB instances spilling to local disk,
    so state size is bounded by disk, not executor heap — the Spark
    analog of the reference's large-state RocksDBStateBackend
    (flink_learning/flink_typora.md:651). Changelog checkpointing is
    enabled with it so per-batch checkpoints upload deltas instead of
    full snapshots. ``None``/"hdfs" keeps Spark's default in-heap
    HDFS-backed provider (fine while state fits in memory). The
    provider is a runtime SQL conf, applied even when an existing
    session is reused.
    """
    if state_store not in (None, "hdfs", "rocksdb"):
        raise ValueError(f"unknown state_store {state_store!r}")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE: runtime bloom-filter join filtering
        # (spark.sql.optimizer.runtime.bloomFilter.enabled) was tried and
        # REVERTED: it sent the JSON-roundtrip query from 1.9s to >400s
        # at sf0.1 (bloom build dominates on an aggregated join side).
        # Enable per-job at scale where a selective dim prunes a huge
        # fact scan, not as a blanket default.
    )
    if state_store == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        ).config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if state_store == "rocksdb":
        # getOrCreate only best-efforts configs onto a pre-existing
        # session; these are runtime SQL confs, so set them explicitly.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    return spark
