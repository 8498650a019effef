"""Batch sinks — Spark analog of the reference's
``flink_sink_utils.py`` (create_file_sink:434, create_print_sink:487).

Partitioned parquet is the default landing format: column pruning +
predicate pushdown for downstream readers, and ``partitionBy`` gives
partition pruning on the landing keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def print_sink(df: DataFrame, n: int = 20, truncate: bool = False) -> None:
    """Print sink (ref create_print_sink:487)."""
    df.show(n, truncate)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) table — the co-located
    join layout for 100 TB fact-fact joins: two tables bucketed on the
    same key with the same bucket count join with NO exchange on either
    side (and no sort, if sorted), because the on-disk layout already
    satisfies the join's required distribution. This is how you
    amortize one shuffle across every future join/aggregation on that
    key. External table (explicit ``path``) in the session catalog."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Compact a small-file parquet dataset into ~target-sized files —
    the maintenance op every long-running ingest needs: streaming
    ingest and fine-grained partitioning both strand thousands of tiny
    files, and at 100 TB scan throughput dies on per-file open/footer
    overhead long before I/O saturates (the reason table formats ship
    OPTIMIZE/rewriteDataFiles).

    File count comes from the dataset's actual on-disk bytes (Hadoop
    FileSystem listing — no data read), then one round-robin
    ``repartition(n)`` rewrite: even output sizes regardless of input
    skew, one shuffle of the data being rewritten and nothing else.
    Returns the target file count. Row-identical, schema-identical;
    ordering is not preserved (parquet datasets are unordered).
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    # refuse in-place rewrite up front (resolved paths, not string
    # compare): overwrite-while-reading deletes the source if Spark's
    # own self-overwrite detection misses the aliasing.
    out_resolved = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(out_path))
    if fs.makeQualified(hpath).equals(out_resolved):
        raise ValueError(
            f"compact_parquet: out_path resolves to in_path ({in_path}); "
            "write to a new location, then swap"
        )
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    if total == 0:
        raise ValueError(f"compact_parquet: no parquet files under {in_path}")
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(in_path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_path)
    return n_files


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on ``cluster_cols``: rows are
    range-partitioned across files and sorted within each, so per-file
    (and per-row-group) min/max statistics on the cluster columns are
    NON-overlapping — downstream range/point filters skip whole files
    without a partition-directory scheme (the ZORDER-lite layout for
    one clustering dimension; directory ``partitionBy`` stays the
    right tool for low-cardinality keys).

    repartitionByRange samples the keys to build balanced range
    bounds (skew-tolerant, unlike hash or directory partitioning on a
    skewed key); sortWithinPartitions costs one local sort per file —
    no extra shuffle beyond the range exchange.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    buckets: int = 64,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Two-dimensional Z-ORDER layout (Delta OPTIMIZE ZORDER analog):
    rows are laid out along the Morton curve of the two columns'
    QUANTILE-bucket ranks, so per-file min/max stats are narrow in BOTH
    dimensions — point/range filters on either column skip most files,
    where 1-D clustering (:func:`write_range_clustered`) helps only its
    own column.

    Scale mechanics: per-column bucket bounds come from
    ``approxQuantile`` (Greenwald-Khanna — one pass, driver holds
    ``buckets`` doubles, skew-tolerant where uniform-width buckets are
    not); bucketing + bit interleaving are then MAP-ONLY expressions
    (a ``buckets``-term fold per row — per-ROW HOF, fine by this
    module's cost rule), and the only shuffle is the final
    repartitionByRange on the z-value. Quantile-rank normalization is
    what makes Morton locality real on skewed data: equal-population
    cells, not equal-width.
    """
    nbits = max(1, (buckets - 1).bit_length())
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    probs = [i / buckets for i in range(1, buckets)]
    bounds_a, bounds_b = (
        df.stat.approxQuantile([col_a, col_b], probs, 0.01)
    )

    def bucket_expr(col: str, bounds: list[float]) -> str:
        lit = "array(" + ",".join(f"CAST({b!r} AS DOUBLE)" for b in bounds) + ")"
        return (
            f"aggregate({lit}, 0, (acc, b) -> "
            f"acc + IF(CAST({col} AS DOUBLE) > b, 1, 0))"
        )

    z = df.withColumn("_ba", F.expr(bucket_expr(col_a, bounds_a))).withColumn(
        "_bb", F.expr(bucket_expr(col_b, bounds_b))
    )
    morton = F.lit(0)
    for i in range(nbits):  # interleave: a gets odd bits, b even
        morton = (
            morton
            .bitwiseOR(F.shiftleft(F.col("_ba").bitwiseAND(1 << i), i + 1))
            .bitwiseOR(F.shiftleft(F.col("_bb").bitwiseAND(1 << i), i))
        )
    (
        z.withColumn("_z", morton)
        .repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_ba", "_bb", "_z")
        .write.mode(mode)
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    n_shards: int,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a training corpus as deterministic, ordered shards —
    the parquet analog of WebDataset/MDS shard layouts that data
    loaders consume (each worker reads a disjoint, internally-ordered
    shard set; reproducible epoch order without a global sort at read
    time).

    Layout contract:
    - rows are RANGE-partitioned on ``order_col`` (e.g. the pack id
      from ``curation.pack_sequences``, or a split+shuffle-rank key):
      shard boundaries are sampled balanced range bounds, so shard
      sizes stay even under key skew;
    - each shard directory ``shard=k`` is sorted by ``order_col`` —
      per-file min/max on the order key are non-overlapping, so a
      loader can seek any global position via footer stats alone;
    - ``max_records_per_file`` bounds individual file size inside a
      shard (parquet's maxRecordsPerFile — rotation, not a shuffle).

    One range exchange + one local sort per shard; at 100 TB pick
    ``n_shards`` ≥ total loader-worker count and let
    ``max_records_per_file`` cap files at the loader's prefetch unit.
    """
    sharded = (
        df.repartitionByRange(n_shards, order_col)
        .withColumn("shard", F.spark_partition_id())
        .sortWithinPartitions(order_col)
    )
    w = sharded.write.mode(mode).partitionBy("shard")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)
