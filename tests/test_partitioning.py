"""Partitioning strategies (SURVEY §2 #64): each helper must plan the
physical distribution it promises — and compact() must NOT shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.operators import partitioning as pt


@pytest.fixture()
def df(spark):
    return spark.range(0, 1000).withColumn("k", F.col("id") % 7)


def plan(d) -> str:
    return d._jdf.queryExecution().executedPlan().toString()


def test_hash_partition_plans_hashpartitioning(df):
    p = plan(pt.hash_partition(df, ["k"], n=8))
    assert "hashpartitioning(k" in p
    assert pt.hash_partition(df, ["k"], n=8).rdd.getNumPartitions() == 8


def test_hash_partition_colocates_equal_keys(df):
    parts = (
        pt.hash_partition(df, ["k"], n=8)
        .select("k", F.spark_partition_id().alias("pid"))
        .distinct()
        .groupBy("k")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in parts)  # each key in ONE partition


def test_range_partition_plans_rangepartitioning(df):
    p = plan(pt.range_partition(df, ["id"], n=4))
    assert "rangepartitioning(id" in p


def test_range_partition_is_contiguous(df):
    # partition id must be monotone in the range key: max(part i) <= min(part i+1)
    bounds = (
        pt.range_partition(df, ["id"], n=4)
        .select("id", F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    assert len(bounds) == 4
    for prev, nxt in zip(bounds, bounds[1:]):
        assert prev.hi <= nxt.lo


def test_rebalance_plans_roundrobin_and_evens_out(spark):
    # ragged input: all rows in one partition
    ragged = spark.range(0, 960).coalesce(1)
    out = pt.rebalance(ragged, 8)
    assert "roundrobinpartitioning" in plan(out).lower()
    sizes = [
        r["count"]
        for r in out.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    ]
    assert len(sizes) == 8 and max(sizes) == min(sizes) == 120


def test_broadcast_dim_plans_broadcast_join(spark, df):
    dim = spark.createDataFrame([(k, f"n{k}") for k in range(7)], "k long, name string")
    joined = df.join(pt.broadcast_dim(dim), "k")
    p = plan(joined)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_to_single_partition(df):
    assert pt.to_single(df).rdd.getNumPartitions() == 1


def test_compact_has_no_exchange(df):
    shuffled = pt.hash_partition(df, ["k"], n=8)
    compacted = pt.compact(shuffled, 2)
    # exactly the one upstream exchange; coalesce itself adds none
    p = plan(compacted)
    assert p.count("Exchange") == 1  # the hash_partition's
    assert "Coalesce" in p
    assert compacted.rdd.getNumPartitions() == 2
