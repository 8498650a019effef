"""Bucketed co-located joins: same key + same bucket count on both sides
=> the join plans with NO shuffle exchange (the disk layout already
satisfies the required distribution). The 100 TB fact-fact join layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.datasets import load
from flink_learning_practise_spark.sinks.batch import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load(spark, sf_small, "orders")
    lineitem = load(spark, sf_small, "lineitem")
    write_bucketed(orders, "orders_b", str(base / "orders"), ["o_orderkey"],
                   buckets=4, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", str(base / "lineitem"), ["l_orderkey"],
                   buckets=4, sort_cols=["l_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # merge hint = the fact-fact shape (at scale neither side broadcasts)
    joined = (
        spark.table(lt)
        .join(spark.table(ot).hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
    )
    joined.collect()  # finalize AQE
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # co-located: no shuffle on either side
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_join_matches_plain(spark, sf_small, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        spark.table(lt)
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy().agg(F.count(F.lit(1)).alias("n"))
    ).collect()[0].n
    plain = (
        load(spark, sf_small, "lineitem")
        .join(load(spark, sf_small, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert bucketed == plain


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    ot, _ = bucketed_tables
    agg = spark.table(ot).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket layout satisfies the group-by too
