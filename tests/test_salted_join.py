"""salted_join: result-equivalence with a plain join under skew, and the
plan-level guarantee that the shuffle runs on (key, salt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of left rows share one hot key
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("l_val"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("r_val")
    )
    return left, right


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_matches_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salts=4)
    assert rows(salted.select("k", "l_val", "r_val")) == rows(
        plain.select("k", "l_val", "r_val")
    )


def test_salted_left_matches_plain(spark, skewed):
    left, right = skewed
    # drop some right keys so unmatched-left rows exist
    right = right.filter(F.col("k") % 2 == 0)
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", salts=4, how="left")
    assert rows(salted.select("k", "l_val", "r_val")) == rows(
        plain.select("k", "l_val", "r_val")
    )


def test_salted_join_spreads_hot_key(spark, skewed):
    left, right = skewed
    salted = salted_join(left, right, "k", salts=4)
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan  # join key actually includes the salt


def test_salted_join_rejects_right_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_salted_join_preserves_user_salt_column(spark, skewed):
    """A user column named _salt must survive intact (the internal salt
    uses a collision-proof name)."""
    left, right = skewed
    left = left.withColumn("_salt", F.lit("keep-me"))
    out = salted_join(left, right, "k", salts=4)
    assert "_salt" in out.columns
    assert {r._salt for r in out.select("_salt").distinct().collect()} == {"keep-me"}


def test_salted_join_rejects_internal_name_collision(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="__salted_join_salt__"):
        salted_join(
            left.withColumn("__salted_join_salt__", F.lit(1)), right, "k"
        )
