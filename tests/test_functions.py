"""UDF registration surface (SURVEY §2 #65, Flink Table API Function
analog): scalar pandas UDF, grouped-agg pandas UDF, Python UDTF — each
registered on the session and exercised from SQL, with the scalar one
proven equivalent to the built-in hot-path expression it mirrors."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.functions import (
    normalize_text_pandas,
    register_grouped_agg,
    register_scalar_pandas,
    register_table_function,
)


def test_scalar_udf_matches_builtin_normalizer(spark):
    register_scalar_pandas(spark, "normalize_text", normalize_text_pandas, "string")
    df = spark.createDataFrame(
        [("  Hello\t WORLD  ",), ("a  b   c",), ("",)], "text string"
    )
    df.createOrReplaceTempView("t_norm")
    got = [r.n for r in spark.sql("SELECT normalize_text(text) AS n FROM t_norm").collect()]
    builtin = [
        r.n
        for r in df.select(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("n")
        ).collect()
    ]
    assert got == builtin == ["hello world", "a b c", ""]


def test_grouped_agg_udf_in_sql_group_by(spark):
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v).mean()))

    register_grouped_agg(spark, "geo_mean", geo_mean, "double")
    df = spark.createDataFrame(
        [(1, 2.0), (1, 8.0), (2, 3.0)], "k long, v double"
    )
    df.createOrReplaceTempView("t_geo")
    got = {
        r.k: r.g
        for r in spark.sql(
            "SELECT k, geo_mean(v) AS g FROM t_geo GROUP BY k"
        ).collect()
    }
    assert got[1] == pytest.approx(4.0)  # sqrt(2*8)
    assert got[2] == pytest.approx(3.0)


def test_udtf_lateral_expansion(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    register_table_function(spark, "split_words", SplitWords)
    rows = spark.sql("SELECT * FROM split_words('a bb ccc')").collect()
    assert [(r.word, r.pos) for r in rows] == [("a", 0), ("bb", 1), ("ccc", 2)]


def test_udfs_stay_out_of_registered_query_plans(spark, sf_small):
    """Policy guard: registering UDFs must not leak Python into the
    engine's own query plans (they remain built-in-only)."""
    register_scalar_pandas(spark, "normalize_text2", normalize_text_pandas, "string")
    from flink_learning_practise_spark.registry import all_queries

    q = all_queries()["q_quality_score"]
    plan = q.fn(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
