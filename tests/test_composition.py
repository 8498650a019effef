"""Multi-stream composition operators (SURVEY §2 #60-62): union/connect
tagging and null-fill, CoGroup (declarative scale path vs the pandas
cogroup escape hatch), and keyed running reduce — plus the streaming
union (Flink union of two live streams into one windowed agg)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.operators import composition
from flink_learning_practise_spark.sinks.streaming import memory_sink
from flink_learning_practise_spark.sources.streaming import file_stream_source
from flink_learning_practise_spark.streaming import pipeline as sp

EVENT_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"


def write_events(path, events):
    import json
    import os

    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"part-{len(os.listdir(path))}.jsonl")
    with open(fname, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_union_all_resolves_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id long, tag string")
    b = spark.createDataFrame([("y", 2)], "tag string, id long")  # reordered
    out = composition.union_all(a, b).orderBy("id").collect()
    assert [(r.id, r.tag) for r in out] == [(1, "x"), (2, "y")]


def test_connect_tagged_null_fills_and_tags(spark):
    left = spark.createDataFrame([(1, 10.0)], "id long, value double")
    right = spark.createDataFrame([(2, "b")], "id long, label string")
    out = composition.connect_tagged(left, right, left_tag="ev", right_tag="od")
    rows = {r.source: r for r in out.collect()}
    assert rows["ev"].value == 10.0 and rows["ev"].label is None
    assert rows["od"].label == "b" and rows["od"].value is None


def test_connect_tagged_rejects_colliding_tag_col(spark):
    df = spark.createDataFrame([(1, "x")], "id long, source string")
    with pytest.raises(ValueError, match="source"):
        composition.connect_tagged(df, df.drop("source"))


def test_cogroup_agg_keeps_one_sided_keys(spark):
    left = spark.createDataFrame([(1, 5.0), (1, 7.0), (2, 1.0)], "k long, v double")
    right = spark.createDataFrame([(2, 100.0), (3, 50.0)], "k long, w double")
    out = composition.cogroup_agg(
        left,
        right,
        keys=["k"],
        left_aggs=[F.count(F.lit(1)).alias("n_l"), F.sum("v").alias("sum_v")],
        right_aggs=[F.count(F.lit(1)).alias("n_r"), F.sum("w").alias("sum_w")],
    )
    rows = {r.k: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1].n_l, rows[1].sum_v, rows[1].n_r) == (2, 12.0, None)
    assert (rows[2].n_l, rows[2].n_r, rows[2].sum_w) == (1, 1, 100.0)
    assert (rows[3].n_l, rows[3].n_r, rows[3].sum_w) == (None, 1, 50.0)


def test_cogroup_apply_matches_declarative_path(spark):
    """The pandas escape hatch and the aggregate-then-join scale path
    must agree on semantics: per-key counts/sums with empty groups
    surfacing as zero-length frames (Flink CoGroup contract)."""
    import pandas as pd

    left = spark.createDataFrame(
        [(1, 5.0), (1, 7.0), (2, 1.0), (4, 2.0)], "k long, v double"
    )
    right = spark.createDataFrame([(2, 100.0), (3, 50.0)], "k long, w double")

    def merge(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": [key[0]],
                "n_l": [len(lpdf)],
                "sum_v": [lpdf["v"].sum() if len(lpdf) else None],
                "n_r": [len(rpdf)],
                "sum_w": [rpdf["w"].sum() if len(rpdf) else None],
            }
        )

    applied = composition.cogroup_apply(
        left, right, ["k"], merge,
        "k long, n_l long, sum_v double, n_r long, sum_w double",
    )
    declared = composition.cogroup_agg(
        left,
        right,
        keys=["k"],
        left_aggs=[F.count(F.lit(1)).alias("n_l"), F.sum("v").alias("sum_v")],
        right_aggs=[F.count(F.lit(1)).alias("n_r"), F.sum("w").alias("sum_w")],
    )
    norm = lambda df: sorted(
        (r.k, r.n_l or 0, r.sum_v, r.n_r or 0, r.sum_w) for r in df.collect()
    )
    assert norm(applied) == norm(declared)


def test_running_reduce_cumulative_per_key(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 5.0), (2, 3, 7.0), (1, 4, 1.0)],
        "user long, seq long, v double",
    )
    out = composition.running_reduce(
        df,
        keys=["user"],
        order=["seq"],
        exprs={"running_n": F.count(F.lit(1)), "running_sum": F.sum("v")},
    )
    got = {(r.user, r.seq): (r.running_n, r.running_sum) for r in out.collect()}
    assert got == {
        (1, 1): (1, 10.0),
        (1, 2): (2, 15.0),
        (1, 4): (3, 16.0),
        (2, 3): (1, 7.0),
    }


def test_streaming_union_two_sources(spark, tmp_path):
    """Flink union on live streams: two independent file-drop sources
    merge into ONE stream feeding a single windowed aggregate."""
    dir_a, dir_b = str(tmp_path / "src_a"), str(tmp_path / "src_b")
    write_events(dir_a, [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "value": 10.0},
    ])
    write_events(dir_b, [
        {"event_id": 2, "ts": "2024-01-01 00:00:40", "user_id": 1, "value": 5.0},
        {"event_id": 3, "ts": "2024-01-01 00:01:10", "user_id": 2, "value": 7.0},
    ])
    a = file_stream_source(spark, dir_a, EVENT_SCHEMA, fmt="json")
    b = file_stream_source(spark, dir_b, EVENT_SCHEMA, fmt="json")
    merged = composition.union_all(a, b)
    assert merged.isStreaming
    stats = sp.windowed_stats(
        merged,
        "ts",
        "1 minute",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")],
        watermark_delay="30 seconds",
    )
    q = memory_sink(stats, "union_stats", mode="complete").start()
    sp.run_until_drained(q)
    rows = {
        (r.window_start.isoformat(), r.user_id): (r.n, r.s)
        for r in spark.table("union_stats").collect()
    }
    assert rows[("2024-01-01T00:00:00", 1)] == (2, 15.0)  # one from each source
    assert rows[("2024-01-01T00:01:00", 2)] == (1, 7.0)
