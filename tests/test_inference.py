"""Batched model-inference plumbing (operators/inference.py): Arrow
batch shape, per-task model loading, determinism, and the
embedding-output contract with the similarity tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.datasets import load
from flink_learning_practise_spark.operators import inference, similarity


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load(spark, sf_small, "documents")


def test_scores_are_deterministic_and_bounded(spark, docs):
    a = {r.doc_id: r.score for r in inference.score_documents(docs).collect()}
    b = {r.doc_id: r.score for r in inference.score_documents(docs).collect()}
    assert a == b  # pure function of the text — rerun-stable
    assert all(0.0 <= s <= 1.0 for s in a.values())
    assert len(set(a.values())) > 10  # actually varies per document


def test_model_sees_arrow_batches_not_rows(spark, docs):
    """batch_rows proves vectorized invocation: the model must receive
    multi-row batches (a per-row fallback would emit batch_rows=1)."""
    n = docs.count()
    out = inference.score_documents(docs.coalesce(1)).collect()
    sizes = {r.batch_rows for r in out}
    # one partition, default 10k-record Arrow batches, corpus < 10k →
    # the model saw the WHOLE partition in one call
    assert sizes == {n}
    assert all(r.model == "fake-md5-scorer" for r in out)


def test_scoring_plan_is_shuffle_free(spark, docs):
    plan = inference.score_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_embeddings_feed_the_similarity_tier(spark, docs):
    """The embedding output plugs straight into knn/SemDeDup."""
    emb = inference.embed_documents(docs.limit(50)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    assert emb.schema["embedding"].dataType.simpleString() == "array<double>"
    queries = emb.filter(F.col("vec_id") < emb.agg(F.min("vec_id")).collect()[0][0] + 5)
    top = similarity.knn_bruteforce(emb, queries, k=3, dim=16)
    rows = top.collect()
    assert rows and all(r.rank <= 3 for r in rows)
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_custom_model_factory_swaps_in(spark, docs):
    class ConstModel:
        name = "const-0.5"

        def load(self):
            return self

        def score_batch(self, texts):
            return texts.map(lambda _t: 0.5)

    out = inference.score_documents(docs.limit(5), ConstModel).collect()
    assert {r.score for r in out} == {0.5}
    assert {r.model for r in out} == {"const-0.5"}


def test_scoring_runs_unchanged_on_streams(spark, tmp_path):
    """Model inference is a stateless mapInPandas projection, so the
    SAME operator scores an unbounded source — the streaming half of
    the inference tier (batch backfill == live scoring, one code path).
    batch_rows is micro-batch-dependent and excluded from the parity."""
    import json
    import os

    path = str(tmp_path / "inf_in")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/part1.json", "w") as f:
        for i in range(20):
            f.write(json.dumps({"doc_id": i, "text": f"doc {i} body {'x ' * i}"}) + "\n")

    schema = "doc_id long, text string"
    src = spark.readStream.schema(schema).json(path)
    q = (
        inference.score_documents(src)
        .select("doc_id", "score", "model")
        .writeStream.format("memory")
        .queryName("inf_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = sorted(map(tuple, spark.table("inf_stream").collect()))
    batch = spark.read.schema(schema).json(path)
    batched = sorted(
        map(tuple, inference.score_documents(batch).select("doc_id", "score", "model").collect())
    )
    assert streamed == batched and len(streamed) == 20


def test_null_text_scores_null_not_crash(spark):
    """One NULL text row must not fail the task: it scores NULL (the
    SQL-oracle semantic — md5(NULL) IS NULL), everything else scores."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.score for r in inference.score_documents(df).collect()}
    assert rows[2] is None and rows[1] is not None
    emb = {r.doc_id: r.embedding for r in inference.embed_documents(df).collect()}
    assert emb[2] is None and len(emb[1]) == 16
