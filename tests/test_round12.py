"""Round-12 regression locks for the r11 advice items.

1. ``stream_bpe_encode`` inlines corpus-derived merge symbols into SQL
   string literals; Spark SQL literals treat backslash as an escape
   character, so a backslash-bearing symbol was mangled (diverging from
   the batch twin, which parameterizes via F.lit). Pinned with a merge
   table whose symbols contain backslashes AND quotes.
2. ``_pq_encode_batches`` guarded ragged embeddings with a bare
   ``assert`` (stripped under ``python -O``) and let a zero-norm corpus
   vector produce NaN ``cosine_pq`` (NaN sorts above every real score
   in Spark, poisoning the PQ shortlist). Now raises ValueError and
   clamps the norm.
3. ``pq_codebooks`` was dead code while ``knn_ivfpq`` re-derived its
   codebooks inline — the two could silently drift. ``knn_ivfpq`` now
   calls ``pq_codebooks``/``ivf_centroids``; pinned by checking
   explicitly-injected sample books reproduce the default result.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.datasets import load
from flink_learning_practise_spark.operators import similarity
from flink_learning_practise_spark.streaming import pipeline as sp


# ---------------------------------------------------------------------------
# 1. stream_bpe_encode escaping


def _count_via_stream_exprs(spark, texts, merges):
    """stream_bpe_encode builds pure stateless column expressions, so
    applying them to a batch frame exercises the exact SQL-literal
    path the stream runs."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = sp.stream_bpe_encode(df, merges)
    return {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in out.collect()}


def test_stream_bpe_encode_backslash_and_quote_symbols(spark):
    from test_round11 import _canonical_bpe_encode

    texts = [r"a\b a\b c", r"it's a\b", r"x\\y x\\y"]
    merge_tables = [
        [("a", "\\"), ("a\\", "b")],            # backslash lands mid-symbol
        [("\\", "\\"), ("\\\\", "y")],          # doubled backslash symbol
        [("'", "s"), ("t", "'s")],              # quote symbols still work
    ]
    for merges in merge_tables:
        got = _count_via_stream_exprs(spark, texts, merges)
        for i, t in enumerate(texts):
            ws = [w for w in t.strip().lower().split(" ") if w]
            want = sum(len(_canonical_bpe_encode(w, merges)) for w in ws)
            assert got[i] == (len(ws), want), (t, merges)


# ---------------------------------------------------------------------------
# 2. _pq_encode_batches guards


def _encode_one(pdf, dim=4, m=2, ksub=1):
    books = [[[0.0] * (dim // m)] for _ in range(m)]
    centroids = [[1.0] + [0.0] * (dim - 1)]
    enc = similarity._pq_encode_batches(
        centroids, [1.0], books, "vec_id", "embedding", dim
    )
    return list(enc(iter([pdf])))


def test_pq_encode_ragged_raises_valueerror():
    pdf = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]}
    )
    with pytest.raises(ValueError, match="ragged"):
        _encode_one(pdf, dim=4)


def test_pq_encode_zero_norm_vector_stays_finite():
    import numpy as np

    pdf = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [[0.0, 0.0, 0.0, 0.0], [3.0, 4.0, 0.0, 0.0]]}
    )
    (out,) = _encode_one(pdf, dim=4)
    norms = dict(zip(out["vec_id"], out["norm"]))
    assert norms[2] == 5.0  # real vectors untouched
    assert norms[1] > 0 and np.isfinite(norms[1])  # clamped, not 0/NaN


# ---------------------------------------------------------------------------
# 3. pq_codebooks is the live derivation knn_ivfpq uses


def test_pq_codebooks_feeds_knn_ivfpq(spark, sf_small):
    emb = load(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=3, nlist=8, nprobe=3, m=4, ksub=16, refine=10)
    default = sorted(
        map(tuple, similarity.knn_ivfpq(emb, queries, **kw).collect())
    )
    injected = sorted(
        map(
            tuple,
            similarity.knn_ivfpq(
                emb,
                queries,
                books=similarity.pq_codebooks(emb, m=4, ksub=16),
                centroids=similarity.ivf_centroids(emb, 8),
                **kw,
            ).collect(),
        )
    )
    assert default == injected and default


# ---------------------------------------------------------------------------
# 4. PQ codebook refinement (VERDICT r11 ask #5)


def test_refine_codebooks_uplift_and_determinism(spark, sf_medium):
    """Per-subspace Lloyd refinement of the md5-sampled PQ codebooks.

    On this near-random corpus the refine=50 operating point already
    rescores away ALL PQ loss, so end recall sits at the IVF probing
    ceiling (0.56 at nprobe=4) and better codebooks cannot move it —
    the measurable uplift is the PQ STAGE itself, which is what pays
    at scale (the refine stage touches `refine` raw vectors per
    query): refined books cut quantization distortion 26%
    (0.459 -> 0.341 measured) and reach the full-depth recall ceiling
    at HALF the shortlist depth (refine=25: 0.54 -> 0.56; refine=10:
    0.44 -> 0.50). Integer-routed partials make refinement
    bit-identical across reruns/partitionings."""
    import numpy as np

    from flink_learning_practise_spark.operators import similarity as sim

    emb = load(spark, sf_medium, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    seed_books = sim.pq_codebooks(emb, m=8, ksub=64)
    seed_cent = sim.ivf_centroids(emb, 16)
    refined = sim.refine_codebooks(emb, seed_books, iters=2)
    assert refined == sim.refine_codebooks(emb, seed_books, iters=2)
    assert refined != seed_books

    # distortion strictly improves (the Lloyd guarantee, realized)
    X = np.stack(
        [r.embedding for r in emb.select("embedding").collect()]
    ).astype(np.float64)

    def distortion(books):
        m, sub = len(books), X.shape[1] // len(books)
        tot = 0.0
        for s in range(m):
            S = X[:, s * sub: (s + 1) * sub]
            B = np.array(books[s])
            tot += ((S[:, None, :] - B[None, :, :]) ** 2).sum(2).min(1).sum()
        return tot / len(X)

    d_seed, d_ref = distortion(seed_books), distortion(refined)
    assert d_ref < 0.8 * d_seed, (d_seed, d_ref)

    bset = {
        (r.query_id, r.neighbor_id)
        for r in sim.knn_bruteforce(emb, queries, k=5).collect()
    }

    def recall(refine, books):
        aset = {
            (r.query_id, r.neighbor_id)
            for r in sim.knn_ivfpq(
                emb, queries, k=5, nlist=16, nprobe=4, m=8, ksub=64,
                refine=refine, books=books, centroids=seed_cent,
            ).collect()
        }
        return len(aset & bset) / len(bset)

    # refined books hit the probing ceiling (=the refine=50 recall) at
    # HALF the shortlist depth; seed books do not (0.54 measured)
    assert recall(25, refined) >= 0.56
    # and dominate at the shallow depth too (0.50 vs 0.44 measured)
    assert recall(10, refined) >= 0.48
    assert recall(10, seed_books) <= recall(10, refined)


# ---------------------------------------------------------------------------
# 5. curation pipeline v2 (VERDICT r11 ask #4): the composed chain's
# survivor rule and split rule actually carry the #238/#241 semantics


def test_curation_v2_survivor_quality_dominates_lowest_id(spark, sf_medium):
    """For every duplicate cluster with >1 gated member, the v2
    survivor's #45 quality must be >= the v1 rule's survivor (the
    lowest-id member) — the reason #238 exists."""
    from pyspark.sql import Window

    from flink_learning_practise_spark.operators import curation, text
    from flink_learning_practise_spark.plans.llm_pipeline import dedup_clusters

    docs = load(spark, sf_medium, "documents")
    feats = curation.repetition_features(docs, "doc_id", "text", carry=("text",))
    kept = text.quality_features(
        feats.filter(F.col("keep")).select("doc_id", "text"), "text"
    ).select("doc_id", "quality_score")
    labeled = kept.join(dedup_clusters(spark, sf_medium), "doc_id")
    rows = labeled.collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    multi = {c: ms for c, ms in by_cluster.items() if len(ms) > 1}
    assert multi, "test corpus has no multi-member gated cluster"
    better = 0
    for ms in multi.values():
        v2 = max(ms, key=lambda r: (r.quality_score, -r.doc_id))
        v1 = min(ms, key=lambda r: r.doc_id)
        assert v2.quality_score >= v1.quality_score
        better += v2.quality_score > v1.quality_score
    assert better > 0  # the rule changes real outcomes on this corpus


def test_curation_v2_split_is_cluster_consistent(spark, sf_medium):
    """Zero cross-split near-dup leakage by construction: every
    survivor's split is a pure function of its cluster_id, so no two
    near-duplicate survivors can land in different splits — checked on
    the REAL pair tier, not synthetic edges."""
    from flink_learning_practise_spark.operators import transforms
    from flink_learning_practise_spark.plans.llm_pipeline import (
        _shared_pair_tier,
        dedup_clusters,
    )
    from flink_learning_practise_spark.plans.curation import SPLIT_SEED

    clusters = transforms.assign_split(
        dedup_clusters(spark, sf_medium), "cluster_id", seed=SPLIT_SEED
    )
    pairs = _shared_pair_tier(spark, sf_medium)
    a = clusters.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = clusters.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    leaks = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert leaks == 0
