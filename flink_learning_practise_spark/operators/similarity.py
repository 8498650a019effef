"""Similarity search over embedding columns (array<float>).

- :func:`knn_bruteforce` — exact cosine top-k: broadcast the (small)
  query set, one pass over the corpus, per-partition top-k folded into a
  global top-k by the ranking window. The correctness baseline.
- :func:`knn_lsh` — random-hyperplane LSH buckets (deterministic planes
  derived from xxhash64), search only within the query's bucket. The
  scale path: candidate count drops ~2^planes-fold.
- :func:`cosine_pairs` — all-pairs cosine ≥ τ (near-dup by embedding).

Dot products run JVM-side with ``zip_with``/``aggregate`` array lambdas
(left-to-right fold in double precision — deterministic and
oracle-reproducible); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import widen

COSINE_NDIGITS = 6  # round so engine-order float noise can't flip hashes


def dot_expr(a: str, b: str) -> str:
    """SQL expression: left-to-right double-precision dot product."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def with_norm(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector (reused by every pair)."""
    return df.withColumn("norm", F.expr(f"sqrt({dot_expr(emb_col, emb_col)})"))


def cosine_col(a_emb: str, b_emb: str, a_norm: str, b_norm: str) -> Column:
    return F.round(
        F.expr(dot_expr(a_emb, b_emb)) / (F.col(a_norm) * F.col(b_norm)),
        COSINE_NDIGITS,
    )


def knn_bruteforce(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (self excluded).

    Output: (query_id, neighbor_id, rank, cosine). The query side is
    broadcast, so the corpus is scanned exactly once with no shuffle
    until the final per-query top-k."""
    q = with_norm(queries, emb_col).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = with_norm(widen(df), emb_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col("q_emb", "c_emb", "q_norm", "c_norm"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_bucket_expr(emb_col: str, planes: int, dim: int) -> str:
    """Deterministic random-hyperplane LSH bucket id.

    Plane p's component j is ±1 from bit parity of xxhash64(p, j) — no
    stored model, reproducible on any cluster. Bucket bit p = sign of
    dot(plane_p, v)."""
    plane_dot = (
        f"aggregate(zip_with({emb_col}, sequence(0, {dim - 1}), "
        f"(x, j) -> CAST(x AS DOUBLE) * CASE WHEN (xxhash64(p, j) & 1) = 1 THEN 1.0 ELSE -1.0 END), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        f"aggregate(transform(sequence(0, {planes - 1}), p -> "
        f"CASE WHEN ({plane_dot}) > 0 THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def knn_lsh(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Same output shape as :func:`knn_bruteforce`; recall < 1 by
    construction, cost ~1/2^planes of brute force."""
    bucket = hyperplane_bucket_expr(emb_col, planes, dim)
    q = with_norm(queries, emb_col).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.expr(bucket).alias("bucket"),
    )
    c = with_norm(widen(df), emb_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        F.col("norm").alias("c_norm"),
        F.expr(bucket).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col("q_emb", "c_emb", "q_norm", "c_norm"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_centroids(
    df: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[list[list[float]], list[float]]:
    """Deterministic IVF coarse quantizer: the ``nlist`` corpus vectors
    with the smallest ``xxhash64(id)`` — a uniform, reproducible sample
    (one TakeOrdered pass; no iterative k-means on the hot path, and at
    100 TB a k-means refinement would run offline on the same sample).
    Returns (centroid vectors, centroid L2 norms) as plain Python lists;
    they're tiny (nlist × dim) and get inlined as literals so that list
    assignment is a map-only expression — zero shuffle."""
    import math

    rows = (
        df.select(F.col(id_col).alias("cid"), F.col(emb_col).alias("emb"))
        .orderBy(F.xxhash64(F.col("cid")), F.col("cid"))
        .limit(nlist)
        .collect()
    )
    vecs = [[float(x) for x in r.emb] for r in rows]
    norms = [math.sqrt(sum(x * x for x in v)) or 1.0 for v in vecs]
    return vecs, norms


def _ivf_scores_expr(emb_col: str, vecs: list[list[float]], norms: list[float]) -> str:
    """SQL expr: array of cosine-proportional scores of ``emb_col``
    against each inlined centroid (own-norm omitted — positive scaling
    doesn't change the argmax/ordering used for assignment/probing)."""
    cents = "array(" + ",".join(
        "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in v) + ")" for v in vecs
    ) + ")"
    cnorms = "array(" + ",".join(f"CAST({n!r} AS DOUBLE)" for n in norms) + ")"
    dot = (
        f"aggregate(zip_with({emb_col}, c, (x, y) -> CAST(x AS DOUBLE) * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return f"transform({cents}, (c, i) -> ({dot}) / element_at({cnorms}, i + 1))"


def knn_ivf(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k (the other classic ANN scale path,
    alongside :func:`knn_lsh`): a coarse quantizer of ``nlist`` centroids
    partitions the corpus into inverted lists map-side (no shuffle —
    centroids are inlined literals); each query probes its ``nprobe``
    nearest lists, so only ~nprobe/nlist of the corpus is scored.
    Same output shape as :func:`knn_bruteforce`; recall < 1 by design."""
    vecs, norms = ivf_centroids(df, nlist, id_col, emb_col)
    scores = _ivf_scores_expr(emb_col, vecs, norms)

    probe_lists = (
        f"transform(slice(reverse(array_sort("
        f"transform(({scores}), (s, i) -> struct(s, i)))), 1, {nprobe}), "
        f"x -> CAST(x.i + 1 AS INT))"
    )
    q = with_norm(queries, emb_col).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.explode(F.expr(probe_lists)).alias("list_id"),
    )
    c = with_norm(widen(df), emb_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        F.col("norm").alias("c_norm"),
        F.expr(f"CAST(array_position(({scores}), array_max({scores})) AS INT)").alias(
            "list_id"
        ),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col("q_emb", "c_emb", "q_norm", "c_norm"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ τ — embedding near-dup.

    Exact O(n²) scoring: the verification baseline. The 100 TB path is
    :func:`knn_lsh`-style bucketing first (same scoring expression on
    the bucketed candidates)."""
    a = with_norm(widen(df), emb_col).select(
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = with_norm(df, emb_col).select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col("emb_a", "emb_b", "norm_a", "norm_b"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
