"""Deduplication operators for training-data pipelines.

Four tiers, trading exactness for scale:

- :func:`exact_dedup` — hash-groupBy on normalized content. One shuffle
  keyed by a 256-bit digest (constant-width shuffle keys regardless of
  document length). The 100 TB workhorse.
- :func:`ngram_jaccard_pairs` — exact near-dup pairs via an inverted
  shingle index (explode → equi-join → count). Exact but the index join
  is O(sum of shingle-bucket²); use for verification / small candidate
  sets.
- :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH blocking,
  then exact-Jaccard verification of candidates only. Linear in
  candidates: the scale path for near-dup at 100 TB.
- :func:`simhash_pairs` — 63-bit SimHash + band blocking + Hamming
  verification. Cheapest signature; catches small-edit near-dups.

All hashing uses Spark's built-in ``xxhash64`` (JVM-side, seedable via
extra literal args) so signatures are deterministic across runs and
cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize


def shingle_array(norm_col: Column, k: int = 3) -> Column:
    """Array of k-word shingles from a normalized text column (distinct,
    computed JVM-side with array lambdas — no explode until needed)."""
    w = F.split(norm_col, " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(w) - k),
        lambda i: F.array_join(F.slice(w, i + 1, k), " "),
    )
    return F.when(F.size(w) >= k, F.array_distinct(shingles)).otherwise(
        F.array(F.array_join(w, " "))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: group by sha2(normalized text), keep the min id.

    Returns (surviving id, n_copies). Shuffle keys are fixed-width
    digests, so key size is independent of document size.
    """
    hashed = df.select(
        F.col(id_col), F.sha2(normalize(F.col(text_col)), 256).alias("_h")
    )
    return hashed.groupBy("_h").agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    ).select(id_col, "n_copies")


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) exploded inverted-index rows, distinct per doc."""
    return df.select(
        F.col(id_col),
        F.explode(shingle_array(normalize(F.col(text_col)), k)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= τ).

    Inverted-index join: docs sharing no shingle never meet, so the join
    is driven by shared-shingle buckets rather than the full cross
    product. At larger scale swap in :func:`minhash_lsh_pairs` or cap
    per-shingle document frequency to bound skew.
    """
    sh = doc_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(i, shingle). One explode + one groupBy with map-side
    partial mins; the shuffle carries (id, num_hashes longs)."""
    sh = doc_shingles(df, id_col, text_col, k)
    hashed = sh.select(
        id_col,
        *[
            F.xxhash64(F.lit(i), F.col("shingle")).alias(f"_h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        id_col, F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH + exact verification.

    Candidates = docs agreeing on at least one band (rows/band = 4 with
    the defaults → catches pairs with Jaccard well below 0.8, then the
    exact check prunes). Work is linear in candidate pairs, not O(n²).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            F.lit(j), F.slice("signature", j * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact-Jaccard verification restricted to candidates
    sh = doc_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


SIMHASH_BITS = 63  # stay inside BIGINT so ANSI-mode sums can't overflow


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash per doc: each token votes ±1 on every bit of its
    xxhash64; bit j of the result is 1 iff the vote sum is positive."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    votes = toks.select(
        id_col,
        F.expr(
            "transform(sequence(0, 62), j -> "
            "CASE WHEN (shiftright(xxhash64(tok), j) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias("v"),
    )
    summed = votes.groupBy(id_col).agg(
        *[F.sum(F.element_at("v", j + 1)).alias(f"_b{j}") for j in range(SIMHASH_BITS)]
    )
    bits = summed.select(
        id_col,
        F.array(*[f"_b{j}" for j in range(SIMHASH_BITS)]).alias("votes"),
    )
    return bits.select(
        id_col,
        F.expr(
            "aggregate(transform(sequence(0, 62), j -> "
            "CASE WHEN element_at(votes, j + 1) > 0 THEN shiftleft(CAST(1 AS BIGINT), j) "
            "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 7,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band blocking (pigeonhole: any pair
    within ``max_hamming`` ≤ bands-1 bit flips agrees on ≥1 band), then
    exact Hamming verification with bit_count(xor)."""
    bits_per_band = SIMHASH_BITS // bands
    sig = simhash(df, id_col, text_col)
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        (
                            F.shiftright("simhash", j * bits_per_band)
                            % (2 ** bits_per_band)
                        ).alias("bucket"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bucket")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "band", "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "band", "bucket"
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")
