"""Bloom prefilter (operators/bloom.py): exactness of the composed
anti-join under any filter sizing, no-false-negative guarantee, and the
bypass actually bypassing."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_learning_practise_spark.operators import bloom


def test_bloom_no_false_negatives_and_exact_anti_join(spark):
    """Every inserted key must test positive (no false negatives), and
    the prefiltered anti-join must equal the plain anti-join EXACTLY —
    including under a deliberately undersized filter (m=64 for 300
    keys) where almost everything is a false positive."""
    keys = spark.range(0, 600, 2).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )  # 300 even-id digests
    probe = spark.range(0, 900).select(
        F.col("id").alias("pid"), F.md5(F.col("id").cast("string")).alias("k")
    )
    for m_bits in (64, 1 << 12):
        built = bloom.build_bloom(keys, "k", m_bits=m_bits, k=3)
        assert len(built) == m_bits and set(built) <= {"0", "1"}
        # no false negatives: every key row tests positive
        neg = (
            keys.withColumn(
                "maybe", bloom.bloom_maybe_contains(F.col("k"), built, k=3)
            )
            .filter(~F.col("maybe"))
            .count()
        )
        assert neg == 0, f"m={m_bits}: false negatives"
        got = {
            r.pid
            for r in bloom.bloom_prefiltered_anti_join(
                probe, keys, "k", m_bits=m_bits, k=3
            ).collect()
        }
        want = {
            r.pid for r in probe.join(keys, "k", "left_anti").collect()
        }
        assert got == want == set(range(1, 900, 2)) | set(range(600, 900, 2))


def test_bloom_bypass_reduces_join_input_and_keeps_nulls(spark):
    """A well-sized filter must route most true-miss rows around the
    join (bypass fraction high), and NULL keys must survive exactly as
    a plain left-anti keeps them."""
    keys = spark.range(100).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    probe = spark.range(5000).select(
        F.col("id").alias("pid"),
        F.when(
            F.col("id") % 50 != 0, F.md5((F.col("id") + 100000).cast("string"))
        ).alias("k"),  # all misses; every 50th row has a NULL key
    )
    built = bloom.build_bloom(keys, "k")  # default m: ~131k bits for 100 keys
    bypassed = probe.filter(
        ~bloom.bloom_maybe_contains(F.col("k"), built)
    ).count()
    assert bypassed >= 4950  # FP rate at this sizing is ~0
    out = bloom.bloom_prefiltered_anti_join(probe, keys, "k")
    assert out.count() == 5000  # nothing matched; NULL-key rows kept
    assert out.filter(F.col("k").isNull()).count() == 100

    # NULL keys against a DENSE filter (every bit set): xxhash64(NULL)
    # returns the seed hash, so without the explicit isNotNull guard a
    # NULL key reads "maybe" and lands in BOTH branches (review r4:
    # empirically 2x duplication). Must be exactly once, maybe=False.
    dense_keys = spark.range(3000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    dense = bloom.build_bloom(dense_keys, "k", m_bits=64, k=3)
    null_probe = spark.range(10).select(
        F.col("id").alias("pid"), F.lit(None).cast("string").alias("k")
    )
    flags = null_probe.select(
        bloom.bloom_maybe_contains(F.col("k"), dense, k=3).alias("m")
    ).collect()
    assert all(r.m is False for r in flags)
    out2 = bloom.bloom_prefiltered_anti_join(null_probe, dense_keys, "k", m_bits=64, k=3)
    assert out2.count() == 10  # kept exactly once, never duplicated


def test_bloom_anti_join_property_random_keysets(spark):
    """Property sweep (fixed-seed randomized): for random key/probe
    sets with NULLs, unicode and empty strings, at several filter
    sizings, the prefiltered anti-join must equal the plain left-anti
    exactly."""
    import random

    rng = random.Random(7)
    alphabet = ["a", "b", "é", "", "x y", "\t", "0"]
    for trial in range(4):
        keys_vals = [
            "".join(rng.choices(alphabet, k=rng.randint(1, 3)))
            for _ in range(rng.randint(1, 40))
        ]
        probe_vals = [
            None if rng.random() < 0.15
            else "".join(rng.choices(alphabet, k=rng.randint(1, 3)))
            for _ in range(60)
        ]
        keys = spark.createDataFrame([(v,) for v in keys_vals], "k string")
        probe = spark.createDataFrame(
            list(enumerate(probe_vals)), "pid long, k string"
        )
        m = rng.choice([32, 512, 1 << 12])
        got = sorted(
            r.pid for r in bloom.bloom_prefiltered_anti_join(
                probe, keys, "k", m_bits=m, k=3
            ).collect()
        )
        want = sorted(
            r.pid for r in probe.join(keys, "k", "left_anti").collect()
        )
        assert got == want, f"trial {trial} m={m}"
