"""Invariant tests for the round-9 diagnostics — semantic properties
the hash-parity gate can't express (bounds, conservation laws,
degenerate-input behavior). Run at sf0.001 via the registered plan
functions so they exercise the exact driver surface."""

from __future__ import annotations

import math

import pytest

from flink_learning_practise_spark.plans import llm_pipeline as llm
from flink_learning_practise_spark.registry import all_queries


def rows_of(spark, sf_small, name):
    return all_queries()[name].fn(spark, sf_small).collect()


def test_rbo_bounds_and_match_count(spark, sf_small):
    [r] = rows_of(spark, sf_small, "q_rbo_overlap")
    # truncated RBO_min is bounded by the full-agreement prefix sum
    assert 0.0 <= r.rbo <= (1 - llm.RBO_P ** llm.RRF_TOP_N) + 1e-9
    assert 0 <= r.n_matched <= r.k == llm.RRF_TOP_N
    assert r.p == llm.RBO_P


def test_embedding_dim_stats_conservation(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_embedding_dim_stats")
    assert len(rows) == llm.EMB_DIM
    assert [r.dim for r in rows] == list(range(1, llm.EMB_DIM + 1))
    n = {r.n_vecs for r in rows}
    assert len(n) == 1  # every dim sees every vector
    for r in rows:
        assert r.var_val >= 0.0
        assert r.min_val <= r.mean_val + 1e-6
        assert r.mean_val <= r.max_val + 1e-6


def test_ivf_balance_shares_sum_to_one(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_ivf_balance")
    assert 1 <= len(rows) <= llm.IVF_NLIST
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    # load_factor is share * nlist (both independently rounded)
    for r in rows:
        assert abs(r.load_factor - r.share * llm.IVF_NLIST) < 1e-4 * llm.IVF_NLIST
        assert r.n_vecs > 0


def test_js_divergence_bounds_and_symmetric_pairs(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_js_divergence")
    assert rows, "no source pairs"
    n_sources = len({r.source_a for r in rows} | {r.source_b for r in rows})
    # r10 contract: EVERY unordered pair appears — zero-overlap pairs
    # carry JS = ln 2 instead of vanishing (advice r9)
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b  # each unordered pair once
        assert -1e-6 <= r.js_nats <= math.log(2) + 1e-6
        assert r.n_shared_tokens >= 0
        if r.n_shared_tokens == 0:
            assert r.js_nats == 0.693147


def test_token_entropy_band_partition(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_token_entropy")
    assert {r.band for r in rows} <= {"repetitive", "mixed", "diverse"}
    for r in rows:
        assert 0.0 <= r.mean_norm_entropy <= 1.0 + 1e-6
        assert r.mean_entropy_nats >= 0.0
        assert r.n_docs > 0


def test_length_fit_moments_valid(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_length_fit")
    assert rows
    for r in rows:
        assert r.sigma_ln >= 0.0
        assert r.median_chars_est > 0
        # median estimate consistent with mu: exp(mu) to 2dp
        assert abs(r.median_chars_est - round(math.exp(r.mu_ln), 2)) < 0.5


def test_burstiness_range(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_burstiness")
    assert rows
    for r in rows:
        # B ∈ [−1, 1): −1 ⇔ σ=0 (periodic), →1 heavy-tailed
        assert -1.0 - 1e-6 <= r.burstiness < 1.0
        assert r.mean_gap_sec > 0 and r.std_gap_sec >= 0
        assert r.n_gaps > 0


def test_weekly_decomposition_covers_all_days(spark, sf_small):
    from pyspark.sql import functions as F

    from flink_learning_practise_spark.datasets import load

    rows = rows_of(spark, sf_small, "q_weekly_decomposition")
    assert 1 <= len(rows) <= 7
    assert all(0 <= r.weekday <= 6 for r in rows)
    n_days = (
        load(spark, sf_small, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r.n_days for r in rows) == n_days


def test_reorder_rate_bounds(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_reorder_rate")
    assert rows
    for r in rows:
        assert 0 <= r.n_repeat <= r.n_pairs
        assert 0.0 <= r.reorder_rate <= 1.0


def test_order_backlog_nonnegative_step(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_order_backlog")
    assert rows
    for r in rows:
        # every −1 is preceded by its order's +1 (ship ≥ order date),
        # so the step function can never go negative
        assert 0 <= r.eom_backlog <= r.peak_backlog
    # months come out sorted and unique
    months = [r.month for r in rows]
    assert months == sorted(months) and len(set(months)) == len(months)
