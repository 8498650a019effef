"""Round-10 tests: invariants for the three new queries plus
degenerate-input regression tests for the advice-r9 fixes — each of
those bugs was invisible to the hash-parity gate because BOTH engines
(or the batch/stream pair) shared the flaw, so the regression tests
here construct the degenerate inputs explicitly and assert the fixed
semantics in every engine."""

from __future__ import annotations

import math
import os

import pandas as pd

from flink_learning_practise_spark.datasets import TABLES
from flink_learning_practise_spark.oracle import run_duckdb
from flink_learning_practise_spark.plans import llm_pipeline as llm
from flink_learning_practise_spark.registry import all_queries

SF_SMALL = "/root/testdata/sf0.001"


def rows_of(spark, sf_small, name):
    return all_queries()[name].fn(spark, sf_small).collect()


# ---------------------------------------------------------------------------
# invariants for the round-10 registrations


def test_decontaminate_semantic_contract(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_decontaminate_semantic")
    for r in rows:
        assert r.cosine >= llm.SEMDECON_TAU
        assert r.vec_id % llm.SEMDECON_MOD != 0  # corpus side only
        assert r.bench_id % llm.SEMDECON_MOD == 0  # benchmark side only
        assert 1 <= r.list_id <= llm.IVF_NLIST


def test_bpe_merges_rounds_and_composition(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_bpe_merges")
    assert [r.merge_round for r in rows] == list(
        range(1, len(rows) + 1)
    )  # contiguous rounds
    assert len(rows) == llm.BPE_ROUNDS  # real corpora never run dry
    seen = set()
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count >= 1
        # the same (left, right) pair can never be the argmax twice:
        # after its merge the pair no longer exists in the vocab
        assert (r.left_sym, r.right_sym) not in seen
        seen.add((r.left_sym, r.right_sym))


def test_rerank_inference_is_a_permutation(spark, sf_small):
    rows = rows_of(spark, sf_small, "q_rerank_inference")
    assert len(rows) == llm.RRF_TOP_N
    n = len(rows)
    assert sorted(r.rrf_rank for r in rows) == list(range(1, n + 1))
    assert sorted(r.ce_rank for r in rows) == list(range(1, n + 1))
    assert sum(r.rank_shift for r in rows) == 0  # permutation conservation
    for r in rows:
        assert 0.0 <= r.ce_score <= 1.0
        assert r.rank_shift == r.rrf_rank - r.ce_rank


# ---------------------------------------------------------------------------
# BPE anchored single-pass replace ≡ greedy left-to-right merge (the
# plan + oracle both rely on this equivalence; prove it on adversarial
# sequences — a single-space pattern FAILS this property on
# same-symbol runs ≥ 5, which is why the engines use the two-space
# separator form)


def _greedy_merge(syms: list[str], l: str, r: str) -> list[str]:
    """Reference BPE merge: scan left-to-right, merge non-overlapping
    adjacent (l, r) occurrences (Sennrich et al. 2016)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _anchored_replace(syms: list[str], l: str, r: str) -> list[str]:
    """The engine formulation: two-space-separated symbols wrapped in
    single spaces, ONE literal replace of " l  r " by " lr " — the
    pattern consumes only one space of each shared separator, so the
    next occurrence's anchor survives (str.replace is left-to-right
    non-overlapping — the same semantics as Spark's F.replace and
    DuckDB's replace)."""
    s = " " + "  ".join(syms) + " "
    return s.replace(f" {l}  {r} ", f" {l}{r} ").split()


def test_bpe_anchored_replace_equals_greedy_merge():
    cases = [
        (["a", "b"], "a", "b"),
        (["a", "b", "a", "b", "a", "b", "a", "b"], "a", "b"),
        (["b", "b", "b"], "b", "b"),
        (["b", "b", "b", "b"], "b", "b"),
        (["a", "b", "b"], "b", "b"),
        (["ab", "a", "b", "ab"], "a", "b"),
        (["x", "a", "b", "x", "a", "b"], "a", "b"),
        (["a"], "a", "b"),
        ([], "a", "b"),
        # multi-char symbols sharing prefixes/suffixes with the pair —
        # the space anchors must prevent partial-symbol matches
        (["xa", "b"], "a", "b"),
        (["a", "bx"], "a", "b"),
        (["a", "b", "c", "a", "b"], "a", "b"),
    ]
    import itertools
    import random

    rng = random.Random(10)
    alphabet = ["a", "b", "c", "ab", "bc"]
    for _ in range(300):
        n = rng.randrange(0, 9)
        syms = [rng.choice(alphabet) for _ in range(n)]
        l, r = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((syms, l, r))
    for syms, l, r in cases:
        assert _anchored_replace(syms, l, r) == _greedy_merge(syms, l, r), (
            syms,
            l,
            r,
        )
    # exhaustive over short sequences of {a, b}
    for n in range(0, 7):
        for syms in itertools.product("ab", repeat=n):
            for l, r in itertools.product("ab", repeat=2):
                assert _anchored_replace(list(syms), l, r) == _greedy_merge(
                    list(syms), l, r
                ), (syms, l, r)


# ---------------------------------------------------------------------------
# degenerate-input regressions (advice r9): synthetic tables where the
# pre-fix code gave the wrong answer in BOTH engines


def _synthetic_dir(tmp_path, overrides: dict[str, pd.DataFrame]) -> str:
    """A fake sf_dir: synthetic parquet for the tables under test,
    symlinks to sf0.001 for the rest (run_duckdb views every table)."""
    d = tmp_path / "sfx"
    d.mkdir()
    for t in TABLES:
        p = d / f"{t}.parquet"
        if t in overrides:
            overrides[t].to_parquet(p, index=False)
        else:
            os.symlink(os.path.join(SF_SMALL, f"{t}.parquet"), p)
    return str(d)


def _parity_rows(spark, name: str, sf_dir: str):
    """Run the Spark plan AND the oracle on sf_dir; assert they agree;
    return the Spark rows."""
    q = all_queries()[name]
    rows = q.fn(spark, sf_dir).collect()
    cols, orows, _ = run_duckdb(q.oracle, sf_dir)
    spark_set = sorted(tuple(r[c] for c in cols) for r in rows)
    oracle_set = sorted(tuple(r) for r in orows)
    assert spark_set == oracle_set
    return rows


def test_order_backlog_peak_carries_month_boundary(spark, tmp_path):
    """A month whose FIRST delta is negative peaks at the carried-in
    level (advice r9, medium): order 2 is still open when February
    starts, so February's peak is 1 even though every in-month step
    level is 0."""
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_orderdate": pd.to_datetime(["2024-01-05", "2024-01-25"]),
        }
    ).astype({"o_orderdate": "datetime64[us]"})
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 2],
            "l_shipdate": pd.to_datetime(["2024-01-20", "2024-02-10"]),
        }
    ).astype({"l_shipdate": "datetime64[us]"})
    d = _synthetic_dir(tmp_path, {"orders": orders, "lineitem": lineitem})
    rows = {r.month.isoformat(): r for r in _parity_rows(spark, "q_order_backlog", d)}
    jan, feb = rows["2024-01-01"], rows["2024-02-01"]
    # Jan: +1@05, -1@21, +1@25 → levels 1,0,1
    assert jan.peak_backlog == 1 and jan.eom_backlog == 1
    # Feb: carry-in 1, single delta -1@11 → level 0; peak is the CARRY-IN
    assert feb.peak_backlog == 1, "month-boundary carry-in lost"
    assert feb.eom_backlog == 0


def test_backlog_sink_monthly_carries_month_boundary():
    import datetime

    from flink_learning_practise_spark.streaming.pipeline import BacklogSink

    sink = BacklogSink()
    sink.total = 0
    sink.rows = [
        (datetime.date(2024, 1, 5), 1, 1),
        (datetime.date(2024, 1, 21), -1, 0),
        (datetime.date(2024, 1, 25), 1, 1),
        (datetime.date(2024, 2, 11), -1, 0),
    ]
    out = sink.monthly()
    assert out[datetime.date(2024, 1, 1)] == (1, 1)
    assert out[datetime.date(2024, 2, 1)] == (1, 0), (
        "streaming peak must seed from the carry-in level"
    )


def test_js_divergence_disjoint_sources_emit_ln2(spark, tmp_path):
    """Source pairs sharing ZERO tokens are the maximally-drifted case:
    they must appear with JS = ln 2, not vanish (advice r9) — matching
    the streaming twin token_js_batch's left-join semantics."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "source": ["s_a", "s_a", "s_b"],
            "text": ["foo bar foo", "bar baz", "qux quux corge"],
            "lang": ["en", "en", "en"],
            "n_chars": [11, 7, 14],
        }
    )
    d = _synthetic_dir(tmp_path, {"documents": docs})
    rows = _parity_rows(spark, "q_js_divergence", d)
    assert len(rows) == 1  # the (s_a, s_b) pair exists despite 0 overlap
    [r] = rows
    assert r.n_shared_tokens == 0
    assert r.js_nats == 0.693147  # floor(ln 2 · 1e6 + .5)/1e6


def test_burstiness_all_zero_gaps_is_defined(spark, tmp_path):
    """An event type whose gaps are all exactly 0 (duplicate
    timestamps) must report burstiness 0.0 in BOTH engines, not
    NaN-vs-0 divergence (advice r9)."""
    ts = pd.to_datetime(
        ["2024-03-01 12:00:00"] * 3 + ["2024-03-01 10:00:00",
                                       "2024-03-01 11:30:00"]
    )
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 9, 9],
            "event_type": ["dup", "dup", "dup", "ok", "ok"],
            "ts": ts,
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            "props": ["{}"] * 5,
        }
    ).astype({"ts": "datetime64[us]"})
    d = _synthetic_dir(tmp_path, {"events": events})
    rows = {r.event_type: r for r in _parity_rows(spark, "q_burstiness", d)}
    assert rows["dup"].burstiness == 0.0
    assert rows["dup"].mean_gap_sec == 0.0 and rows["dup"].std_gap_sec == 0.0
    # the non-degenerate type still gets the closed form: single gap →
    # σ=0, μ>0 → B = −1
    assert rows["ok"].burstiness == -1.0


def test_max_concurrency_counts_midnight_spanning_sessions(spark, tmp_path):
    """Sibling audit of the backlog carry-in class (advice r9): the
    other sweep-line query must count a session live at day start.
    q_max_concurrency is structurally immune — sessions explode per
    day and clip to day bounds, so the carried level IS an in-day
    row — and this pins it: user 7's session spans midnight (events
    23:50 → 00:10, one 20-min-gap session), user 9 is active only on
    day 2, so day 2 peaks at 2 even though one of the two sessions
    started the day before."""
    ts = pd.to_datetime(
        [
            "2024-03-01 23:50:00",
            "2024-03-02 00:10:00",  # same session (gap 20 min < 30)
            "2024-03-02 00:05:00",
        ]
    )
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 9],
            "event_type": ["a", "a", "a"],
            "ts": ts,
            "value": [1.0, 1.0, 1.0],
            "props": ["{}"] * 3,
        }
    ).astype({"ts": "datetime64[us]"})
    d = _synthetic_dir(tmp_path, {"events": events})
    rows = {
        r.day.isoformat(): r.max_concurrency
        for r in _parity_rows(spark, "q_max_concurrency", d)
    }
    assert rows["2024-03-01"] == 1
    assert rows["2024-03-02"] == 2, (
        "midnight-spanning session lost at the day boundary"
    )


def test_token_js_batch_matches_batch_constant():
    assert abs(
        0.693147 - math.floor(math.log(2) * 1e6 + 0.5) / 1e6
    ) < 1e-12
