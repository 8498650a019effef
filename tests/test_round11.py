"""Round-11 tests: degenerate-input regressions for the advice-r10
fixes. Same discipline as tests/test_round10.py — each flaw was (or
would be) invisible to the hash-parity gate because both engines
shared it on the generated data, so these construct the degenerate
inputs explicitly and assert the fixed semantics in every engine."""

from __future__ import annotations

import datetime
import hashlib
import os

import pandas as pd

from flink_learning_practise_spark.datasets import TABLES
from flink_learning_practise_spark.oracle import run_duckdb
from flink_learning_practise_spark.plans import llm_pipeline as llm
from flink_learning_practise_spark.registry import all_queries

SF_SMALL = "/root/testdata/sf0.001"


def _synthetic_dir(tmp_path, overrides: dict[str, pd.DataFrame]) -> str:
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
    q = all_queries()[name]
    rows = q.fn(spark, sf_dir).collect()
    cols, orows, _ = run_duckdb(q.oracle, sf_dir)
    spark_set = sorted(tuple(r[c] for c in cols) for r in rows)
    oracle_set = sorted(tuple(r) for r in orows)
    assert spark_set == oracle_set
    return rows


# ---------------------------------------------------------------------------
# advice r10 #1: a shorter-than-EMB_DIM embedding must be excluded from
# semantic decontamination in BOTH engines — Spark's zip_with dot is
# NULL on ragged arrays (pair silently dropped) while DuckDB's
# generate_series SUM skips the missing components and yields a PARTIAL
# dot product that can pass tau, so without the dim filter the engines
# diverge the moment a ragged row appears.


def test_decontaminate_semantic_ignores_ragged_embeddings(spark, tmp_path):
    dim = llm.EMB_DIM
    n = 24
    # near-orthogonal full-dim vectors: e_i basis pattern; vec 0 is the
    # benchmark row (0 % SEMDECON_MOD == 0)
    vecs = []
    for i in range(n):
        v = [0.0] * dim
        v[i % dim] = 1.0
        vecs.append(v)
    # the ragged row: the first half of bench vec 0 — its PARTIAL dot
    # with the benchmark is a perfect 1.0 cosine under the pre-fix
    # oracle arithmetic, while Spark's zip_with yields NULL. Pick its
    # vec_id as the LAST md5-ordered candidate so it can never be one
    # of the IVF_NLIST centroids (centroids are md5-ordered).
    ragged_id = max(
        (i for i in range(1, n) if i % llm.SEMDECON_MOD != 0),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    vecs[ragged_id] = vecs[0][: dim // 2]
    emb = pd.DataFrame(
        {
            "vec_id": list(range(n)),
            "embedding": vecs,
            "label": [i % 3 for i in range(n)],
        }
    )
    d = _synthetic_dir(tmp_path, {"embeddings": emb})
    rows = _parity_rows(spark, "q_decontaminate_semantic", d)
    ids_in_output = {r.vec_id for r in rows} | {r.bench_id for r in rows}
    assert ragged_id not in ids_in_output, (
        "ragged (short) embedding leaked into the decontamination pairs"
    )


# ---------------------------------------------------------------------------
# advice r10 #5: a month with a carried backlog but NO delta dates at
# all (no order placed, none finally shipped) was absent from the
# output entirely — the same boundary class as the r9 carry-in fix,
# one level up. Both engines shared the gap, so parity hid it.


def test_order_backlog_densifies_delta_free_months(spark, tmp_path):
    """Order 1 is placed Jan 5 and last-ships Apr 10: the only deltas
    are +1 on Jan 5 and -1 on Apr 11, so February and March have no
    delta dates yet hold a backlog of 1 the whole month — they must
    appear with peak = eom = 1 in BOTH engines."""
    orders = pd.DataFrame(
        {
            "o_orderkey": [1],
            "o_orderdate": pd.to_datetime(["2024-01-05"]),
        }
    ).astype({"o_orderdate": "datetime64[us]"})
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1],
            "l_shipdate": pd.to_datetime(["2024-04-10"]),
        }
    ).astype({"l_shipdate": "datetime64[us]"})
    d = _synthetic_dir(tmp_path, {"orders": orders, "lineitem": lineitem})
    rows = {
        r.month.isoformat(): r
        for r in _parity_rows(spark, "q_order_backlog", d)
    }
    assert set(rows) == {
        "2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"
    }, "delta-free months missing from the densified output"
    assert (rows["2024-01-01"].peak_backlog,
            rows["2024-01-01"].eom_backlog) == (1, 1)
    for m in ("2024-02-01", "2024-03-01"):
        assert (rows[m].peak_backlog, rows[m].eom_backlog) == (1, 1), (
            f"{m}: carried level lost in a delta-free month"
        )
    # April: carry-in 1, single delta -1 on the 11th → peak 1, eom 0
    assert (rows["2024-04-01"].peak_backlog,
            rows["2024-04-01"].eom_backlog) == (1, 0)


def test_backlog_sink_monthly_densifies_delta_free_months():
    from flink_learning_practise_spark.streaming.pipeline import BacklogSink

    sink = BacklogSink()
    sink.rows = [
        (datetime.date(2024, 1, 5), 1, 1),
        (datetime.date(2024, 4, 11), -1, 0),
    ]
    out = sink.monthly()
    assert out[datetime.date(2024, 1, 1)] == (1, 1)
    assert out[datetime.date(2024, 2, 1)] == (1, 1), (
        "streaming rollup must densify delta-free months"
    )
    assert out[datetime.date(2024, 3, 1)] == (1, 1)
    assert out[datetime.date(2024, 4, 1)] == (1, 0)
    # year-boundary gap: Dec 2023 -> Feb 2024 densifies Jan 2024
    sink2 = BacklogSink()
    sink2.rows = [
        (datetime.date(2023, 12, 20), 1, 1),
        (datetime.date(2024, 2, 2), -1, 0),
    ]
    out2 = sink2.monthly()
    assert out2[datetime.date(2024, 1, 1)] == (1, 1)
    assert out2[datetime.date(2024, 2, 1)] == (1, 0)


# ---------------------------------------------------------------------------
# advice r10 #2: quiet_gate's stated wall-time cap must count the 1 s
# sampling windows of the wait loop, not just the sleeps.


def test_quiet_gate_budget_counts_sampling_windows(monkeypatch):
    import bench

    # force "busy" readings so the gate loops until the budget is gone
    monkeypatch.setattr(bench, "_busy_sample", lambda *a, **k: 0.99)
    sleeps: list[float] = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    budget = [12.0]
    rec = bench.quiet_gate(budget, threshold=0.10)
    assert budget[0] <= 0
    # charged wall time = sleeps + re-check sampling windows; with the
    # 1 s samples now counted, waited must cover the WHOLE budget draw
    assert rec["waited_sec"] >= 12.0 - 1e-9
    assert rec["waited_sec"] == sum(sleeps) + (len(rec["busy"]) - 1) * 1.0
    # the per-pass signal sample still happens on a spent budget, but
    # the gate then exits immediately: exactly one sample, zero wait
    rec2 = bench.quiet_gate(budget, threshold=0.10)
    assert len(rec2["busy"]) == 1 and rec2["waited_sec"] == 0.0


# ---------------------------------------------------------------------------
# #233b BPE encode (VERDICT r10 ask #3): the engines apply the learned
# merge table IN TRAINING ORDER, one anchored single-pass replace per
# merge. That is claimed equivalent to the canonical priority-based
# BPE encoder (repeatedly merge the lowest-rank pair present,
# leftmost-first) — a trick the plan and oracle SHARE, so per the r10
# rule it is property-tested here against an independent
# implementation that never sees the replace formulation.


def _canonical_bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder (Sennrich et al. 2016 apply-BPE): start from
    characters; repeatedly find the EARLIEST-LEARNED merge whose pair
    occurs in the current symbol sequence and merge its occurrences
    leftmost-first, one at a time; stop when no merge applies."""
    syms = list(word)
    rank = {pair: i for i, pair in enumerate(merges)}
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            return syms
        _, i = best
        syms[i: i + 2] = [syms[i] + syms[i + 1]]


def _sequential_anchored_encode(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """The engine formulation: spell the word two-space-separated, then
    ONE left-to-right non-overlapping replace per merge, in training
    order — exactly what the Spark literal replace chain and the
    oracle's enc{r} CTE chain execute."""
    s = " " + "  ".join(word) + " "
    for l, r in merges:
        s = s.replace(f" {l}  {r} ", f" {l}{r} ")
    return s.split()


def test_bpe_sequential_apply_equals_canonical_encoder():
    import itertools
    import random

    rng = random.Random(11)
    # adversarial hand cases: same-symbol runs, chained merges whose
    # outputs feed later merges, merges that can never fire
    cases = [
        ("abab", [("a", "b"), ("ab", "ab")]),
        ("aaaa", [("a", "a"), ("aa", "aa")]),
        ("aaaaa", [("a", "a"), ("aa", "a")]),
        ("abcabc", [("b", "c"), ("a", "bc"), ("abc", "abc")]),
        ("banana", [("a", "n"), ("an", "an"), ("b", "anan")]),
        ("", [("a", "b")]),
        ("x", [("a", "b")]),
        ("abba", [("a", "b"), ("b", "a")]),
    ]
    for _ in range(400):
        word = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 10)))
        # build a VALID merge table the way training does: each merge's
        # pair is over symbols that exist at that point
        symbols = list("abc")
        merges: list[tuple[str, str]] = []
        for _m in range(rng.randrange(0, 5)):
            l, r = rng.choice(symbols), rng.choice(symbols)
            merges.append((l, r))
            symbols.append(l + r)
        cases.append((word, merges))
    # exhaustive over short {a,b} words with every 2-merge valid table
    two_merge_tables = []
    for l1, r1 in itertools.product("ab", repeat=2):
        syms = ["a", "b", l1 + r1]
        for l2 in syms:
            for r2 in syms:
                two_merge_tables.append([(l1, r1), (l2, r2)])
    for n in range(0, 6):
        for w in itertools.product("ab", repeat=n):
            word = "".join(w)
            for tbl in two_merge_tables:
                cases.append((word, tbl))
    for word, merges in cases:
        assert _sequential_anchored_encode(word, merges) == \
            _canonical_bpe_encode(word, merges), (word, merges)


def test_bpe_encode_contract(spark, sf_small):
    """Invariants + a spot-check that the registered query's token
    counts equal the canonical encoder's on the actual learned table."""
    from flink_learning_practise_spark.operators import text as optext

    qs = all_queries()
    rows = qs["q_bpe_encode"].fn(spark, sf_small).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.n_tokens >= r.n_words  # >= one token per word
        assert r.bpe_fertility >= 1.0
    merges = [
        (m.left_sym, m.right_sym)
        for m in sorted(
            llm.bpe_merges(spark, sf_small).collect(),
            key=lambda m: m.merge_round,
        )
    ]
    assert merges, "learned merge table is empty on real data"
    # recompute one language's totals with the canonical encoder
    docs = (
        llm.load(spark, sf_small, "documents")
        .select("lang", F_explode_words(optext))
        .collect()
    )
    by_lang: dict[str, list[int]] = {}
    for row in docs:
        toks = [w for w in row.ws if w != ""]
        by_lang.setdefault(row.lang, []).append(
            sum(len(_canonical_bpe_encode(w, merges)) for w in toks)
        )
    want = {lang: sum(v) for lang, v in by_lang.items()}
    got = {r.lang: r.n_tokens for r in rows}
    assert got == want, "registered encode diverges from canonical BPE"


def F_explode_words(optext):
    from pyspark.sql import functions as F

    return optext.words(F.col("text")).alias("ws")


# ---------------------------------------------------------------------------
# r11 probe-normalization plumbing (VERDICT r10 ask #1)


def test_probe_min_and_calib_ref_shape():
    import bench

    probes = [
        {"py": 1.2, "disk": 0.2, "spark": 0.9},
        {"py": 1.0, "disk": None, "spark": 0.8},
        {"py": None, "disk": 0.3, "spark": None},
    ]
    assert bench._probe_min(probes, "py") == 1.0
    assert bench._probe_min(probes, "disk") == 0.2
    assert bench._probe_min(probes, "spark") == 0.8
    assert bench._probe_min([], "py") is None
    assert set(bench.CALIB_REF) == {"py", "disk", "spark"}
    assert all(v > 0 for v in bench.CALIB_REF.values())


# ---------------------------------------------------------------------------
# r11 curation-audit registrations: cross-query consistency contracts
# (the parity harness checks each against DuckDB; these pin the
# relationships BETWEEN queries that parity can't see)


def test_split_leakage_contract(spark, sf_small):
    qs = all_queries()
    rows = qs["q_split_leakage"].fn(spark, sf_small).collect()
    splits = {"train", "val", "test"}
    for r in rows:
        assert r.split_lo in splits and r.split_hi in splits
        assert r.split_lo < r.split_hi  # normalized pair order
        assert r.n_pairs >= 1
        # every counted pair is over the jaccard threshold, so the mean
        # can't be below it (up to the micro rounding)
        assert r.mean_jaccard >= llm.JACCARD_THRESHOLD - 1e-6
        assert r.mean_jaccard <= 1.0


def test_dedup_survivors_quality_contract(spark, sf_small):
    qs = all_queries()
    surv = qs["q_dedup_survivors_quality"].fn(spark, sf_small).collect()
    clusters = qs["q_dedup_clusters"].fn(spark, sf_small).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    # exactly one survivor per cluster, and it is a cluster member
    assert {r.cluster_id for r in surv} == set(by_cluster)
    assert len(surv) == len(by_cluster)
    for r in surv:
        assert r.survivor_id in by_cluster[r.cluster_id]
    # the survivor really is the quality argmax of its cluster
    q = {r.doc_id: r.quality_score
         for r in qs["q_quality_score"].fn(spark, sf_small).collect()}
    for r in surv:
        best = max(by_cluster[r.cluster_id],
                   key=lambda d: (q[d], -d))
        assert r.survivor_id == best, (r.cluster_id, r.survivor_id, best)


def test_benchmark_vocab_coverage_contract(spark, sf_small):
    rows = all_queries()["q_benchmark_vocab_coverage"].fn(
        spark, sf_small
    ).collect()
    assert rows
    denoms = {r.n_bench_types for r in rows}
    assert len(denoms) == 1  # one shared benchmark vocabulary
    for r in rows:
        assert 0 <= r.n_covered <= r.n_bench_types
        assert 0.0 <= r.coverage <= 1.0


def test_crosslingual_dups_subset_of_embedding_pairs(spark, sf_small):
    qs = all_queries()
    cross = qs["q_crosslingual_dups"].fn(spark, sf_small).collect()
    allpairs = {
        (r.id_a, r.id_b): r.cosine
        for r in qs["q_dedup_embedding"].fn(spark, sf_small).collect()
    }
    for r in cross:
        assert r.lang_a != r.lang_b
        assert r.cosine >= llm.EMBED_THRESHOLD
        assert allpairs.get((r.id_a, r.id_b)) == r.cosine


def test_split_repair_eliminates_leakage(spark, sf_small):
    """#241 is the FIX for what #237 audits: after reassigning every
    doc to its cluster canonical's split, NO near-dup pair may cross
    splits (pairs live inside clusters by construction), repaired
    splits are cluster-constant, and untouched docs keep their
    original assignment."""
    qs = all_queries()
    repair = qs["q_split_repair"].fn(spark, SF_SMALL).collect()
    fixed = {r.doc_id: r.split_fixed for r in repair}
    orig = {r.doc_id: r.split for r in repair}
    by_cluster: dict[int, set] = {}
    for r in repair:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split_fixed)
        if not r.moved:
            assert r.split == r.split_fixed
    assert all(len(s) == 1 for s in by_cluster.values()), (
        "repaired split is not cluster-constant"
    )
    # no near-dup pair crosses the REPAIRED split
    pairs = llm._shared_pair_tier(spark, SF_SMALL).collect()
    assert pairs, "no near-dup pairs at sf0.001 — contract untestable"
    for p in pairs:
        assert fixed[p.id_a] == fixed[p.id_b], (p.id_a, p.id_b)
    # and the audit's finding is real: the ORIGINAL split leaked
    assert any(orig[p.id_a] != orig[p.id_b] for p in pairs) == any(
        r.moved for r in repair
    )
