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
