"""Correctness-window discipline (VERDICT r6 ask #2).

The driver's per-round correctness gate checks only the FIRST 50
``registry.all_queries()`` entries.  Round 6 registered 64 new queries
against that 50-slot window and left 50 of them without a driver row —
a backlog exactly the size of one full window.  These tests make that
class of process failure a commit-time error:

1. Queries that have never received a driver correctness row must
   occupy a contiguous PREFIX of the registry (positions 1..k) — a
   never-checked query behind position 50 would be silently skipped
   again.
2. The count of never-checked registrations must never exceed the
   window size (50): registering query #51 while a backlog exists
   re-creates the round-6 gap, so registration freezes until the
   driver drains it.

"Driver-checked" is computed from the ``CORRECTNESS_r*.json`` files the
driver commits at the repo root, so the assertion tightens itself every
round without edits.
"""

from __future__ import annotations

import glob
import json
import os

from flink_learning_practise_spark.registry import all_queries

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _driver_checked() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen |= set(json.load(f))
    return seen


def test_correctness_files_present():
    # If the driver files ever vanish, the other tests would pass
    # vacuously (everything "never checked", but <= 50 only by luck).
    assert glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")), (
        "no CORRECTNESS_r*.json at repo root — window tests need them"
    )


def test_never_checked_queries_lead_the_window():
    order = list(all_queries())
    seen = _driver_checked()
    never = [q for q in order if q not in seen]
    # Contiguous prefix: the first len(never) positions are exactly the
    # never-checked set, in order.
    assert order[: len(never)] == never, (
        "never-driver-checked queries must occupy registry positions "
        f"1..{len(never)}; found checked queries interleaved ahead of "
        f"{[q for q in never if order.index(q) >= len(never)][:5]}"
    )


def test_backlog_never_exceeds_window():
    order = list(all_queries())
    seen = _driver_checked()
    never = [q for q in order if q not in seen]
    assert len(never) <= WINDOW, (
        f"{len(never)} registered queries have no driver correctness "
        f"row but the window holds only {WINDOW} — registration is "
        "frozen until the backlog drains (VERDICT r6 ask #1/#2); "
        f"over-registered: {never[WINDOW:][:10]}"
    )


def test_reorder_rule_on_synthetic_history(monkeypatch):
    """Pins _reorder_for_window's sort rule directly (the other tests
    exercise it only through the real CORRECTNESS files): never-present
    first in registration order, then present-but-never-green, then
    greens by ascending last-green round with registration-order ties."""
    from flink_learning_practise_spark import registry as reg

    orig_registry = dict(reg._REGISTRY)
    try:
        reg._REGISTRY.clear()
        for name in ["g_r3", "fail", "new_b", "g_r2", "new_a", "g_r2_late"]:
            reg._REGISTRY[name] = reg.Query(name, lambda s, d: None, None)
        monkeypatch.setattr(
            reg,
            "driver_history",
            lambda: (
                {"g_r3", "fail", "g_r2", "g_r2_late"},  # ever checked
                {"g_r3": 3, "g_r2": 2, "g_r2_late": 2},  # last green
            ),
        )
        reg._reorder_for_window()
        assert list(reg._REGISTRY) == [
            "new_b",      # never checked, registration order
            "new_a",
            "fail",       # checked but never green — keeps priority
            "g_r2",       # oldest green, registration order breaks the tie
            "g_r2_late",
            "g_r3",
        ]
    finally:
        reg._REGISTRY.clear()
        reg._REGISTRY.update(orig_registry)


def test_row_green_rule():
    from flink_learning_practise_spark.registry import _row_green

    assert _row_green({"rows_match": True, "hash_match": True, "err": None})
    assert not _row_green({"hash_match": False, "err": None})
    assert not _row_green({"err": "AnalysisException"})
    assert _row_green({"err": "no_oracle", "spark_rows": 3})
    assert not _row_green({"err": "no_oracle", "spark_rows": 0})
    assert not _row_green({"err": "no_oracle"})


# ---------------------------------------------------------------------------
# SURVEY §2 ↔ registry cross-check (VERDICT r11 ask #1). Round 11
# shipped four driver-green capabilities (#237-#240) with no §2 row and
# a header id-count three rounds stale — the coverage checklist the
# whole review process keys on had drifted behind the code. These pins
# make both drift classes a commit-time error.

import re


def _survey_section2() -> str:
    with open(os.path.join(REPO_ROOT, "SURVEY.md")) as f:
        txt = f.read()
    return txt[txt.index("## §2"): txt.index("## §3")]


def test_every_registry_key_has_a_survey_s2_row():
    cited = set(re.findall(r"`(q_[a-z0-9_]+)`", _survey_section2()))
    missing = sorted(set(all_queries()) - cited)
    assert not missing, (
        "registered queries without a SURVEY §2 citation (add the "
        f"capability row before registering): {missing}"
    )


def test_survey_s2_cites_no_ghost_queries():
    cited = set(re.findall(r"`(q_[a-z0-9_]+)`", _survey_section2()))
    ghosts = sorted(cited - set(all_queries()))
    assert not ghosts, (
        f"SURVEY §2 cites queries() keys that are not registered: {ghosts}"
    )


def test_survey_s2_id_count_matches_tables():
    sec = _survey_section2()
    ids = re.findall(r"^\| (\d+[a-z]*) \|", sec, flags=re.M)
    m = re.search(r"All (\d+) ids are unique", sec)
    assert m, "SURVEY §2 header must state the id count"
    assert len(ids) == len(set(ids)), (
        f"duplicate §2 capability ids: "
        f"{sorted({i for i in ids if ids.count(i) > 1})}"
    )
    assert int(m.group(1)) == len(ids), (
        f"SURVEY §2 header claims {m.group(1)} ids but the tables hold "
        f"{len(ids)} rows — update the header with the row count"
    )
