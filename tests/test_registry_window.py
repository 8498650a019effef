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
