"""Print the recommended correctness-window rotation for next round.

The driver checks only the FIRST 50 registry entries per round, so
registration order is a budget (see registry._populate and
tests/test_registry_window.py). SINCE ROUND 8 the registry applies
this rotation ITSELF at import time (registry._reorder_for_window) —
this tool remains the human-readable view of what the next window will
be once the current round's CORRECTNESS file lands. The rule:

1. never-driver-checked queries first, in current registry order
   (these are silently skipped forever if they sit past position 50);
2. then the OLDEST driver-green rows (ties broken by registry order)
   until the window is full — so no green row ages unchecked
   indefinitely.

Run: python tools/rotation.py
Output: one line per query — position, name, last-green round (or
NEVER), current registry position — for the top 50, then a summary of
green-age buckets for everything else.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_learning_practise_spark.registry import all_queries  # noqa: E402

WINDOW = 50


# Green/history semantics live in the registry since r8 (the registry
# now self-orders by this same rule at import time — see
# registry._reorder_for_window); re-exported here for inspection and
# for tests/test_analytics_extras.py::test_rotation_green_row_semantics.
from flink_learning_practise_spark.registry import (  # noqa: E402
    _row_green,
    driver_history,
)


def last_green_by_query() -> dict[str, int]:
    """Delegates to the registry's parser so the preview can never
    drift from the order the registry actually applies (a second
    parser here disagreed on edge inputs — review r8; the unused
    repo_root parameter silently ignored alternate roots — advice r8)."""
    _, last = driver_history()
    return last


def rotation_plan(
    order: list[str],
    last: dict[str, int],
    seen: set[str] | None = None,
) -> list[tuple[str, int | None]]:
    """Full registry reordered by the rotation rule, using the SAME
    three-bucket key as registry._reorder_for_window (never-checked →
    checked-but-never-green → greens ascending; advice r8 — the old
    two-bucket sort merged the first two buckets and could diverge
    from the order the registry actually applies)."""
    if seen is None:
        seen, _ = driver_history()
    pos = {n: i for i, n in enumerate(order)}

    def key(item: tuple[str, int | None]):
        n, rnd = item
        if n not in seen:
            return (0, 0, pos[n])
        if rnd is None:
            return (1, 0, pos[n])
        return (2, rnd, pos[n])

    return sorted(((n, last.get(n)) for n in order), key=key)


def main() -> None:
    seen, last = driver_history()
    order = list(all_queries())
    plan = rotation_plan(order, last, seen)
    pos = {n: i + 1 for i, n in enumerate(order)}
    print(f"# next-round window (top {WINDOW} of {len(plan)}):")
    for i, (name, rnd) in enumerate(plan[:WINDOW], 1):
        tag = f"r{rnd}" if rnd else "NEVER"
        print(f"{i:3d} {name:40s} last-green={tag:6s} now-at={pos[name]}")
    from collections import Counter

    ages = Counter(
        f"r{rnd}" if rnd else "NEVER" for _, rnd in plan[WINDOW:]
    )
    print(f"# beyond the window: {dict(sorted(ages.items()))}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `rotation.py | head` closing early is fine
        pass
