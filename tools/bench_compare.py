"""Diff per-query timings between two BENCH_HISTORY.jsonl runs.

BENCH_HISTORY.jsonl (appended by bench.py, committed) is the
cross-round per-query record; this tool turns it into an actionable
regression report: queries slower than --threshold (relative) AND
--min-abs (absolute seconds) between the two selected runs, plus the
shared-tier build deltas and the load context of both runs (compare
`cpu_busy_frac` before blaming code — see SURVEY §8 r9 notes).

Run: python tools/bench_compare.py [--base -2] [--head -1]
     [--threshold 0.3] [--min-abs 0.3] [--sf 0.1]
Exit code 0 always (reporting, not gating) — the parity suite is the
gate; perf regressions need a human (or a verdict) in the loop.
"""

from __future__ import annotations

import argparse
import json
import os


def load_runs(path: str, sf: float | None) -> list[dict]:
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if sf is None or rec.get("sf") == sf:
                runs.append(rec)
    return runs


def compare(base: dict, head: dict, threshold: float, min_abs: float) -> dict:
    b, h = base["queries"], head["queries"]
    slower, faster, added, removed = [], [], [], []
    for q in sorted(set(b) | set(h)):
        if q not in b:
            added.append(q)
            continue
        if q not in h:
            removed.append(q)
            continue
        d = h[q] - b[q]
        if d >= min_abs and b[q] > 0 and d / b[q] >= threshold:
            slower.append((q, b[q], h[q]))
        elif -d >= min_abs and b[q] > 0 and -d / b[q] >= threshold:
            faster.append((q, b[q], h[q]))
    return {
        "slower": slower,
        "faster": faster,
        "added": added,
        "removed": removed,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=-2,
                    help="run index into the (sf-filtered) history")
    ap.add_argument("--head", type=int, default=-1)
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="relative slowdown to report")
    ap.add_argument("--min-abs", type=float, default=0.3,
                    help="absolute slowdown floor in seconds")
    ap.add_argument("--sf", type=float, default=0.1)
    args = ap.parse_args()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_HISTORY.jsonl",
    )
    runs = load_runs(path, args.sf)
    if len(runs) < 2:
        print(f"# need >=2 sf={args.sf} runs in BENCH_HISTORY.jsonl "
              f"(have {len(runs)})")
        return
    base, head = runs[args.base], runs[args.head]
    rep = compare(base, head, args.threshold, args.min_abs)
    print(f"# base total {base['total_sec']:.1f}s "
          f"(busy {base.get('cpu_busy_frac')}), "
          f"head total {head['total_sec']:.1f}s "
          f"(busy {head.get('cpu_busy_frac')})")
    tb, th = base.get("tier_build_sec") or {}, head.get("tier_build_sec") or {}
    for t in sorted(set(tb) | set(th)):
        print(f"# tier {t}: {tb.get(t)} -> {th.get(t)}")
    for tag in ("slower", "faster"):
        for q, vb, vh in rep[tag]:
            print(f"{tag:6s} {q:32s} {vb:7.3f} -> {vh:7.3f}")
    if rep["added"]:
        print("added:", " ".join(rep["added"]))
    if rep["removed"]:
        print("removed:", " ".join(rep["removed"]))
    if not any(rep.values()):
        print("# no per-query deltas above threshold")


if __name__ == "__main__":
    main()
