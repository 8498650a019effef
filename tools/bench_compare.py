"""Diff per-query timings between BENCH_HISTORY.jsonl runs.

BENCH_HISTORY.jsonl (appended by bench.py, committed) is the
cross-round per-query record; this tool turns it into an actionable
regression report. Two modes:

* run-vs-run (``--base``/``--head``): queries slower than --threshold
  (relative) AND --min-abs (absolute seconds) between the two runs.
* min-envelope (``--envelope``, VERDICT r9 ask #1c): compare the head
  run against the PER-QUERY MIN across all prior runs. Six same-code
  r9 runs spanned 122-225 s from external load alone, so a single base
  run is itself noisy — a query is only a believable regression when
  its head time exceeds the best time the SAME code (or its ancestors)
  ever posted, not just the previous sample.

Both modes print the shared-tier build deltas and the load context
(compare ``cpu_busy_frac`` before blaming code — SURVEY §8 r9 notes).
Queries listed in a run's ``skipped`` field (consumers of a tier whose
build failed every pass) are reported as skipped, never as removed.

Run: python tools/bench_compare.py [--base -2] [--head -1]
     [--threshold 0.3] [--min-abs 0.3] [--sf 0.1] [--envelope]
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


def min_envelope(runs: list[dict]) -> dict[str, float]:
    """Per-query min across runs — the noise floor the box has proven
    reachable for each query."""
    env: dict[str, float] = {}
    for rec in runs:
        for q, v in (rec.get("queries") or {}).items():
            if q not in env or v < env[q]:
                env[q] = v
    return env


def compare(base_q: dict, head: dict, threshold: float,
            min_abs: float) -> dict:
    b, h = base_q, head["queries"]
    head_skipped = set(head.get("skipped") or [])
    slower, faster, added, removed, skipped = [], [], [], [], []
    for q in sorted(set(b) | set(h) | head_skipped):
        if q in head_skipped:
            skipped.append(q)
            continue
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
        "skipped": skipped,
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
    ap.add_argument("--envelope", action="store_true",
                    help="compare head against the per-query min across "
                         "all PRIOR runs instead of a single base run")
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
    head = runs[args.head]
    if args.envelope:
        prior = runs[: args.head if args.head >= 0 else len(runs) + args.head]
        base_q = min_envelope(prior)
        # total restricted to queries the HEAD run actually has (advice
        # r10): the union-of-all-prior-queries sum counted since-removed
        # or renamed queries and overstated the base in the header
        base_total = sum(
            v for q, v in base_q.items() if q in head["queries"]
        )
        base_label = (f"min-envelope of {len(prior)} runs "
                      f"(head-queries only)")
        base_busy = None
        tb: dict = {}
        for rec in prior:
            for t, v in (rec.get("tier_build_sec") or {}).items():
                if v is not None and (t not in tb or v < tb[t]):
                    tb[t] = v
    else:
        base = runs[args.base]
        base_q = base["queries"]
        base_total = base["total_sec"]
        base_label = "base"
        base_busy = base.get("cpu_busy_frac")
        tb = base.get("tier_build_sec") or {}
    rep = compare(base_q, head, args.threshold, args.min_abs)
    print(f"# {base_label} total {base_total:.1f}s "
          f"(busy {base_busy}), "
          f"head total {head['total_sec']:.1f}s "
          f"(busy {head.get('cpu_busy_frac')})")
    # probe-normalized totals (VERDICT r10 ask #1): bench.py scales
    # each sample by its own pass's spark-probe ratio; quote the
    # normalized head next to the raw one (and the best prior
    # normalized total when available) so a slow-box run doesn't read
    # as a code regression
    head_norm = head.get("total_norm_sec")
    head_idx = args.head if args.head >= 0 else len(runs) + args.head
    prior_norms = [r.get("total_norm_sec") for r in runs[:head_idx]
                   if r.get("total_norm_sec") is not None]
    if head_norm is not None:
        best_prior = (f", best prior norm {min(prior_norms):.1f}s"
                      if prior_norms else "")
        print(f"# probe-normalized head total {head_norm:.1f}s"
              f"{best_prior}")
    # box-speed context (r10): a slower spark/disk probe explains a
    # slower total without any plan change — check before blaming code.
    # Since r11 these are mins across the run's per-pass probe triples.
    calib = {k: head.get(k) for k in
             ("calib_py_sec", "calib_disk_sec", "calib_spark_sec")}
    if any(v is not None for v in calib.values()):
        print(f"# head box probes (min/pass): py {calib['calib_py_sec']}s "
              f"(ref ~1.07), disk {calib['calib_disk_sec']}s "
              f"(ref ~0.13), spark {calib['calib_spark_sec']}s "
              f"(ref ~1.26 in-bench, r11 256-task shuffle probe)")
        ppp = head.get("probes_per_pass")
        if ppp:
            spark_pp = [p.get("spark") for p in ppp]
            print(f"# head spark probe per pass: {spark_pp}")
    th = head.get("tier_build_sec") or {}
    for t in sorted(set(tb) | set(th)):
        print(f"# tier {t}: {tb.get(t)} -> {th.get(t)}")
    for tag in ("slower", "faster"):
        for q, vb, vh in rep[tag]:
            print(f"{tag:6s} {q:32s} {vb:7.3f} -> {vh:7.3f}")
    if rep["added"]:
        print("added:", " ".join(rep["added"]))
    if rep["removed"]:
        print("removed:", " ".join(rep["removed"]))
    if rep["skipped"]:
        print("skipped (failed tier, not removed):",
              " ".join(rep["skipped"]))
    if not any(rep.values()):
        print("# no per-query deltas above threshold")


if __name__ == "__main__":
    main()
