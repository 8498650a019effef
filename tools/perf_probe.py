"""Round-12 optimization probe: time + explain individual queries.

For each named query (or the N slowest from the last BENCH_HISTORY
line), run PASSES noop-sink passes (pass 0 discarded for codegen
warm-up) and print the min/spread; with --plans DIR also dump
``explain("formatted")`` of the query to ``DIR/<query>_<tag>.txt``.

Usage:
  python tools/perf_probe.py [--plans plans/r12 --tag before]
                             [--passes 3] [--top 25 | q_a q_b ...]

Keeps the bench methodology (warm shared tiers once per pass, noop
sink, min across passes) so numbers are comparable to bench.py's
evidence sidecar, without paying the full 249-query suite per
iteration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_learning_practise_spark.plans.llm_pipeline import (  # noqa: E402
    reset_shared_caches,
    shared_tiers,
)
from flink_learning_practise_spark.registry import all_queries  # noqa: E402
from flink_learning_practise_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: --top N)")
    ap.add_argument("--top", type=int, default=0,
                    help="probe the N slowest from the last history line")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    names = list(args.names)
    if args.top:
        hist_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_HISTORY.jsonl")
        with open(hist_path) as f:
            last = json.loads(f.readlines()[-1])
        ranked = sorted(last["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n in qs]
    if not names:
        ap.error("no queries named and --top not given")
    unknown = [n for n in names if n not in qs]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark(app_name="flp-perf-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the Arrow worker pool like bench.py does.
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.mode("overwrite").format("noop").save()

    tiers = shared_tiers()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    needed_tiers = {
        t: (b, cons) for t, (b, cons) in tiers.items()
        if any(n in cons for n in names)
    }
    samples: dict[str, list[float]] = {n: [] for n in names}
    tier_samples: dict[str, list[float]] = {t: [] for t in needed_tiers}
    for p in range(args.passes + 1):
        reset_shared_caches()
        for _t, (builder, _c) in needed_tiers.items():
            tb0 = time.perf_counter()
            builder(spark, sf_dir)
            if p > 0:
                tier_samples[_t].append(time.perf_counter() - tb0)
        for n in names:
            spark.sparkContext.setJobDescription(f"probe:{n}")
            t = run_once(n)
            spark.sparkContext.setJobDescription(None)
            if p > 0:
                samples[n].append(t)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for n in names:
            df = qs[n].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans, f"{n}_{args.tag}.txt"), "w") as f:
                f.write(txt)

    print(f"{'min':>8} {'spread':>7}  query   (passes={args.passes}, sf={sf_dir})")
    total = 0.0
    for t, s in tier_samples.items():
        mn = min(s)
        total += mn
        spread = (max(s) - mn) / max(mn, 1e-9)
        print(f"{mn:8.3f} {spread:7.2f}  [tier] {t}  {[round(x, 3) for x in s]}")
    for n in names:
        s = samples[n]
        mn = min(s)
        total += mn
        spread = (max(s) - mn) / max(mn, 1e-9)
        print(f"{mn:8.3f} {spread:7.2f}  {n}  {[round(x, 3) for x in s]}")
    print(f"{total:8.3f}          TOTAL (incl. tier builds)")
    spark.stop()


if __name__ == "__main__":
    main()
