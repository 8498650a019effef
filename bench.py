"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from flink_learning_practise_spark.registry import all_queries
from flink_learning_practise_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="flp-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    qs = all_queries()
    # warm up the JVM/codegen once with the cheapest plan, and the
    # Python/Arrow worker pool once for the mapInPandas paths
    next(iter(qs.values())).fn(spark, sf_dir).limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name, q in qs.items():
        def run_once() -> float:
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            # noop sink: full evaluation of every output column (count()
            # would let Catalyst prune unconsumed projections), zero
            # driver transfer
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        # The FIRST execution pays one-time Janino/codegen compilation
        # (seconds for HOF-heavy plans) — it is a warm-up, never a
        # sample: two compile-tainted runs can otherwise agree with each
        # other and pass a stability test (round-1 q_train_val_split
        # reported 3.3s vs ~0.3s steady state). Then adaptive best-of-N
        # (2..4): sample until two agree within 50%, report the min —
        # steady-state throughput, not compiler latency or noise.
        run_once()
        samples: list[float] = []
        while True:
            samples.append(run_once())
            s = sorted(samples)
            stable = len(s) >= 2 and (s[1] - s[0]) / max(s[0], 1e-9) < 0.5
            if stable or len(s) >= 4 or s[0] < 0.3:
                break
        timings[name] = round(min(samples), 4)

    out = {
        "metric": "query_wall_time_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
