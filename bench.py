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
        # Adaptive best-of-N (2..4): the first execution pays one-time
        # Janino codegen compilation (seconds for HOF-heavy plans), and
        # transient machine interference can spike any single run — keep
        # sampling until two samples agree within 50%, report the min:
        # steady-state throughput, not compiler latency or noise.
        samples: list[float] = []
        while True:
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            # noop sink: full evaluation of every output column (count()
            # would let Catalyst prune unconsumed projections), zero
            # driver transfer
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
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
