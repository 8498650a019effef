"""SF-scaling guard (VERDICT r4 ask #8): wall time across a 10x data
decade must grow sub-linearly for the headline queries — the
locally-observable signature of partition-parallel plans (a plan that
funnels through one task goes ~linear; a parallel plan at these SFs is
dominated by fixed overhead).

Runs the cheap decade (sf0.001 -> sf0.01) on every suite run; the
sf0.1 -> sf1 decade arms itself automatically when the driver ships
/root/testdata/sf1 (no skip-forever: the test names per-query outliers
when it fires).
"""

from __future__ import annotations

import os
import time

import pytest

from flink_learning_practise_spark.registry import all_queries

# Plan-diverse probes: scan-agg, multi-join, window, prefix-sum,
# shuffle-heavy dedup, graph-free text map — plus the r9 shapes that
# add new data-proportional work: the vocabulary-keyed token self-join
# (JS divergence) and the distinct-aggregate over the orders⋈lineitem
# join (reorder rate).
PROBES = (
    "q_sql_pricing_summary",
    "q_shipping_priority",
    "q_weighted_percentiles",
    "q_tumbling_window",
    "q_quality_score",
    "q_js_divergence",
    "q_reorder_rate",
)
# Sub-linear bound for a 10x decade, with generous slack for shared-box
# noise: a one-task funnel would show ~10x.
MAX_RATIO = 6.0


def _wall(spark, name, sf_dir) -> float:
    fn = all_queries()[name].fn
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def _assert_decade(spark, lo: str, hi: str) -> None:
    outliers = []
    for name in PROBES:
        a = _wall(spark, name, lo)
        b = _wall(spark, name, hi)
        if b > max(a, 0.2) * MAX_RATIO:  # 0.2s floor: don't ratio pure noise
            outliers.append(f"{name}: {a:.2f}s @ {lo} -> {b:.2f}s @ {hi}")
    assert not outliers, (
        f"10x data cost >{MAX_RATIO}x wall for: " + "; ".join(outliers)
    )


def test_scaling_decade_small(spark):
    _assert_decade(spark, "/root/testdata/sf0.001", "/root/testdata/sf0.01")


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf1"),
    reason="sf1 not shipped yet — arms automatically when it is",
)
def test_scaling_decade_large(spark):
    _assert_decade(spark, "/root/testdata/sf0.1", "/root/testdata/sf1")
