"""Pipeline metrics & monitoring — the Spark analog of the reference's
Flink Metrics API usage and the stage2 real-time dashboard scaffold
(ref stage2_window_statistics/real_time_dashboard.py, flink_typora.md
metrics section: counters/meters/gauges on operators).

Spark-first mapping, no custom accumulators in the data path:

- Flink operator counters/meters  →  ``df.observe`` /
  :class:`pyspark.sql.Observation`: metrics are computed INSIDE the
  job as it runs (one pass, no second action), collected on the driver
  after the action. Works for any batch plan.
- Flink's metric reporters / dashboard feed  →
  :class:`MetricsListener`, a ``StreamingQueryListener`` capturing
  per-micro-batch progress: input rates, processing rates, state-store
  rows, watermark, and any ``observe`` metrics attached to the stream.
- Flink's web UI numbers (records in/out per operator) are already
  native in the Spark UI/REST; the listener exposes the subset a
  dashboard would poll, as plain dicts.
"""

from __future__ import annotations

import threading
from collections import defaultdict, deque
from typing import Any

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener


def observe_batch(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named in-job metrics to a batch plan (Flink counter/meter
    analog). Returns (instrumented df, observation); read
    ``observation.get`` AFTER the first action on the df — the metrics
    ride the job itself (single pass, computed where the data lives),
    not a separate aggregation query."""
    obs = Observation(name)
    return df.observe(obs, *[c.alias(a) for a, c in metrics.items()]), obs


def observe_stream(df: DataFrame, name: str, metrics: dict[str, Column]) -> DataFrame:
    """Attach named in-job metrics to a STREAMING plan; values surface
    per micro-batch in progress events (collect them with
    :class:`MetricsListener` — streams can't use Observation.get)."""
    return df.observe(name, *[c.alias(a) for a, c in metrics.items()])


class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress for every running streaming query —
    the polling surface a dashboard would hit.

    Thread-safe; progress events arrive on the listener bus thread.
    Register with ``spark.streams.addListener(listener)``.

    History is bounded (``max_batches`` per query, default 1000): a
    1s-trigger query emits ~86k progress rows/day, so unbounded history
    is a driver leak on exactly the long-running streams this targets.
    ``totals`` stays lifetime-accurate via running aggregates that
    survive eviction.
    """

    def __init__(self, max_batches: int = 1000) -> None:
        self._lock = threading.Lock()
        self._max = max_batches
        self._progress: dict[str, deque[dict[str, Any]]] = defaultdict(
            lambda: deque(maxlen=max_batches)
        )
        self._totals: dict[str, dict[str, Any]] = defaultdict(
            lambda: {"batches": 0, "rows_in": 0, "max_state_rows": 0}
        )
        self._status: dict[str, str] = {}
        # QueryTerminatedEvent carries only the id; remember id -> name
        # so a named query's status actually transitions on termination.
        self._names: dict[str, str] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._names[str(event.id)] = event.name or str(event.id)
            self._status[event.name or str(event.id)] = "RUNNING"

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "observed_metrics": {
                name: om.asDict()  # values arrive as a Row per observe()
                for name, om in (p.observedMetrics or {}).items()
            },
            "state_rows_total": sum(
                s.numRowsTotal for s in (p.stateOperators or [])
            ),
            "watermark": (p.eventTime or {}).get("watermark"),
        }
        with self._lock:
            key = p.name or str(p.id)
            self._progress[key].append(row)
            t = self._totals[key]
            t["batches"] += 1
            t["rows_in"] += row["num_input_rows"]
            t["max_state_rows"] = max(t["max_state_rows"], row["state_rows_total"])

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            key = self._names.pop(str(event.id), str(event.id))
            self._status[key] = (
                f"FAILED: {event.exception}" if event.exception else "TERMINATED"
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    # -- dashboard-facing reads ---------------------------------------------
    def history(self, query_name: str) -> list[dict[str, Any]]:
        with self._lock:
            return list(self._progress.get(query_name, []))

    def latest(self, query_name: str) -> dict[str, Any] | None:
        h = self.history(query_name)
        return h[-1] if h else None

    def totals(self, query_name: str) -> dict[str, Any]:
        """Lifetime aggregates — what a dashboard's headline tiles show.
        Running sums, unaffected by history eviction."""
        with self._lock:
            return dict(self._totals[query_name])

    def status(self, query_name: str) -> str | None:
        """Lifecycle state: RUNNING / TERMINATED / FAILED: <cause>."""
        with self._lock:
            return self._status.get(query_name)


def spark_ui_rest_url(spark: SparkSession) -> str | None:
    """Base URL of the Spark UI REST API (/api/v1/...) — the metrics
    firehose the reference's dashboard would scrape in a Spark world."""
    web_url = spark.sparkContext.uiWebUrl
    return f"{web_url}/api/v1" if web_url else None
