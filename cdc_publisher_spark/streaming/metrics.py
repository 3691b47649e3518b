"""M1 — observability (SURVEY.md §2.1 M1, §6).

The reference meters dequeues, enqueues (count + latency) and gauges
live routes, reported every 10 s (main.clj:45-53). Spark equivalents:

- per-batch counters ride the DataFrame itself via ``observe`` —
  zero-cost accumulators evaluated inside the existing plan;
- a ``StreamingQueryListener`` turns each progress event into the
  reference's metric names, including rows/s (enqueue rate) and batch
  duration (enqueue latency, amortized per micro-batch);
- the route gauge comes from RouteRegistry.live_count.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "cdc_metrics"


def with_wire_metrics(wire_df: DataFrame) -> DataFrame:
    """Attach the reference's counters to a wire-record DataFrame:
    dequeue-count (rows in), enqueue-count (rows with a key — the
    good path), malformed-count (dead letters)."""
    return wire_df.observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias("dequeue_count"),
        F.count(F.col("key")).alias("enqueue_count"),
        F.sum(F.when(F.col("key").isNull(), 1).otherwise(0)).alias("malformed_count"),
    )


class CdcMetricsListener(StreamingQueryListener):
    """Collects the latest per-query metrics in the reference's shape:
    {query: {dequeue_count, enqueue_count, malformed_count,
    enqueue_rows_per_sec, batch_duration_ms}}."""

    def __init__(self) -> None:
        self.latest: dict[str, dict[str, Any]] = {}
        self.totals: dict[str, dict[str, int]] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        observed = dict(p.observedMetrics.get(OBSERVATION_NAME).asDict()) if (
            p.observedMetrics and OBSERVATION_NAME in p.observedMetrics
        ) else {}
        snapshot = {
            **observed,
            "enqueue_rows_per_sec": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "batch_id": p.batchId,
        }
        self.latest[str(name)] = snapshot
        if observed:
            tot = self.totals.setdefault(str(name), {})
            for k, v in observed.items():
                if isinstance(v, int):
                    tot[k] = tot.get(k, 0) + v

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
