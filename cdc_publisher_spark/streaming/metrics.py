"""M1 — observability (SURVEY.md §2.1 M1, §6).

The reference meters dequeues, enqueues (count + latency) and gauges
live routes, reported every 10 s (main.clj:45-53). Spark equivalents:

- per-batch counters ride the DataFrame itself via ``observe`` —
  zero-cost accumulators evaluated inside the existing plan;
- a ``StreamingQueryListener`` turns each progress event into the
  reference's metric names, including rows/s (enqueue rate) and batch
  duration (enqueue latency, amortized per micro-batch);
- the route gauge comes from RouteRegistry.live_count;
- :class:`MetricsReporter` publishes the listener's snapshot on the
  reference's 10 s cadence to a pluggable sink (the reference wires a
  Kafka metrics reporter at main.clj:45-53; here the sink is any
  callable — a Kafka producer send where a broker exists, a JSONL
  appender in this sandbox).
"""

from __future__ import annotations

import json
import threading
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "cdc_metrics"

#: The reference reports its metrics registry every 10 s (main.clj:53).
DEFAULT_REPORT_PERIOD_S = 10.0


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
            # replace-on-write, never mutate in place: MetricsReporter
            # snapshots these dicts from another thread, and replacing
            # the inner dict atomically means a concurrent reader sees
            # either the old totals or the new — never a torn mix or a
            # dict-changed-size-during-iteration error
            old = self.totals.get(str(name), {})
            self.totals[str(name)] = {
                **old,
                **{
                    k: old.get(k, 0) + v
                    for k, v in observed.items()
                    if isinstance(v, int)
                },
            }

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


class MetricsReporter:
    """Periodic metrics publisher — the Spark twin of the reference's
    ``init-metrics!`` (main.clj:45-53: metrics registry -> Kafka topic
    via a reporter started with period 10 s).

    Driver-side by design: the metric REGISTRY is driver state (listener
    snapshots + gauges), so publishing it is a single tiny record per
    period regardless of cluster size — nothing here touches executors.

    ``publish`` is any callable taking the serialized JSON line; wire it
    to a KafkaProducer send where a broker exists, or a file appender /
    log emitter otherwise. ``gauges`` are zero-arg callables sampled at
    publish time (e.g. RouteRegistry.live_count — the reference's
    live-routes gauge).
    """

    def __init__(
        self,
        listener: CdcMetricsListener,
        publish: Callable[[str], None],
        period_s: float = DEFAULT_REPORT_PERIOD_S,
        gauges: dict[str, Callable[[], Any]] | None = None,
    ) -> None:
        self._listener = listener
        self._publish = publish
        self._period = period_s
        self._gauges = gauges or {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def snapshot(self) -> dict[str, Any]:
        """One reportable snapshot: per-query latest + running totals +
        sampled gauges. Public so tests (and one-shot CLI callers) can
        publish without the timer thread.

        Inner dicts are copied too: the listener replaces (never
        mutates) them, so copying the outer-dict values here yields a
        consistent snapshot without a lock. The outer dicts are
        list()-snapshotted first: the listener-bus thread may INSERT a
        new query name mid-iteration, and a resize during items() would
        raise RuntimeError."""
        return {
            "latest": {k: dict(v) for k, v in list(self._listener.latest.items())},
            "totals": {k: dict(v) for k, v in list(self._listener.totals.items())},
            "gauges": {name: g() for name, g in self._gauges.items()},
        }

    def publish_once(self) -> str:
        line = json.dumps(self.snapshot(), sort_keys=True, default=str)
        self._publish(line)
        return line

    def start(self) -> "MetricsReporter":
        if self._thread is not None:
            # a stop() against a wedged publish sink leaves the handle
            # set so a retried stop() can re-join; once that old loop
            # HAS exited (stop flag was set), the reporter must be
            # restartable — only a still-live loop blocks start()
            if self._thread.is_alive():
                raise RuntimeError("reporter already started")
            self._thread.join(timeout=0)
            self._thread = None
        self._stop.clear()  # allow stop() -> start() restart cycles

        def loop() -> None:
            # publish-then-wait mirrors the reference reporter, which
            # emits an initial report at startup and then every period
            while not self._stop.is_set():
                try:
                    self.publish_once()
                except Exception:
                    # a failed publish must never kill the pipeline; the
                    # next period retries (reference: reporter errors are
                    # logged, the publisher keeps running)
                    pass
                self._stop.wait(self._period)

        self._thread = threading.Thread(
            target=loop, name="cdc-metrics-reporter", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            if self._thread.is_alive():  # publish sink wedged: keep the
                return  # handle so a retried stop() can re-join
            self._thread = None

    def __enter__(self) -> "MetricsReporter":
        return self.start()

    def __exit__(self, *exc: object) -> None:
        self.stop()
