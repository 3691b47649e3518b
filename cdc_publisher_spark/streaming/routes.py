"""D1 — dynamic fan-out control loop (SURVEY.md §3.2, §4.3 item 1).

The reference's ``queue-enabler`` go-loop installs a JMS consumer per
newly-active queue and tears down removed ones, with the registry in
an atom and a gauge of live routes (jms_publisher.clj:204-232). In
Spark, per-row ``topic`` routing removes the need for per-queue
*sinks*; what remains genuinely dynamic is which *sources/tables* are
ingested. That is a driver-side concern: a foreachBatch control loop
over the latest-CCD state stream diffs active queues against a
registry and invokes add/remove callbacks (e.g. start or stop a
per-table ingest query). Plain Python by design — this is the one
imperative part of the reference that stays imperative (SURVEY.md §4.3).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RouteRegistry:
    """Thread-safe live-route registry (the reference's ``queues`` atom
    + gauge, jms_publisher.clj:22-23,213)."""

    on_add: Callable[[str], object] | None = None
    on_remove: Callable[[str, object], None] | None = None
    _routes: dict[str, object] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def sync(self, active: set[str]) -> tuple[list[str], list[str]]:
        """Diff the desired active set against live routes; invoke
        callbacks for each add/remove. Returns (added, removed)."""
        with self._lock:
            added = sorted(active - self._routes.keys())
            removed = sorted(self._routes.keys() - active)
            for q in added:
                handle = self.on_add(q) if self.on_add else None
                self._routes[q] = handle
            for q in removed:
                handle = self._routes.pop(q)
                if self.on_remove:
                    self.on_remove(q, handle)
        return added, removed

    @property
    def live_count(self) -> int:  # the gauge
        with self._lock:
            return len(self._routes)

    def routes(self) -> dict[str, object]:
        with self._lock:
            return dict(self._routes)


def route_control_batch(
    registry: RouteRegistry,
    status_col: str = "status",
    queue_col: str = "queue",
    active_value: str = "active",
    seq_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: filter the batch's latest CCD states to
    active, project queue names (F1+P1), sync the registry.

    Note the batch carries state *transitions* (update-mode output of
    stream_latest_per_key); the registry keeps routes whose keys don't
    appear in a batch, and drops a route only when its key transitions
    to a non-active status — so we sync adds from this batch and
    removes only for keys seen in this batch.

    ``seq_col`` orders transitions within a batch (offset/timestamp):
    the latest status per queue wins deterministically. Without it the
    upstream must emit at most one row per queue per batch (the
    update-mode contract of stream_latest_per_key); that precondition
    is asserted, not silently resolved with an arbitrary row.
    """

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if seq_col is not None:
            latest = batch_df.groupBy(queue_col).agg(
                F.max_by(status_col, F.col(seq_col)).alias(status_col)
            )
        else:
            latest = batch_df.groupBy(queue_col).agg(
                F.max_by(status_col, F.lit(1)).alias(status_col),
                F.count("*").alias("_n"),
            )
        rows = latest.collect()
        if seq_col is None:
            dupes = [r[queue_col] for r in rows if r["_n"] > 1]
            if dupes:
                raise ValueError(
                    "route_control_batch: multiple transitions per queue in one "
                    f"batch for {dupes!r} but no seq_col to order them — pass "
                    "seq_col (offset/timestamp) or emit one row per key per batch"
                )
        seen = {r[queue_col] for r in rows}
        now_active = {r[queue_col] for r in rows if r[status_col] == active_value}
        current = set(registry.routes().keys())
        desired = (current - seen) | now_active
        registry.sync(desired)

    return body
