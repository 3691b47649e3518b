"""Streaming heavy-hitters monitor: incremental count-min sketch.

The streaming twin of q_k57 (queries/llm_select.py): an unbounded
stream of (group, value) rows — e.g. tokens per day, dedup keys per
source — maintains per-group count-min counter cells so "roughly how
often has this value occurred (in this window)?" is answerable at any
moment from O(groups × d × w) rows of state, never by re-scanning the
corpus. Pass an event-time bucket (day, hour) as the group column and
the monitor is a WINDOWED heavy-hitters tracker: per-window sketches
that never grow with the data inside the window.

This is the deliberately-hard test of the shared batch-addressed
state layer (streaming/state.py, VERDICT r6 ask #7): count-min's
merge is ``+`` — associative and commutative but NOT idempotent, the
opposite of the HLL monitor's max(). Replay safety therefore rests
entirely on the batch-overwrite discipline: a re-delivered batch
OVERWRITES its own ``batch=N`` delta instead of appending, so the
read-side sum counts every delta exactly once. (Max-merge state would
survive an append-by-mistake; sum-merge state would silently double —
which is why the layer's contract is overwrite, not append.)

State layout: ``state_dir/batch=N/`` parquet of (group…, r, b, cnt)
counter DELTAS — the cells of that batch alone, ≤ groups × d × w rows
regardless of batch size (the groupBy's map-side combine builds each
partition's sketch before the shuffle). The read side sum-merges
across batches. ``compact_cm_state`` pre-sums batches under the
watermark into one segment — lossless because + is the sketch's own
merge operator — so long-run state stays O(groups × d × w) however
many batches ever ran.

foreachBatch (not applyInPandasWithState): cell state is
group-global and aggregate-shaped, the SURVEY §4.3 external-state
case, same as the dedup and HLL monitors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.cm import cm_cells, cm_merge, cm_point_estimates
from cdc_publisher_spark.streaming.state import (
    compact_state,
    in_stream_watermark,
    read_state,
    vacuum_state,
    write_layout_marker,
)


def cm_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    value_col: str = "g",
    group_cols: list[str] | None = None,
) -> None:
    """foreachBatch body: write this batch's counter delta to
    ``state_dir/batch=N``. OVERWRITE is load-bearing here — sum-merge
    state is NOT idempotent, so an appended duplicate delta would
    double-count (see module docstring)."""
    cells = cm_cells(batch_df, value_col, group_cols)
    cells.write.mode("overwrite").parquet(os.path.join(state_dir, f"batch={batch_id}"))
    write_layout_marker(batch_df.sparkSession, state_dir, "sum-cnt")


def read_cm_cells(
    spark: SparkSession, state_dir: str, group_cols: list[str] | None = None
) -> DataFrame | None:
    """Sum-merged (group…, r, b, cnt) view of all deltas written so
    far; None when no state exists."""
    df = read_state(spark, state_dir)
    if df is None:
        return None
    gcols = list(group_cols or [])
    return cm_merge(df.select(*gcols, "r", "b", "cnt"), gcols)


def cm_state_estimates(
    spark: SparkSession,
    state_dir: str,
    probes: DataFrame,
    value_col: str = "g",
    group_cols: list[str] | None = None,
) -> DataFrame | None:
    """Point estimates for ``probes`` against the accumulated state:
    probe columns + ``cm_est`` (one-sided: est ≥ true count)."""
    cells = read_cm_cells(spark, state_dir, group_cols)
    if cells is None:
        return None
    return cm_point_estimates(cells, probes, value_col, group_cols)


def compact_cm_state(
    spark: SparkSession,
    state_dir: str,
    upto_batch: int,
    group_cols: list[str] | None = None,
    vacuum: bool = False,
) -> None:
    """Compact batches ≤ ``upto_batch`` into a PRE-SUMMED cell segment
    (≤ groups × d × w rows however many batches fold in), then flip
    the manifest. Vacuuming is opt-in (ADVICE r6 — see
    state.vacuum_state's concurrency contract).

    The merged rows keep a ``batch`` column pinned to ``upto_batch``
    so the generic reader's replay row-filter semantics stay intact."""
    gcols = list(group_cols or [])
    compact_state(
        spark,
        state_dir,
        upto_batch,
        merge=lambda df: cm_merge(
            df.select(*gcols, "r", "b", "cnt"), gcols
        ).withColumn("batch", F.lit(upto_batch)),
    )
    if vacuum:
        vacuum_state(spark, state_dir)


def stream_cm_heavy_hitters(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "g",
    group_cols: list[str] | None = None,
    compact_every: int | None = None,
    vacuum_grace: int | None = None,
):
    """Start the monitor: (group…, value) rows in, counter-cell state
    out. Returns the StreamingQuery; offsets commit to
    ``checkpoint_dir`` after each batch's write (commit-on-success,
    streaming/pipeline.py contract). ``compact_every=K`` pre-SUMS the
    cell state in-stream every K batches (the compacted segment stays
    ≤ groups x d x w rows however long the stream runs), optionally
    vacuuming with a ``vacuum_grace`` margin. In-stream compaction
    folds COMMITTED batches only (watermark ``bid - 1``,
    state.in_stream_watermark): the current batch's dir stays live
    until its offsets commit, so the non-idempotent sum-merge never
    bakes an uncommitted delta into the segment and a replayed
    trigger re-counts nothing."""

    def body(df: DataFrame, bid: int) -> None:
        cm_micro_batch(df, bid, state_dir, value_col, group_cols)
        upto = in_stream_watermark(df.sparkSession, state_dir, bid, compact_every)
        if upto is not None:
            compact_cm_state(spark=df.sparkSession, state_dir=state_dir,
                             upto_batch=upto, group_cols=group_cols)
            if vacuum_grace is not None:
                vacuum_state(df.sparkSession, state_dir, grace_batches=vacuum_grace)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


__all__ = [
    "cm_micro_batch",
    "cm_state_estimates",
    "compact_cm_state",
    "read_cm_cells",
    "stream_cm_heavy_hitters",
]
