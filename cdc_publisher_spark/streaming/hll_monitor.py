"""Streaming distinct-cardinality monitor: incremental HyperLogLog.

The streaming twin of q_k84 (queries/llm_sketch.py): an unbounded
stream of (group, value) rows — e.g. documents' shingles or dedup
keys per source — maintains per-group HLL registers so "how many
distinct values has this source ever produced?" is answerable at any
moment from O(groups x 256) rows of state, never by re-scanning the
corpus. This is the monitor a 100 TB ingest pipeline runs beside the
dedup stream: distinct-key growth per source per trigger, at sketch
cost.

Why HLL makes the streaming-state problem trivial where dedup's was
hard (streaming/incremental_dedup.py): the register merge is
``max()``, which is associative, commutative, and IDEMPOTENT. So:

- replay safety needs nothing beyond the batch-addressed overwrite:
  a re-delivered batch rewrites ``batch=N`` byte-for-byte, and even
  if it didn't, max-merging the same registers twice is a no-op;
- cross-batch duplicate VALUES are harmless by construction — the
  same value always lands on the same (bucket, rho), so there is no
  analogue of dedup's cross-batch doc_id contract at all;
- reads never need exclude_batch gymnastics: the estimate is the max
  over whatever register rows exist.

State layout: ``state_dir/batch=N/`` parquet of (group, bucket, M)
register DELTAS — the registers of that batch alone, <= groups x 256
rows regardless of batch size. The read side max-merges across
batches. Compaction reuses the generic batch-addressed layer
(streaming/state.py — manifest-marker flip, crash-safe); a compacted
segment is just the merged register rows under the watermark, which
``compact_hll_state`` pre-merges so the long-run state stays
O(groups x 256) no matter how many batches ever ran.

foreachBatch (not applyInPandasWithState): register state is
group-global and aggregate-shaped, the SURVEY §4.3 external-state
case, same as the dedup and CDC appliers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.hll import hll_estimate, hll_merge, hll_registers

# The generic batch-addressed state layer: manifest compaction, FS
# helpers (streaming/state.py — shared with the dedup stream, the CM
# monitor, and the CLI compaction subcommands).
from cdc_publisher_spark.streaming.state import (
    compact_state,
    in_stream_watermark,
    read_state,
    vacuum_state,
    write_layout_marker,
)


def hll_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    group_col: str = "source",
    value_col: str = "s",
) -> None:
    """foreachBatch body: write this batch's register delta to
    ``state_dir/batch=N`` (overwrite — replay-idempotent, and max()
    would absorb a duplicate merge anyway)."""
    regs = hll_registers(batch_df, [group_col], value_col)
    regs.write.mode("overwrite").parquet(os.path.join(state_dir, f"batch={batch_id}"))
    write_layout_marker(batch_df.sparkSession, state_dir, "max-M")


def read_hll_registers(
    spark: SparkSession, state_dir: str, group_col: str = "source"
) -> DataFrame | None:
    """Merged (group, bucket, M) view of all state written so far;
    None when no state exists."""
    df = read_state(spark, state_dir)
    if df is None:
        return None
    return hll_merge(df.select(group_col, "bucket", "M"), [group_col])


def hll_state_estimate(
    spark: SparkSession, state_dir: str, group_col: str = "source"
) -> DataFrame | None:
    """Per-group distinct-count estimates from the accumulated state:
    (group, n_zero_registers, harmonic_z, hll_estimate)."""
    regs = read_hll_registers(spark, state_dir, group_col)
    if regs is None:
        return None
    return hll_estimate(regs, [group_col])


def compact_hll_state(
    spark: SparkSession,
    state_dir: str,
    upto_batch: int,
    group_col: str = "source",
    vacuum: bool = False,
) -> None:
    """Compact batches <= ``upto_batch`` into a PRE-MERGED register
    segment (max per (group, bucket) — at most groups x 256 rows,
    however many batches are folded in), then flip the manifest.
    Unlike the dedup dirs, merging during compaction is lossless
    because max() is the state's own merge operator. Vacuuming is
    opt-in (ADVICE r6 — see state.vacuum_state's concurrency contract).

    The merged rows keep a ``batch`` column pinned to ``upto_batch``
    so the generic reader's replay row-filter semantics stay intact."""
    compact_state(
        spark,
        state_dir,
        upto_batch,
        merge=lambda df: hll_merge(
            df.select(group_col, "bucket", "M"), [group_col]
        ).withColumn("batch", F.lit(upto_batch)),
    )
    if vacuum:
        vacuum_state(spark, state_dir)


def stream_hll_distinct(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str = "source",
    value_col: str = "s",
    compact_every: int | None = None,
    vacuum_grace: int | None = None,
):
    """Start the monitor: (group, value) rows in, register state out.
    Returns the StreamingQuery; offsets commit to ``checkpoint_dir``
    after each batch's write (commit-on-success, streaming/pipeline.py
    contract). ``compact_every=K`` pre-merges the register state
    in-stream every K batches (max() is the state's own merge — the
    compacted segment is ≤ groups x 256 rows however long the stream
    runs), optionally vacuuming superseded dirs with a
    ``vacuum_grace`` margin for external readers. Runs after the
    batch's write, before the checkpoint commit, folding COMMITTED
    batches only (watermark ``bid - 1``, state.in_stream_watermark):
    the current batch's dir stays live until its offsets commit, so a
    crash-then-replay sees exactly the pre-batch compacted state."""

    def body(df: DataFrame, bid: int) -> None:
        hll_micro_batch(df, bid, state_dir, group_col, value_col)
        upto = in_stream_watermark(df.sparkSession, state_dir, bid, compact_every)
        if upto is not None:
            compact_hll_state(spark=df.sparkSession, state_dir=state_dir,
                              upto_batch=upto, group_col=group_col)
            if vacuum_grace is not None:
                vacuum_state(df.sparkSession, state_dir, grace_batches=vacuum_grace)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


__all__ = [
    "compact_hll_state",
    "compact_state",
    "hll_micro_batch",
    "hll_state_estimate",
    "read_hll_registers",
    "stream_hll_distinct",
]
