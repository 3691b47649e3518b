"""Streaming audio-duplicate monitor: the media-ingest guard.

Eighth consumer of the shared batch-addressed state layer
(streaming/state.py). q_k106 (queries/operators_reg.py) fingerprints
an audio corpus in batch — Haitsma–Kalker band-energy bits over the
real PCM decode (operators/multimodal.py) — and q_k107 audits its
economics; this monitor keeps the EXACT-duplicate slice of that
protection live over an unbounded media stream: per trigger, which
incoming clips carry a fingerprint the corpus has ALREADY ingested
under another id (re-uploads, mirror crawls, renamed assets — the
dominant media-dup mode a crawl actually sees). Near-dup mining at
Hamming > 0 stays a batch job (q_k106's banded join); the stream
guard is the audio twin of the dedup id-Bloom: cheap, exact, per
trigger.

State is ONE dir of ``(media_id, fpk, fm)`` rows — fpk the 64-bit
digest of the clip's full 256-bit fingerprint (frame words in frame
order), ``fm = pmod(fpk, FPK_MOD)`` the Hive prune key — plus a
``pairs`` dir of emitted ``(orig_id, dup_id)`` detections. The
per-trigger probe reads ONLY the ``fm=`` partitions the batch's own
fingerprints hash into (≤ FPK_MOD dirs, usually ≤ batch-distinct-fpk
— the dedup index's bounded-probe contract), so per-trigger I/O
follows the probe, not the corpus. Writes are partition-aligned
(one file per touched fm per batch — the r11 small-files rule).

Completeness (pytest-pinned, the incremental_dedup theorem shape):
every exact-dup pair (a, b) is emitted exactly once, in the trigger
where the LATER clip arrives — history×batch matches plus
within-batch matches — so the union of per-batch emissions over ANY
slicing equals the batch-mode same-fpk pair set.

Collision contract (the k90/k95 convention): two different clips
collide iff their full 256-bit fingerprints differ but the 64-bit
digest matches — expected mass C(n,2)/2⁶⁴, ~3·10⁻⁷ colliding pairs
at n = 10⁵ clips — and a collision emits one spurious dup pair, it
never drops a real one (identical audio ⇒ identical fingerprint ⇒
identical digest, no false negatives).

Replay: both writes are overwrites of this batch's own ``batch=N``
dirs and the probe excludes them by construction, so a re-delivered
trigger rewrites byte-for-byte. Compaction rewrites verbatim keeping
the ``fm`` partitioning (layout ``rows-fm``; ``maintain`` recognizes
the marker).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.multimodal import audio_fingerprint
from cdc_publisher_spark.streaming.state import (
    compact_state,
    in_stream_watermark,
    read_state,
    vacuum_state,
    write_layout_marker,
)

#: Hive fan of the fingerprint-key state dir — the probe's read is
#: bounded at this many directories per trigger. A layout constant
#: like the dedup index's BH_MOD: changing it is a compaction rewrite.
FPK_MOD = 64


def audio_fpk(
    media_df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, fpk) — one 64-bit digest of each clip's full HK
    fingerprint: frame sub-fingerprints in frame order (pinned by
    sort_array over (frame, subfp)), hashed once. The waveform stays
    inside the fingerprint pass's Arrow batch; 16 bytes per clip
    shuffle."""
    fp = audio_fingerprint(
        media_df.select(
            F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
        )
    )
    return fp.groupBy("media_id").agg(
        F.xxhash64(
            F.to_json(F.sort_array(F.collect_list(F.struct("frame", "subfp"))))
        ).alias("fpk")
    )


def _fm(col) -> F.Column:
    return F.pmod(col, F.lit(FPK_MOD)).cast("int")


def audio_dup_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    pairs_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> None:
    """foreachBatch body: fingerprint the batch once, probe the
    accumulated fpk state reading ONLY the touched ``fm=`` partitions,
    emit (orig_id, dup_id) detections — history×batch plus
    within-batch — and overwrite this batch's own state delta."""
    spark = batch_df.sparkSession
    keyed = (
        audio_fpk(batch_df, id_col, payload_col)
        .withColumn("fm", _fm(F.col("fpk")))
        .persist()
    )
    try:
        # ≤ FPK_MOD distinct values by construction — bounded collect
        fms = [r[0] for r in keyed.select("fm").distinct().collect()]
        hist = (
            read_state(
                spark,
                state_dir,
                exclude_batch=batch_id,
                part_filter=F.col("fm").isin(fms) if fms else F.lit(False),
            )
            if fms
            else None
        )
        new = keyed.select(F.col("media_id").alias("dup_id"), "fpk")
        legs = []
        if hist is not None:
            legs.append(
                hist.select(F.col("media_id").alias("orig_id"), "fpk").join(
                    new, "fpk"
                )
            )
        legs.append(  # within-batch: earlier id is the original
            keyed.select(F.col("media_id").alias("orig_id"), "fpk")
            .join(new, "fpk")
            .filter(F.col("orig_id") < F.col("dup_id"))
        )
        pairs = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
        pairs.select("orig_id", "dup_id").distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(pairs_dir, f"batch={batch_id}"))
        keyed.repartition(F.col("fm")).write.partitionBy("fm").mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch={batch_id}"))
        write_layout_marker(spark, state_dir, "rows-fm")
        write_layout_marker(spark, pairs_dir, "rows")
    finally:
        keyed.unpersist()


def read_audio_fpk_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Unified (media_id, fpk, fm) view; None when no state."""
    return read_state(spark, state_dir)


def read_audio_dups(spark: SparkSession, pairs_dir: str) -> DataFrame | None:
    """All emitted (orig_id, dup_id) detections; None when no state."""
    df = read_state(spark, pairs_dir)
    return None if df is None else df.select("orig_id", "dup_id")


def compact_audio_state(
    spark: SparkSession,
    state_dir: str,
    upto_batch: int,
    vacuum: bool = False,
) -> None:
    """Row-state compaction keeping the fm prune partitioning."""
    compact_state(spark, state_dir, upto_batch, partition_cols=("fm",))
    if vacuum:
        vacuum_state(spark, state_dir)


def stream_audio_dups(
    stream_df: DataFrame,
    state_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    compact_every: int | None = None,
    vacuum_grace: int | None = None,
):
    """Start the monitor: media in, exact-dup detections out. Offsets
    commit after both writes (commit-on-success); in-stream compaction
    folds COMMITTED batches only (state.in_stream_watermark)."""

    def body(df: DataFrame, bid: int) -> None:
        audio_dup_micro_batch(df, bid, state_dir, pairs_dir, id_col, payload_col)
        upto = in_stream_watermark(df.sparkSession, state_dir, bid, compact_every)
        if upto is not None:
            compact_audio_state(df.sparkSession, state_dir, upto_batch=upto)
            if vacuum_grace is not None:
                for d in (state_dir, pairs_dir):
                    vacuum_state(df.sparkSession, d, grace_batches=vacuum_grace)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


__all__ = [
    "FPK_MOD",
    "audio_dup_micro_batch",
    "audio_fpk",
    "compact_audio_state",
    "read_audio_dups",
    "read_audio_fpk_state",
    "stream_audio_dups",
]
