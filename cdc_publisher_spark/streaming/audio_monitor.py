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
order), ``fm = pmod(fpk, mod)`` the Hive prune key — plus a ``pairs``
dir of emitted ``(orig_id, dup_id)`` detections, NORMALIZED to
``orig_id = least(a, b)`` / ``dup_id = greatest(a, b)`` so the pair
identity is slicing-independent (ADVICE r11: the history leg used to
put the historical id first, which under out-of-id-order arrival
emitted (5,3) where batch mode said (3,5)). The per-trigger probe
reads ONLY the ``fm=`` partitions the batch's own fingerprints hash
into (≤ min(batch-distinct-fpk, mod) dirs — the dedup index's
bounded-probe contract), so per-trigger I/O follows the probe, not
the corpus. Writes are partition-aligned (one file per touched fm
per batch — the r11 small-files rule).

The fan is a LAYOUT constant carried in the dir's ``_layout.`` marker
(``rows-fm-1024``): r11 shipped a 64-way fan, under which any batch
with ≥ 64 distinct fingerprints touched every ``fm=`` dir and the
probe degenerated to a full history-state scan per trigger (VERDICT
r11 ask #5). Fresh dirs now get a 1024-way fan; dirs written under
the legacy 64-way scheme (marker ``rows-fm``, or marker-less with
``fm=`` children) KEEP it — fm values baked into history dirs were
assigned with the old modulus, so writing new batches under a
different modulus would silently miss probes — until an explicit
offline ``migrate_audio_layout`` rewrite, which re-derives fm and
REPLACES the marker.

Completeness (pytest-pinned, the incremental_dedup theorem shape):
every exact-dup pair {a, b} is emitted exactly once, in the trigger
where the LATER clip arrives — history×batch matches plus
within-batch matches — so the union of per-batch emissions over ANY
slicing equals the batch-mode same-fpk pair set in (min, max) id
order. The history leg filters ``orig_id != dup_id`` so a cross-batch
re-delivery of the same media_id (an id-contract violation upstream)
degrades to a no-op, never a spurious (X, X) self-pair (ADVICE r11).

Collision contract (the k90/k95 convention): two different clips
collide iff their full 256-bit fingerprints differ but the 64-bit
digest matches — expected mass C(n,2)/2⁶⁴, ~3·10⁻⁷ colliding pairs
at n = 10⁵ clips — and a collision emits one spurious dup pair, it
never drops a real one (identical audio ⇒ identical fingerprint ⇒
identical digest, no false negatives).

Replay: both writes are overwrites of this batch's own ``batch=N``
dirs and the probe excludes them by construction, so a re-delivered
trigger rewrites byte-for-byte. An EMPTY trigger returns before any
write (ADVICE r11: a file-less batch dir would later fail schema
inference for the whole read). Compaction rewrites verbatim keeping
the ``fm`` partitioning; ``maintain`` recognizes both markers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.multimodal import audio_fingerprint
from cdc_publisher_spark.streaming.state import (
    aligned_repartition,
    compact_state,
    in_stream_watermark,
    inner_partition_prefixes,
    read_layout_marker,
    read_state,
    replace_layout_marker,
    vacuum_state,
    write_layout_marker,
    write_manifest,
)

#: Hive fan of the fingerprint-key state dir for FRESH dirs — the
#: probe's read is bounded at min(batch-distinct-fpk, FPK_MOD)
#: directories per trigger. A layout constant like the dedup index's
#: BH_MOD, carried in the dir's marker: existing dirs keep their own
#: fan (audio_state_layout) and changing it is an explicit
#: migrate_audio_layout rewrite.
FPK_MOD = 1024

#: The r11 layout: 64-way fan under the unversioned ``rows-fm`` marker.
LEGACY_FM_LAYOUT = "rows-fm"
LEGACY_FPK_MOD = 64


def audio_state_layout(
    spark: SparkSession, state_dir: str
) -> tuple[str, int]:
    """(layout marker, fm modulus) the fpk-state WRITER must use for
    this dir. fm values in history dirs were assigned under the dir's
    own modulus, so the writer follows the dir, never the code default
    — probing mod-64 history with mod-1024 fm values would silently
    miss every cross-modulus match. Resolution: the ``_layout.``
    marker (``rows-fm-<mod>``, or the legacy unversioned ``rows-fm``
    = 64), else physical ``fm=`` children (pre-marker state only ever
    existed at 64), else the current default for a fresh dir."""
    marker = read_layout_marker(spark, state_dir)  # raises on conflict
    if marker == LEGACY_FM_LAYOUT:
        return marker, LEGACY_FPK_MOD
    if marker is not None and marker.startswith("rows-fm-"):
        return marker, int(marker.rsplit("-", 1)[1])
    if marker is not None:
        raise ValueError(
            f"{state_dir} declares layout {marker!r}, which is not an "
            "audio fpk-state layout — refusing to write into it"
        )
    if "fm" in inner_partition_prefixes(spark, state_dir):
        return LEGACY_FM_LAYOUT, LEGACY_FPK_MOD
    return f"rows-fm-{FPK_MOD}", FPK_MOD


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


def _fm(col, mod: int) -> F.Column:
    return F.pmod(col, F.lit(mod)).cast("int")


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
    emit normalized (orig_id=min, dup_id=max) detections —
    history×batch plus within-batch — and overwrite this batch's own
    state delta. Empty triggers return before any write."""
    if not batch_df.take(1):
        return  # a file-less batch dir would poison later schema reads
    spark = batch_df.sparkSession
    marker, mod = audio_state_layout(spark, state_dir)
    keyed = (
        audio_fpk(batch_df, id_col, payload_col)
        .withColumn("fm", _fm(F.col("fpk"), mod))
        .persist()
    )
    try:
        # ≤ min(batch-distinct-fpk, mod) values by construction —
        # bounded collect
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
        new = keyed.select(F.col("media_id").alias("b_id"), "fpk")
        legs = []
        if hist is not None:
            legs.append(
                hist.select(F.col("media_id").alias("a_id"), "fpk")
                .join(new, "fpk")
                # a re-delivered media_id (id-contract violation) must
                # not emit a self-pair (ADVICE r11)
                .filter(F.col("a_id") != F.col("b_id"))
            )
        legs.append(  # within-batch matches, counted once
            keyed.select(F.col("media_id").alias("a_id"), "fpk")
            .join(new, "fpk")
            .filter(F.col("a_id") < F.col("b_id"))
        )
        pairs = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
        # slicing-independent pair identity: (min, max) id order
        pairs.select(
            F.least("a_id", "b_id").alias("orig_id"),
            F.greatest("a_id", "b_id").alias("dup_id"),
        ).distinct().write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}")
        )
        aligned_repartition(keyed, "fm").write.partitionBy("fm").mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch={batch_id}"))
        write_layout_marker(spark, state_dir, marker)
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
    """Row-state compaction keeping the fm prune partitioning (and the
    dir's own fm modulus — fm values rewrite verbatim)."""
    compact_state(spark, state_dir, upto_batch, partition_cols=("fm",))
    if vacuum:
        vacuum_state(spark, state_dir)


def migrate_audio_layout(
    spark: SparkSession, state_dir: str, mod: int = FPK_MOD, vacuum: bool = True
) -> None:
    """Offline rewrite of an fpk-state dir onto a new fm modulus:
    re-derive ``fm = pmod(fpk, mod)`` for every row, fold everything
    into ``_compact/upto=max`` under the new fan, and REPLACE the
    layout marker (state.replace_layout_marker). Run with the stream
    STOPPED CLEANLY — the fold includes every on-disk batch (the
    migrate_index_layout contract)."""
    from cdc_publisher_spark.streaming.state import batch_dirs, compacted_upto

    df = read_state(spark, state_dir)
    if df is None:
        return
    upto = compacted_upto(spark, state_dir)
    marks = [k for k, _ in batch_dirs(spark, state_dir)] + (
        [upto] if upto is not None else []
    )
    m = max(marks)
    out = df.withColumn("fm", _fm(F.col("fpk"), mod))
    tmp = os.path.join(state_dir, "_compact", "_migrating")
    target = os.path.join(state_dir, "_compact", f"upto={m}")
    aligned_repartition(out, "fm").write.partitionBy("fm").mode(
        "overwrite"
    ).parquet(tmp)
    from cdc_publisher_spark.streaming.state import hadoop_fs

    fs, _ = hadoop_fs(spark, state_dir)
    jvm = spark._jvm
    jtarget = jvm.org.apache.hadoop.fs.Path(target)
    if fs.exists(jtarget):
        fs.delete(jtarget, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jtarget)
    write_manifest(spark, state_dir, m)
    replace_layout_marker(spark, state_dir, f"rows-fm-{mod}")
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
    "LEGACY_FM_LAYOUT",
    "LEGACY_FPK_MOD",
    "audio_dup_micro_batch",
    "audio_fpk",
    "audio_state_layout",
    "compact_audio_state",
    "migrate_audio_layout",
    "read_audio_dups",
    "read_audio_fpk_state",
    "stream_audio_dups",
]
