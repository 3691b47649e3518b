"""Streaming incremental embedding near-dup: the ninth state consumer
(VERDICT r11 ask #4).

The shingle space has an incremental production path (the q_k79 probe
over the persisted LSH index, streaming/incremental_dedup.py) and the
audio space has the exact-dup guard (streaming/audio_monitor.py); this
monitor closes the embedding space: per trigger, which incoming
vectors are near-duplicates (cosine ≥ threshold) of anything already
ingested. Batch twins q_k21/q_k35 mine the full corpus; a real ingest
pipeline dedups NEW vectors against history incrementally — candidate
cost O(batch × collisions) per trigger, history-vs-history pairs never
recomputed.

Signatures are the banded random-sign scheme from
operators/embed_lsh.py — the same rows the oracle-audited batch twin
(q_k109) rides, so the streamed index is probe-compatible with the
audited semantics. State rides streaming/state.py:

- ``idx_dir/batch=N/ebm=M/`` — (id, band, bh) signature bucket rows,
  Hive-partitioned by ``ebm = pmod(xxhash64(band, bh), EB_MOD)``. The
  scheme's bands·2^bits cells hash onto EB_MOD = 256 directories, so
  the probe reads only the dirs the batch's own signatures touch —
  ≤ min(batch·bands, 256) per trigger however much history exists.
  Writes are partition-aligned (one file per touched ebm per batch —
  the r11 small-files rule).
- ``vecs_dir/batch=N/vh=D/`` — accumulated vectors, partitioned by
  ``vh = pmod(xxhash64(id), VEC_MOD)``. The exact cosine verify
  re-reads vectors ONLY for candidate-touching ids: candidates
  materialize first, their ≤ VEC_MOD distinct vh values collect
  (bounded by the LAYOUT), and the vector read prunes to those dirs —
  the dedup corpus-dir contract.
- ``pairs_dir/batch=N/`` — (i, j, cosine) detections, NORMALIZED to
  ``i = least, j = greatest`` (the audio-guard ADVICE r11 lesson:
  pair identity must be slicing-independent).

Completeness (pytest-pinned, the incremental_dedup theorem shape):
every near-dup pair {a, b} of the BANDED-NOMINATE + EXACT-VERIFY
semantics is emitted exactly once, in the trigger where the LATER
vector arrives — history×batch matches plus within-batch matches — so
the union of per-batch emissions over ANY slicing equals the batch
twin ``embedding_neardup_banded(corpus, threshold)`` pair set. The
history leg filters ``a != b`` so a cross-batch re-delivery of the
same id (an upstream id-contract violation) degrades to a no-op.

Scheme constants (bands, bits, RH_SCALE — hence the signature values)
and EB_MOD/VEC_MOD are LAYOUT constants of the persisted index:
changing them makes history unprobeable, so a change is a state
rebuild, exactly like BH_MOD.

Replay: every write overwrites this batch's own ``batch=N`` dirs and
the probe excludes them by construction; an EMPTY trigger returns
before any write (the audio-guard ADVICE r11 fix, applied from birth).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.vectors import cosine_with_norms, l2_norm
from cdc_publisher_spark.operators.embed_lsh import RH_BANDS, RH_BITS, rh_band_rows
from cdc_publisher_spark.streaming.state import (
    aligned_repartition,
    batch_dirs,
    compact_state,
    compacted_upto,
    hadoop_fs,
    in_stream_watermark,
    read_layout_marker,
    read_state,
    replace_layout_marker,
    vacuum_state,
    write_layout_marker,
    write_manifest,
)

#: Hive fans (layout constants — see module docstring). The scheme's
#: bands·2^bits = 2048 possible (band, bh) cells hash 8-to-1 onto
#: EB_MOD = 256 directories — cell-exact pruning would mean up to
#: 2048 tiny files per batch (the small-files failure the audio
#: guard's fan sizing balances against); at 8 cells/dir the probe
#: still reads ≤ min(touched cells, 256) dirs per trigger.
EB_MOD = 256
VEC_MOD = 64

#: Production default: re-upload / mirror-crawl territory. The suite
#: and the fixture-facing tests run at the q_k21 audit threshold 0.42
#: (random synthetic embeddings have no true near-dups).
EMBED_COS_THRESHOLD = 0.9


def _ebm(band, bh) -> F.Column:
    return F.pmod(F.xxhash64(band, bh), F.lit(EB_MOD)).cast("int")


#: Pre-versioning marker. Dirs written before schemes were versioned
#: carry bare ``rows-ebm`` and were only ever written by the 8x8
#: scheme; read-side it is treated as exactly ``rows-ebm-8x8``.
#: Write-side it is NEVER produced anymore (r14 ADVICE: mapping the
#: code default (RH_BANDS, RH_BITS) to the bare marker meant a
#: deployment that changed the CONSTANTS — rather than passing
#: bands/bits — left both the old index and the new consumer at
#: ``rows-ebm``, reproducing the silent match-nothing mismatch the
#: marker exists to catch).
LEGACY_EBM_MARKER = "rows-ebm"
_LEGACY_EBM_SCHEME = (8, 8)

#: Transitional marker held by ``migrate_embed_layout`` while the
#: segment swap + manifest flip are in flight: an interrupted
#: migration leaves it behind, so EVERY consumer scheme mismatches
#: loudly on restart (recovery: re-run the migration — it is
#: idempotent) instead of an old-scheme consumer passing the marker
#: check against half-migrated data (r14 ADVICE).
EBM_MIGRATING_MARKER = "rows-ebm-migrating"


def scheme_layout(bands: int, bits: int) -> str:
    """The signature index's ``_layout.`` marker name for a banding
    scheme: ALWAYS versioned, ``rows-ebm-<bands>x<bits>`` — the
    rows-fm-1024 precedent: the layout constant rides the marker NAME,
    so probing a 12-bit index with 8-bit signatures fails loudly at
    the next trigger instead of silently matching nothing. The bare
    pre-versioning marker is accepted read-side only
    (``normalize_ebm_marker``)."""
    return f"rows-ebm-{bands}x{bits}"


def normalize_ebm_marker(marker: str | None) -> str | None:
    """Read-side marker normalization: bare pre-versioning
    ``rows-ebm`` means the 8x8 scheme (the only scheme that ever
    wrote it); everything else is already versioned."""
    if marker == LEGACY_EBM_MARKER:
        return scheme_layout(*_LEGACY_EBM_SCHEME)
    return marker


def _vh(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(VEC_MOD)).cast("int")


def embed_dup_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    idx_dir: str,
    vecs_dir: str,
    pairs_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = EMBED_COS_THRESHOLD,
    bands: int = RH_BANDS,
    bits: int = RH_BITS,
) -> None:
    """foreachBatch body: sign the batch once, probe the persisted
    signature index reading ONLY the touched ``ebm=`` cells,
    exact-verify cosine reading ONLY the candidate ids' ``vh=`` vector
    partitions, emit normalized (i, j, cosine) detections, and
    overwrite this batch's own state deltas.

    ``bands``/``bits`` must match the persisted index's scheme (the
    ``scheme_layout`` marker enforces it): change the banding via
    ``migrate_embed_layout``, never by just passing different values —
    signatures under two schemes never collide, so a mismatch would
    silently detect nothing."""
    if not batch_df.take(1):
        return  # file-less batch dirs poison later schema inference
    spark = batch_df.sparkSession
    layout = scheme_layout(bands, bits)
    marker = read_layout_marker(spark, idx_dir)  # raises on conflict
    if marker == EBM_MIGRATING_MARKER:
        raise ValueError(
            f"{idx_dir} holds an INTERRUPTED scheme migration (marker "
            f"{marker!r}): the segment swap / manifest flip did not "
            "complete — re-run migrate_embed_layout(spark, idx_dir, "
            "vecs_dir, bands=..., bits=...) with the stream stopped "
            "(it is idempotent), then restart"
        )
    if marker is not None and normalize_ebm_marker(marker) != layout:
        raise ValueError(
            f"{idx_dir} holds a {marker!r} signature index but this "
            f"consumer signs at {layout!r} — run migrate_embed_layout"
            "(spark, idx_dir, vecs_dir, bands=..., bits=...) with the "
            "stream stopped, then restart with the new scheme"
        )
    base = (
        batch_df.select(id_col, vec_col).dropDuplicates([id_col]).persist()
    )
    try:
        sig = (
            rh_band_rows(base, id_col, vec_col, bands=bands, bits=bits)
            .withColumn("ebm", _ebm(F.col("band"), F.col("bh")))
            .persist()
        )
        try:
            # ≤ EB_MOD distinct values by construction — bounded collect
            ebms = [r[0] for r in sig.select("ebm").distinct().collect()]
            hist_idx = read_state(
                spark,
                idx_dir,
                exclude_batch=batch_id,
                part_filter=F.col("ebm").isin(ebms),
            )
            probe = sig.select(F.col(id_col).alias("_b"), "band", "bh")
            legs = []
            if hist_idx is not None:
                legs.append(
                    hist_idx.select(F.col(id_col).alias("_a"), "band", "bh")
                    .join(probe, ["band", "bh"])
                    # redelivered id (contract violation) -> no-op,
                    # never a self-pair
                    .filter(F.col("_a") != F.col("_b"))
                )
            legs.append(  # within-batch matches, counted once
                sig.select(F.col(id_col).alias("_a"), "band", "bh")
                .join(probe, ["band", "bh"])
                .filter(F.col("_a") < F.col("_b"))
            )
            raw = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
            cand = (
                raw.select(
                    F.least("_a", "_b").alias("i"),
                    F.greatest("_a", "_b").alias("j"),
                )
                .distinct()
                .persist()
            )
            try:
                # candidate ids' vh values: ≤ VEC_MOD distinct by
                # construction — bounded collect
                vhs = [
                    r[0]
                    for r in cand.select(F.explode(F.array("i", "j")).alias("_i"))
                    .select(_vh("_i").alias("_v"))
                    .distinct()
                    .collect()
                ]
                hist_vecs = (
                    read_state(
                        spark,
                        vecs_dir,
                        exclude_batch=batch_id,
                        part_filter=F.col("vh").isin(vhs) if vhs else F.lit(False),
                    )
                    if vhs
                    else None
                )
                vecs = base
                if hist_vecs is not None:
                    vecs = hist_vecs.select(id_col, vec_col).unionByName(base)
                v = vecs.select(
                    F.col(id_col).alias("_vid"),
                    F.col(vec_col).alias("_v"),
                    l2_norm(F.col(vec_col)).alias("_n"),
                )
                pairs = (
                    cand.join(
                        v.select(
                            F.col("_vid").alias("i"),
                            F.col("_v").alias("_va"),
                            F.col("_n").alias("_na"),
                        ),
                        "i",
                    )
                    .join(
                        v.select(
                            F.col("_vid").alias("j"),
                            F.col("_v").alias("_vb"),
                            F.col("_n").alias("_nb"),
                        ),
                        "j",
                    )
                    .select(
                        "i",
                        "j",
                        cosine_with_norms(
                            F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
                        ).alias("_cos"),
                    )
                    .filter(F.col("_cos") >= threshold)
                    .select("i", "j", F.round("_cos", 4).alias("cosine"))
                )
                pairs.write.mode("overwrite").parquet(
                    os.path.join(pairs_dir, f"batch={batch_id}")
                )
            finally:
                cand.unpersist()
            # partition-ALIGNED deltas (the r11 small-files rule),
            # count-pinned (r14, state.aligned_repartition)
            aligned_repartition(
                base.withColumn("vh", _vh(F.col(id_col))), "vh"
            ).write.partitionBy("vh").mode("overwrite").parquet(
                os.path.join(vecs_dir, f"batch={batch_id}")
            )
            aligned_repartition(sig, "ebm").write.partitionBy("ebm").mode(
                "overwrite"
            ).parquet(os.path.join(idx_dir, f"batch={batch_id}"))
            for d, lay in (
                (pairs_dir, "rows"),
                (vecs_dir, "rows-vh"),
            ):
                write_layout_marker(spark, d, lay)
            if marker == LEGACY_EBM_MARKER:
                # one-time upgrade of a pre-versioning dir (the
                # scheme check above proved it is 8x8): REPLACE so
                # the versioned marker never coexists with the bare
                # one (two markers = read conflict)
                replace_layout_marker(spark, idx_dir, layout)
            else:
                write_layout_marker(spark, idx_dir, layout)
        finally:
            sig.unpersist()
    finally:
        base.unpersist()


def read_embed_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame | None:
    """All emitted (i, j, cosine) detections; None when no state."""
    df = read_state(spark, pairs_dir)
    return None if df is None else df.select("i", "j", "cosine")


def read_embed_index(spark: SparkSession, idx_dir: str) -> DataFrame | None:
    return read_state(spark, idx_dir)


def read_embed_vec_state(spark: SparkSession, vecs_dir: str) -> DataFrame | None:
    return read_state(spark, vecs_dir)


def migrate_embed_layout(
    spark: SparkSession,
    idx_dir: str,
    vecs_dir: str,
    bands: int = RH_BANDS,
    bits: int = RH_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vacuum: bool = True,
) -> int:
    """Offline rebuild of the ebm-partitioned signature index at a new
    ``(bands, bits)`` banding, from the STORED vectors (r13 VERDICT
    ask #2 — the ``migrate_index_layout`` / ``migrate_audio_layout``
    contract applied to the embed scheme).

    The vector store is the source of truth and signatures are derived
    state, so the rebuild is: read every accumulated vector
    (``vecs_dir``, compact segment + live batches), re-sign at the new
    scheme, restore each row's original ``batch`` id by joining on the
    vector id (faithful replay-exclusion semantics), fold into
    ``_compact/upto=max_batch`` with the same ``ebm=`` inner
    partitioning the probes prune on, flip the manifest, and REPLACE
    the layout marker with ``scheme_layout(bands, bits)`` — the marker
    is what makes a stale-scheme consumer fail loudly at its next
    trigger. Returns the new watermark batch id, or -1 when there is
    no vector state to migrate (marker still replaced if the index dir
    exists, so a half-initialized dir can't stay mixed).

    Run with the stream STOPPED CLEANLY (the migrate_index_layout
    contract): the fold covers every on-disk batch, and the
    delete→rename segment swap is the one non-crash-safe step.
    Idempotent — re-running re-derives the same segment. Pair history
    (``pairs_dir``) is untouched: detections already emitted are
    scheme-independent facts. Superseded old-width batch dirs sit at
    or below the new watermark so readers ignore them even before the
    ``vacuum`` reclaims the disk. A deployment raising n past ~10⁶
    uses this to reach the measured 16-bit layout
    (operators/embed_lsh.py:61-70) without hand surgery."""
    vecs = read_state(spark, vecs_dir)
    if vecs is None:
        fs, jpath = hadoop_fs(spark, idx_dir)
        if fs.exists(jpath):
            replace_layout_marker(spark, idx_dir, scheme_layout(bands, bits))
        return -1
    vecs = vecs.select(id_col, vec_col, "batch").persist()
    try:
        m_vec = vecs.agg(F.max("batch")).first()[0]
        marks = [k for k, _ in batch_dirs(spark, idx_dir)]
        prev = compacted_upto(spark, idx_dir)
        if prev is not None:
            marks.append(prev)
        m = max([m_vec] + marks)
        sig = (
            rh_band_rows(
                vecs.select(id_col, vec_col).dropDuplicates([id_col]),
                id_col,
                vec_col,
                bands=bands,
                bits=bits,
            )
            # one signature row per (id, band) PER STORED BATCH — the
            # same multiplicity the per-trigger writes produced (a
            # redelivered id sits in two batch dirs; keep both rows)
            .join(vecs.select(id_col, "batch"), id_col)
            .withColumn("ebm", _ebm(F.col("band"), F.col("bh")))
        )
        tmp = os.path.join(idx_dir, "_compact", "_migrating")
        target = os.path.join(idx_dir, "_compact", f"upto={m}")
        (
            aligned_repartition(sig, "ebm")
            .write.partitionBy("ebm")
            .mode("overwrite")
            .parquet(tmp)
        )
        # Transitional marker BEFORE the visible swap (r14 ADVICE):
        # a crash anywhere between here and the final marker leaves
        # ``rows-ebm-migrating``, which mismatches EVERY consumer
        # scheme loudly on restart — instead of new-scheme data under
        # the old marker, which a restarted old-scheme consumer would
        # pass and then silently detect nothing. Recovery: re-run
        # this migration (idempotent — the segment is re-derived).
        replace_layout_marker(spark, idx_dir, EBM_MIGRATING_MARKER)
        fs, _ = hadoop_fs(spark, idx_dir)
        jvm = spark._jvm
        jtarget = jvm.org.apache.hadoop.fs.Path(target)
        if fs.exists(jtarget):
            fs.delete(jtarget, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jtarget)
        write_manifest(spark, idx_dir, m)
        replace_layout_marker(spark, idx_dir, scheme_layout(bands, bits))
        if vacuum:
            vacuum_state(spark, idx_dir)
        return m
    finally:
        vecs.unpersist()


def compact_embed_state(
    spark: SparkSession,
    idx_dir: str,
    vecs_dir: str,
    pairs_dir: str,
    upto_batch: int,
    vacuum: bool = False,
) -> None:
    """Compact all three dirs keeping each one's prune partitioning."""
    compact_state(spark, idx_dir, upto_batch, partition_cols=("ebm",))
    compact_state(spark, vecs_dir, upto_batch, partition_cols=("vh",))
    compact_state(spark, pairs_dir, upto_batch)
    if vacuum:
        for d in (idx_dir, vecs_dir, pairs_dir):
            vacuum_state(spark, d)


def stream_embedding_dups(
    stream_df: DataFrame,
    idx_dir: str,
    vecs_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = EMBED_COS_THRESHOLD,
    compact_every: int | None = None,
    vacuum_grace: int | None = None,
    bands: int = RH_BANDS,
    bits: int = RH_BITS,
):
    """Start the monitor: vectors in, near-dup detections out. Offsets
    commit after all three writes (commit-on-success); in-stream
    compaction folds COMMITTED batches only (state.in_stream_watermark).
    ``bands``/``bits`` select the signature scheme — must match the
    persisted index (``migrate_embed_layout`` moves a dir between
    schemes; the layout marker rejects a mismatch loudly)."""

    def body(df: DataFrame, bid: int) -> None:
        embed_dup_micro_batch(
            df, bid, idx_dir, vecs_dir, pairs_dir, id_col, vec_col, threshold,
            bands=bands, bits=bits,
        )
        upto = in_stream_watermark(df.sparkSession, vecs_dir, bid, compact_every)
        if upto is not None:
            compact_embed_state(
                df.sparkSession, idx_dir, vecs_dir, pairs_dir, upto_batch=upto
            )
            if vacuum_grace is not None:
                for d in (idx_dir, vecs_dir, pairs_dir):
                    vacuum_state(df.sparkSession, d, grace_batches=vacuum_grace)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


__all__ = [
    "EB_MOD",
    "EBM_MIGRATING_MARKER",
    "EMBED_COS_THRESHOLD",
    "LEGACY_EBM_MARKER",
    "VEC_MOD",
    "normalize_ebm_marker",
    "scheme_layout",
    "compact_embed_state",
    "embed_dup_micro_batch",
    "migrate_embed_layout",
    "read_embed_index",
    "read_embed_pairs",
    "read_embed_vec_state",
    "stream_embedding_dups",
]
