"""Streaming near-duplicate detection over an unbounded corpus
(SURVEY.md §2.2 K-79 streaming twin).

Each micro-batch of documents is checked against everything ingested
so far via the incremental LSH probe (operators/minhash.py
incremental_near_duplicates): the batch is signed ONCE, its bucket
rows probe the accumulated index, candidate cost is O(batch ×
collisions) per trigger, and history-vs-history pairs are never
recomputed.

Completeness theorem (pytest-pinned): every near-dup pair (a, b) is
emitted exactly once — in the micro-batch where the LATER of the two
documents arrives. So the union of per-batch emissions over any
partitioning of the corpus into batches equals the full batch-mode
q_k2 pair set: the stream is a partition of the pairs, not an
approximation.

State layout (VERDICT r5 ask #3 — per-trigger I/O must follow the
PROBE, not the corpus) rides the batch-addressed layer in
streaming/state.py: every write is an OVERWRITE of a ``batch=N``
subdirectory (replay-idempotent), compaction flips a crash-safe
manifest marker, and WITHIN each batch directory the data is
Hive-partitioned on the key the next trigger will prune by:

- ``index_dir/batch=N/bhm=M/`` — the persisted ``lsh_buckets`` frame,
  sub-partitioned by ``bhm = pmod(bh, bh_mod)`` ONLY (r11; band and
  bh ride as data columns). Partitioning by band too was pure
  overhead: every document populates every band by construction
  (band is the signature slice index), so band= directories never
  pruned a probe while multiplying the per-batch file count by
  ``bands``. A micro-batch's probe touches at most ``bands × bh_mod``
  distinct bhm values — a CONSTANT, and for small probes far fewer —
  so the index read prunes to those directories regardless of how
  many batches of history exist, and each batch write lands ≤
  ``bh_mod`` partition-aligned files (one per touched bhm). A pre-r11
  (band=B/bhm=M) dir KEEPS its legacy structure — the writer resolves
  the dir's layout (``index_layout``) before every write, because
  mixing bhm-only batch dirs into a legacy dir breaks the probe's
  union read (conflicting partition schemes — ADVICE r11, medium);
  ``maintain`` compacts a legacy dir in its own shape, and moving it
  forward is the explicit offline ``migrate_index_layout`` rewrite,
  which also REPLACES the layout marker rather than accumulating a
  second one.
- ``corpus_dir/batch=N/dh=D/`` — accumulated documents, sub-
  partitioned by ``dh = pmod(xxhash64(doc_id), doc_mod)``. The exact
  verify re-reads text ONLY for candidate-touching docs; candidates
  are materialized first, their ≤ ``doc_mod`` distinct dh values
  collected (bounded by construction), and the corpus read prunes to
  those directories before verify_candidates' semi-join.
- ``bloom_dir/batch=N/`` — an id Bloom filter DELTA: the batch's
  doc_ids hashed into ``ID_BLOOM_BITS`` positions, packed into
  (word, mask) bigint rows by one ``bit_or`` aggregate (≤
  ``ID_BLOOM_BITS/64`` rows per batch however large the batch). The
  read side bit_or-merges across batches — OR is idempotent, so the
  filter is also replay-proof beyond the overwrite. This is the
  cross-batch guard's pre-screen (below).
- ``pairs_dir/batch=N/`` — (d1, d2, jaccard) rows, one dir per batch.

Input contract and the cross-batch guard (VERDICT r6 ask #1 — now
DEFAULT-ON): ``doc_id`` values must be unique ACROSS batches — the
source is expected to deliver each document once (modulo replays of
the same batch, which the batch-addressed overwrite absorbs).
Duplicates WITHIN a batch are dropped here (cheap dropDuplicates);
cross-batch redelivery of the same doc_id under a different batch id
would accumulate duplicate doc rows and corrupt downstream shingling.
``guard_cross_batch=True`` (the default) enforces the contract at
sketch cost: the accumulated id Bloom filter — O(ID_BLOOM_BITS/8)
bytes at ANY corpus size — is broadcast to the batch, ids it cannot
contain (no false negatives, pytest-pinned across compaction) pass
straight through, and the exact anti-join runs ONLY on the
Bloom-positive remainder, reading ONLY the corpus ``dh=`` partitions
those maybe-dup ids hash into. Per-trigger guard cost is therefore
O(batch + maybe_dups × touched_dh_dirs), never O(history) — the
q_k81 pattern (queries/llm_sketch.py) wired in as infrastructure.
Pre-Bloom state dirs (no ``bloom_dir`` on disk) fall back to the full
id-column anti-join AND backfill the filter from the accumulated
corpus ids in the same trigger (one compacted-segment write off the
id column the fallback already read — ADVICE r7): without the
backfill, the first post-upgrade delta would make the bloom dir
non-empty while covering only post-upgrade ids, and legacy corpus ids
redelivered later would flag clean and skip the exact anti-join.

foreachBatch (not a stateful operator): the per-key state primitives
(``applyInPandasWithState``) hold state per GROUP, but dedup state is
corpus-global and join-shaped — exactly the case SURVEY §4.3 assigns
to foreachBatch + external state, the same pattern as the CDC
multi-table applier (operators/cdc_apply.py).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.minhash import (
    lsh_buckets,
    minhash_signatures,
    minhash_signatures_from_shingles,
    probe_candidate_pairs,
    verify_candidates_from_shingles,
)
from cdc_publisher_spark.functions.text import shingle_rows
from cdc_publisher_spark.streaming.state import (
    aligned_repartition,
    batch_dirs,
    compact_state,
    compacted_upto,
    hadoop_fs,
    in_stream_watermark,
    inner_partition_prefixes,
    read_layout_marker,
    read_state,
    replace_layout_marker,
    vacuum_state,
    write_layout_marker,
    write_manifest,
)

#: Sub-partition fans. bh_mod bounds the probe's index read at
#: bands × BH_MOD directories per trigger; doc_mod bounds the verify's
#: corpus read at DOC_MOD directories. Both are layout constants — a
#: deployment picks them once (changing them requires a compaction
#: rewrite, exactly like changing a table's bucketing).
BH_MOD = 64
DOC_MOD = 64

#: Id-Bloom layout constants (the cross-batch guard's pre-screen).
#: 2^20 bits = 128 KiB broadcast; at 10^5 history ids and k=4 hashes
#: the false-positive rate is (1 - e^(-kn/m))^k ≈ 1e-2 (ADVICE r7
#: corrected the earlier ~2e-3 figure) — and a false positive only
#: costs one id's membership in the (partition-pruned) exact
#: anti-join, never a correctness error, so ~1% of fresh ids paying
#: the join is an acceptable operating point. Like BH_MOD these are
#: layout constants: resizing means rebuilding the bloom dir (one
#: id-column scan).
ID_BLOOM_BITS = 1 << 20
ID_BLOOM_HASHES = 4


def _dh(col: str | Column) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(DOC_MOD)).cast("int")


# --------------------------------------------------------------------------
# Cross-batch id guard: Bloom pre-screen + pruned exact anti-join
# --------------------------------------------------------------------------
def _bloom_positions(df: DataFrame, id_col: str) -> DataFrame:
    """One row per (input row, hash i) with the bloom word/mask the id
    hashes into. xxhash64 with a per-hash salt keeps everything
    JVM-side — no md5 string round-trip on the guard path."""
    spark = df.sparkSession
    hashes = F.broadcast(spark.range(ID_BLOOM_HASHES).select(F.col("id").alias("_h")))
    pos = F.pmod(
        F.xxhash64(
            F.concat(F.lit("idb"), F.col("_h").cast("string"), F.col(id_col).cast("string"))
        ),
        F.lit(ID_BLOOM_BITS),
    )
    cols = df.columns
    return (
        df.crossJoin(hashes)
        .withColumn("_pos", pos)
        .select(
            *cols,
            (F.col("_pos") / 64).cast("int").alias("word"),
            # shiftleft's bit-count arg must be a literal in the Python
            # API; the SQL form accepts a column (same note as q_k81)
            F.expr("shiftleft(cast(1 as bigint), cast(_pos % 64 as int))").alias("mask"),
        )
    )


def id_bloom_delta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(word, mask) bloom rows for ``df``'s ids: one bit_or aggregate,
    ≤ ID_BLOOM_BITS/64 rows whatever the batch size. The groupBy's
    map-side combine merges per-partition partial filters."""
    return (
        _bloom_positions(df.select(id_col), id_col)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_flag(batch: DataFrame, bloom: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``batch`` plus a ``maybe`` column: True iff ALL of the id's
    bloom positions are set in ``bloom`` (broadcast) — i.e. the filter
    cannot rule the id out. False ⇒ definitely not in history (the
    no-false-negative direction, which is the correctness-bearing one).

    The position fan-out and flag aggregate run over the ID COLUMN
    ONLY (ADVICE r7): the 4-hash crossJoin and its groupBy exchange
    carry 4x the batch's ids, never 4x its document payloads; the flag
    joins back to the full batch on ``id_col`` afterwards — a key the
    caller's dropDuplicates already partitioned the batch by.

    NULL ids: an equi-join never matches a NULL key, so the join back
    is a LEFT join with ``maybe`` coalesced to False — a NULL-id row
    passes through flagged definitely-new (the Bloom cannot attest
    membership of an id that doesn't compare equal to anything,
    including itself), preserving the pre-r8 groupBy-form behavior of
    carrying such rows as clean instead of silently dropping them
    (ADVICE r8 low)."""
    flagged_ids = (
        _bloom_positions(batch.select(id_col), id_col)
        .join(F.broadcast(bloom.withColumnRenamed("mask", "_bmask")), "word", "left")
        .groupBy(id_col)
        .agg(
            F.bool_and(
                F.col("_bmask").isNotNull()
                & (F.col("_bmask").bitwiseAND(F.col("mask")) != 0)
            ).alias("maybe")
        )
    )
    return batch.join(flagged_ids, id_col, "left").withColumn(
        "maybe", F.coalesce(F.col("maybe"), F.lit(False))
    )


def _guard_parts(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    bloom_dir: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
    """The guard's three-way split, exposed for the contract tests:
    (clean, maybe, survivors) where ``clean`` ids the Bloom ruled out
    of history (NO corpus read for them), ``maybe`` is the
    Bloom-positive remainder — the ONLY rows the exact anti-join ever
    sees — and ``survivors`` is ``maybe`` minus true history ids,
    checked against a corpus read pruned to the maybe ids' dh
    partitions. maybe/survivors are None when no bloom state exists
    (fresh stream or pre-bloom dirs → caller falls back)."""
    bloom = read_state(spark, bloom_dir, exclude_batch=batch_id)
    if bloom is None:
        return batch, None, None
    merged = bloom.groupBy("word").agg(F.bit_or("mask").alias("mask"))
    flagged = bloom_flag(batch, merged, id_col)
    clean = flagged.filter(~F.col("maybe")).drop("maybe")
    maybe = flagged.filter(F.col("maybe")).drop("maybe")
    # ≤ DOC_MOD distinct dh values by construction — bounded collect;
    # executing it also tells us whether any maybe rows exist at all
    dhs = [r[0] for r in maybe.select(_dh(id_col).alias("_d")).distinct().collect()]
    if not dhs:
        return clean, maybe, maybe
    seen = read_state(
        spark,
        corpus_dir,
        exclude_batch=batch_id,
        part_filter=F.col("dh").isin(dhs),
    )
    if seen is None:  # bloom exists but corpus vanished: nothing to dedup against
        return clean, maybe, maybe
    survivors = maybe.join(seen.select(id_col), id_col, "anti")
    return clean, maybe, survivors


def backfill_bloom(
    spark: SparkSession,
    corpus: DataFrame,
    batch_id: int,
    corpus_dir: str,
    bloom_dir: str,
    id_col: str,
) -> None:
    """Build the id Bloom from the accumulated corpus ids and install
    it as a COMPACTED segment whose manifest watermark is the highest
    committed corpus batch (ADVICE r7, high): the marker records
    exactly which batches the filter covers, later per-batch deltas
    land ABOVE it, and a crash between segment write and marker flip
    just re-runs the (idempotent, overwrite-mode) backfill next
    trigger. One id-column aggregate over a frame the caller already
    read for its full anti-join fallback — the same cost the old
    opt-in guard paid every trigger."""
    upto = compacted_upto(spark, corpus_dir)
    committed = [k for k, _ in batch_dirs(spark, corpus_dir) if k != batch_id]
    marks = committed + ([upto] if upto is not None else [])
    if not marks:
        return
    m = max(marks)
    delta = id_bloom_delta(corpus.select(id_col), id_col).withColumn(
        "batch", F.lit(m)
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(bloom_dir, "_compact", f"upto={m}")
    )
    write_manifest(spark, bloom_dir, m)


def guarded_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    bloom_dir: str,
    id_col: str,
) -> DataFrame:
    """``batch`` minus ids already in the accumulated corpus, at Bloom
    pre-screen cost (see module docstring)."""
    clean, maybe, survivors = _guard_parts(
        spark, batch, batch_id, corpus_dir, bloom_dir, id_col
    )
    if maybe is None:
        # no bloom state on disk: full id-column anti-join, plus a
        # one-time backfill so the NEXT trigger's filter covers the
        # whole legacy corpus — without it the first post-upgrade
        # delta would look like complete bloom state and legacy ids
        # would silently flag clean (ADVICE r7, high)
        seen = read_state(spark, corpus_dir, exclude_batch=batch_id)
        if seen is None:
            return batch
        backfill_bloom(spark, seen, batch_id, corpus_dir, bloom_dir, id_col)
        return batch.join(seen.select(id_col), id_col, "anti")
    return clean.unionByName(survivors)


def default_bloom_dir(corpus_dir: str) -> str:
    return os.path.join(os.path.dirname(corpus_dir.rstrip("/")), "id_bloom")


# --------------------------------------------------------------------------
# Index layout resolution + migration (ADVICE r11, medium)
# --------------------------------------------------------------------------
def index_layout(
    spark: SparkSession, index_dir: str
) -> tuple[str, tuple[str, ...]]:
    """(layout marker, inner partition cols) the index WRITER must use
    for this dir. A pre-r11 dir keeps its ``(band=, bhm=)`` structure —
    mixing a bhm-only batch dir into it would make the next probe's
    union read fail on conflicting partition schemes and crash-loop the
    stream (ADVICE r11, medium) — so the writer follows the dir, never
    the code default. Fresh dirs get the r11 bhm-only layout.

    Resolution order: the ``_layout.`` marker (authoritative;
    ``read_layout_marker`` raises a migrate-first error if a damaged
    dir accumulated BOTH markers), else the physical structure of the
    live batch dirs (state written before markers existed), else the
    current default. Moving a legacy dir forward is an explicit
    offline ``migrate_index_layout`` call, not an in-place drift."""
    marker = read_layout_marker(spark, index_dir)  # raises on conflict
    if marker == "rows-band-bhm":
        return marker, ("band", "bhm")
    if marker == "rows-bhm":
        return marker, ("bhm",)
    if marker is not None:
        raise ValueError(
            f"{index_dir} declares layout {marker!r}, which is not an LSH "
            "index layout — refusing to write into it"
        )
    phys = inner_partition_prefixes(spark, index_dir)
    if "band" in phys:
        return "rows-band-bhm", ("band", "bhm")
    return "rows-bhm", ("bhm",)


def migrate_index_layout(
    spark: SparkSession, index_dir: str, vacuum: bool = True
) -> None:
    """Offline rewrite of a legacy ``(band=, bhm=)`` — or a damaged
    MIXED — index dir into the r11 bhm-only layout: every batch dir is
    read individually (a mixed dir cannot be union-read through one
    basePath, which is exactly the crash this migration repairs),
    folded with any existing compact segment into ``_compact/upto=max``,
    and the layout marker is REPLACED, not accumulated
    (state.replace_layout_marker — ADVICE r11).

    Run with the stream STOPPED CLEANLY: the fold includes every
    on-disk batch, so an uncommitted crash-leftover batch would be
    baked into the segment (same contract as ``maintain
    --assume-all-committed``). Idempotent — re-running on an
    already-bhm-only dir rewrites it verbatim."""
    upto = compacted_upto(spark, index_dir)
    live = batch_dirs(spark, index_dir)
    parts: list[DataFrame] = []
    if upto is not None:
        parts.append(
            spark.read.parquet(os.path.join(index_dir, "_compact", f"upto={upto}"))
        )
    for k, d in live:
        parts.append(spark.read.parquet(d).withColumn("batch", F.lit(k)))
    if not parts:
        return
    marks = [k for k, _ in live] + ([upto] if upto is not None else [])
    m = max(marks)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    cols = [c for c in df.columns if c != "bhm"] + ["bhm"]
    # stage through an underscore temp (invisible to readers) and swap:
    # the target segment path can be one of the INPUTS (compact-only
    # dir, m == upto), and parquet cannot overwrite a path it is
    # reading. The delete->rename window is the one non-crash-safe
    # step — acceptable under the stream-stopped offline contract.
    tmp = os.path.join(index_dir, "_compact", "_migrating")
    target = os.path.join(index_dir, "_compact", f"upto={m}")
    (
        aligned_repartition(df.select(*cols), "bhm")
        .write.partitionBy("bhm")
        .mode("overwrite")
        .parquet(tmp)
    )
    fs, _ = hadoop_fs(spark, index_dir)
    jvm = spark._jvm
    jtarget = jvm.org.apache.hadoop.fs.Path(target)
    if fs.exists(jtarget):
        fs.delete(jtarget, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jtarget)
    write_manifest(spark, index_dir, m)
    replace_layout_marker(spark, index_dir, "rows-bhm")
    if vacuum:
        vacuum_state(spark, index_dir)


def read_dedup_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Public unified view of a dedup state dir (corpus / index /
    pairs / bloom): compacted segment + live batch dirs. Downstream
    consumers must use this instead of ``spark.read.parquet(state_dir)``
    once compaction runs — underscore-prefixed compact dirs are
    invisible to plain partition discovery BY DESIGN (that is what
    keeps the compact segment hidden from the per-batch readers until
    the manifest names it)."""
    return read_state(spark, state_dir)


def dedup_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    guard_cross_batch: bool = True,
    bloom_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_grace: int | None = None,
    overlap_writes: bool = True,
) -> None:
    """foreachBatch body: sign the batch once, probe the persisted
    index READING ONLY the (band, bhm) partitions the probe touches,
    materialize candidates, then read corpus text ONLY from the dh
    partitions holding candidate docs, verify, and overwrite this
    batch's own state partitions.

    ``overlap_writes`` (default on, r16 — guide §2.6): the corpus,
    bloom-delta and index writes depend only on the persisted batch /
    bucket frames, not on the candidate probe or the verify, so they
    run CONCURRENTLY with the candidate→verify→pairs leg instead of
    serially after it — the trigger's wall was a chain of sequential
    driver-side job barriers (MONITORS.md: 14.8 s/trigger at 500 rows
    vs 20.2 s at 20k — fixed work, not row work). Write ORDER within a
    trigger is not correctness-bearing: replay excludes this batch's
    dirs everywhere (path-filtered live, row-filtered compact), and the
    offsets only commit after EVERY write returns (a failure in any
    leg re-raises before the checkpoint commit). ``False`` restores the
    sequential body — the equality pin in tests runs both and compares
    the resulting state byte-for-semantics.

    Idempotence under replay: every write targets ``.../batch=N`` with
    mode("overwrite"), so a re-delivered batch (crash after any subset
    of the writes, before the checkpoint commit) rewrites the same
    partitions and the state never accumulates duplicates. The probe
    excludes this batch's partitions from history by construction
    (live dirs are path-filtered, the compact segment row-filtered),
    so a replayed probe sees exactly the pre-batch state.

    ``compact_every=K`` runs ``compact_dedup_state`` in-stream every K
    batches (after this batch's writes, before the checkpoint commit)
    — the maintenance cadence state.py's concurrency contract names as
    safe: compaction is single-threaded with the writer, the stream is
    its own reader and lists dirs fresh next trigger, and the manifest
    flip is crash-safe. The watermark is ``batch_id - 1`` — COMMITTED
    batches only, the current batch's dirs stay live (ADVICE r8,
    medium): folding the not-yet-checkpointed batch would pin the
    merged bloom rows to ``batch=batch_id``, and a crashed-then-
    replayed trigger's ``exclude_batch=batch_id`` row-filter would
    erase the ENTIRE merged id history — every replayed id would flag
    clean and the cross-batch guard would silently no-op for that
    trigger. With the committed-only watermark a replay sees the
    compacted history (pinned ≤ batch_id-1, never excluded) plus its
    own live dirs path-excluded — exactly the pre-batch state. With
    ``vacuum_grace=N`` each compaction also vacuums superseded dirs
    keeping an N-batch margin for any EXTERNAL unsynchronized reader
    (``read_dedup_state`` from another session); vacuuming stays
    off by default.
    """
    spark = batch_df.sparkSession
    bdir = bloom_dir or default_bloom_dir(corpus_dir)
    # the deduped batch feeds the guard (whose dh-collect executes
    # eagerly) and then five downstream jobs this trigger (existence
    # probe, signing, verify union, corpus write, bloom delta) — cache
    # both stages so the dropDuplicates shuffle and the guard's bloom
    # probe run once, not per consumer
    base = batch_df.select(id_col, text_col).dropDuplicates([id_col]).persist()
    try:
        batch = base
        if guard_cross_batch:
            batch = guarded_batch(spark, base, batch_id, corpus_dir, bdir, id_col)
        batch = batch.persist()
        try:
            _dedup_micro_batch_body(
                spark, batch, batch_id, corpus_dir, index_dir, pairs_dir, bdir,
                id_col, text_col, threshold, overlap_writes,
            )
        finally:
            batch.unpersist()
    finally:
        base.unpersist()
    # committed batches only: the current batch's dirs stay live until
    # ITS offsets commit — see the docstring's replay analysis
    # (ADVICE r8, medium; shared helper state.in_stream_watermark)
    upto = in_stream_watermark(spark, corpus_dir, batch_id, compact_every)
    if upto is not None:
        compact_dedup_state(
            spark, corpus_dir, index_dir, pairs_dir,
            upto_batch=upto, bloom_dir=bdir,
        )
        if vacuum_grace is not None:
            for d in (corpus_dir, index_dir, pairs_dir, bdir):
                vacuum_state(spark, d, grace_batches=vacuum_grace)


def _dedup_micro_batch_body(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    pairs_dir: str,
    bloom_dir: str,
    id_col: str,
    text_col: str,
    threshold: float,
    overlap_writes: bool = True,
) -> None:
    if not batch.take(1):
        return
    # resolve the index dir's layout BEFORE any write: a pre-r11
    # (band=, bhm=) dir keeps its legacy structure — mixing layouts
    # inside one dir breaks the union read (ADVICE r11, medium) — and
    # a conflicted dir fails fast here with the migrate-first error
    # instead of crash-looping the probe
    idx_marker, idx_cols = index_layout(spark, index_dir)
    # shingle the batch ONCE: the same hashed shingle rows feed the
    # signature aggregation here AND the exact verify below (r14
    # VERDICT ask #4a — the verify leg previously re-shingled the
    # candidate-touching batch docs from text; the shingle pass is a
    # posexplode + per-doc window, the chain's most expensive linear
    # stage)
    tok_batch = shingle_rows(batch, id_col, text_col, 3, hashed=True).persist()
    new_buckets = lsh_buckets(minhash_signatures_from_shingles(tok_batch, id_col))
    new_buckets = new_buckets.withColumn(
        "bhm", F.pmod(F.col("bh"), F.lit(BH_MOD)).cast("int")
    ).persist()
    try:
        # ≤ bands × BH_MOD rows by construction — the driver-side
        # collect is bounded by the LAYOUT, not the data
        touched = [
            (r["band"], r["bhm"])
            for r in new_buckets.select("band", "bhm").distinct().collect()
        ]
        by_band: dict[int, list[int]] = {}
        for band, bhm in touched:
            by_band.setdefault(band, []).append(bhm)
        probe_pred = None
        for band, bhms in sorted(by_band.items()):
            leg = (F.col("band") == band) & F.col("bhm").isin(bhms)
            probe_pred = leg if probe_pred is None else (probe_pred | leg)

        # metadata-only signal: manifest or any other batch dir present
        # (corpus is written before index each batch, so its presence
        # is the authoritative "history exists" marker)
        history_exists = compacted_upto(spark, corpus_dir) is not None or any(
            k != batch_id for k, _ in batch_dirs(spark, corpus_dir)
        )
        def pairs_job() -> None:
            if history_exists:
                history_index = read_state(
                    spark, index_dir, exclude_batch=batch_id, part_filter=probe_pred
                )
                probe = new_buckets.select(id_col, "band", "bh")
                if history_index is None:
                    # index lost out-of-band: rebuild from the history docs
                    hd = read_state(
                        spark, corpus_dir, exclude_batch=batch_id
                    ).select(id_col, text_col)
                    history_index = lsh_buckets(
                        minhash_signatures(hd, id_col, text_col)
                    )
                buckets = history_index.select(id_col, "band", "bh").unionByName(probe)
                cands = probe_candidate_pairs(probe, buckets, id_col).persist()
                try:
                    # candidate docs' dh values: ≤ DOC_MOD distinct by
                    # construction — bounded driver collect
                    cand_dhs = [
                        r[0]
                        for r in cands.select(
                            F.explode(F.array("d1", "d2")).alias("_i")
                        )
                        .select(_dh("_i").alias("_dh"))
                        .distinct()
                        .collect()
                    ]
                    history_docs = read_state(
                        spark,
                        corpus_dir,
                        exclude_batch=batch_id,
                        part_filter=F.col("dh").isin(cand_dhs)
                        if cand_dhs
                        else F.lit(False),
                    )
                    # history docs must be shingled from stored text (only
                    # the candidate-touching dh partitions were read); the
                    # batch side reuses tok_batch verbatim
                    tok = shingle_rows(
                        history_docs.select(id_col, text_col),
                        id_col,
                        text_col,
                        3,
                        hashed=True,
                    ).unionByName(tok_batch)
                    pairs = verify_candidates_from_shingles(
                        tok, cands, id_col, threshold
                    )
                    pairs.write.mode("overwrite").parquet(
                        os.path.join(pairs_dir, f"batch={batch_id}")
                    )
                finally:
                    cands.unpersist()
            else:
                # first trigger: no history to probe — within-batch pairs
                # only. Reuse the ALREADY-SIGNED bucket rows (new_buckets,
                # persisted above for the index write) as both probe and
                # bucket side instead of re-shingling + re-signing the
                # batch through incremental_near_duplicates (r14: the
                # per-consumer breakdown showed the duplicate sign pass
                # costing ~2-3 s of the first trigger at 8k rows);
                # identical semantics — probe_candidate_pairs(probe,
                # probe) is exactly the distinct within-batch pair set.
                probe = new_buckets.select(id_col, "band", "bh")
                pairs = verify_candidates_from_shingles(
                    tok_batch,
                    probe_candidate_pairs(probe, probe, id_col),
                    id_col,
                    threshold,
                )
                pairs.write.mode("overwrite").parquet(
                    os.path.join(pairs_dir, f"batch={batch_id}")
                )

        # Partition-ALIGNED writes (r11): repartition on the Hive key
        # before partitionBy, so each dh= dir gets exactly one file per
        # batch instead of one per (input-partition, dh) pair — without
        # this a P-partition batch writes up to P×DOC_MOD tiny files
        # per trigger and the next trigger's pruned probe pays a
        # listing+task per file (measured 3-8x trigger latency at
        # local[32]; at 100 TB it is the classic small-files failure).
        # The hash-shuffle on dh costs one exchange of the batch — rows
        # of one dh land in one task, so file count == touched dh dirs.
        def corpus_job() -> None:
            aligned_repartition(
                batch.withColumn("dh", _dh(id_col)), "dh"
            ).write.partitionBy(
                "dh"
            ).mode("overwrite").parquet(os.path.join(corpus_dir, f"batch={batch_id}"))

        # bloom delta rides beside the corpus write: any batch whose
        # offsets commit has both (replay rewrites both), so the filter
        # covers exactly the committed corpus ids — the guard's
        # no-false-negative invariant
        def bloom_job() -> None:
            id_bloom_delta(batch, id_col).write.mode("overwrite").parquet(
                os.path.join(bloom_dir, f"batch={batch_id}")
            )

        # Index dirs partition on bhm ALONE for fresh state (r11).
        # Every document populates every band by construction (band is
        # the signature slice index), so band= dirs never prune a probe
        # — the only selective key is bhm. bhm-only dirs cut the
        # per-batch file count from ~bands × BH_MOD populated cells to
        # ≤ BH_MOD (aligned: one file per touched bhm), while a small
        # probe's read still prunes to its ≤ bands distinct bhm values;
        # band and bh stay data columns the probe join filters in-scan.
        # A dir that already holds LEGACY (band=, bhm=) state keeps
        # that structure (idx_cols, resolved above) until an explicit
        # migrate_index_layout — never an in-place layout mix.
        def index_job() -> None:
            aligned_repartition(new_buckets, *idx_cols).write.partitionBy(
                *idx_cols
            ).mode("overwrite").parquet(os.path.join(index_dir, f"batch={batch_id}"))

        if not overlap_writes:
            pairs_job(); corpus_job(); bloom_job(); index_job()
        else:
            # guide §2.6 — the three state writes are independent of
            # the candidate→verify→pairs leg (they read only persisted
            # frames); submit them from a small pool so their jobs
            # back-fill the executor while the verify leg's driver-side
            # barriers (bounded collects, state listings) leave it
            # idle. Every write targets this batch's OWN batch=N dir
            # and offsets commit only after all four return, so the
            # replay contract is unchanged; a failure in any leg
            # re-raises here and fails the trigger. Per-thread JVM
            # local-property clones — the monitor_suite/ InheritableThread
            # recipe — keep UI attribution and query.stop() cancellation
            # working under PYSPARK_PIN_THREAD.
            sc = spark.sparkContext
            try:
                parent_props = sc._jsc.sc().getLocalProperties().clone()
            except Exception:  # non-JVM test doubles
                parent_props = None

            def run_inheriting(job):
                if parent_props is not None:
                    try:
                        sc._jsc.sc().setLocalProperties(parent_props.clone())
                    except Exception:
                        pass
                return job()

            with ThreadPoolExecutor(max_workers=3) as pool:
                futs = [
                    pool.submit(run_inheriting, j)
                    for j in (corpus_job, bloom_job, index_job)
                ]
                pairs_job()
                for f in futs:
                    f.result()
        # declare each dir's merge algebra for the generic `maintain`
        # pass (explicit markers, not schema guessing — ADVICE r9)
        for d, layout in (
            (pairs_dir, "rows"),
            (corpus_dir, "rows-dh"),
            (bloom_dir, "bitor-mask"),
            (index_dir, idx_marker),
        ):
            write_layout_marker(spark, d, layout)
    finally:
        new_buckets.unpersist()
        tok_batch.unpersist()


def compact_dedup_state(
    spark: SparkSession,
    corpus_dir: str,
    index_dir: str,
    pairs_dir: str,
    upto_batch: int,
    vacuum: bool = False,
    bloom_dir: str | None = None,
) -> None:
    """Compact all four dedup state dirs to ``upto_batch``, keeping
    each dir's prune key as its inner partitioning; the bloom dir
    pre-merges to one (word, mask) row set (bit_or is the filter's own
    merge operator — lossless). Vacuuming superseded dirs is opt-in
    (ADVICE r6: deleting them under an unsynchronized concurrent
    reader is the one unsafe interleaving; see state.vacuum_state)."""
    bdir = bloom_dir or default_bloom_dir(corpus_dir)
    compact_state(spark, corpus_dir, upto_batch, partition_cols=("dh",))
    # the index compacts in ITS OWN layout — folding a legacy
    # (band=, bhm=) dir into bhm-only dirs mid-stream would mix
    # structures under the legacy marker (migration is explicit)
    compact_state(
        spark, index_dir, upto_batch,
        partition_cols=index_layout(spark, index_dir)[1],
    )
    compact_state(spark, pairs_dir, upto_batch)
    if batch_dirs(spark, bdir) or compacted_upto(spark, bdir) is not None:
        compact_state(
            spark,
            bdir,
            upto_batch,
            merge=lambda df: df.groupBy("word")
            .agg(F.bit_or("mask").alias("mask"))
            .withColumn("batch", F.lit(upto_batch)),
        )
    if vacuum:
        for d in (corpus_dir, index_dir, pairs_dir, bdir):
            vacuum_state(spark, d)


def stream_neardup_pairs(
    stream_df: DataFrame,
    corpus_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    index_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    guard_cross_batch: bool = True,
    bloom_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_grace: int | None = None,
):
    """Start the streaming dedup: documents in, near-dup pairs out.

    Returns the StreamingQuery. Offsets commit to ``checkpoint_dir``
    after each batch's writes — the commit-on-success contract the CDC
    pipeline uses (streaming/pipeline.py). ``index_dir`` / ``bloom_dir``
    default to siblings of ``corpus_dir``. ``doc_id`` must be unique
    across batches (see module docstring); the default-on
    ``guard_cross_batch`` enforces that at Bloom-pre-screen cost per
    trigger — O(batch), never O(history). ``compact_every=K`` turns on
    in-stream state compaction every K batches (optionally vacuuming
    with a ``vacuum_grace`` margin) so a long-running stream's batch
    dirs stay bounded without external maintenance — see
    ``dedup_micro_batch``.
    """
    idx = index_dir or os.path.join(os.path.dirname(corpus_dir.rstrip("/")), "lsh_index")
    bdir = bloom_dir or default_bloom_dir(corpus_dir)

    def body(df: DataFrame, bid: int) -> None:
        dedup_micro_batch(
            df,
            bid,
            corpus_dir,
            idx,
            pairs_dir,
            id_col,
            text_col,
            threshold,
            guard_cross_batch=guard_cross_batch,
            bloom_dir=bdir,
            compact_every=compact_every,
            vacuum_grace=vacuum_grace,
        )

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
