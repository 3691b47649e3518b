"""All nine state consumers behind ONE stream: the serve-style job.

A real deployment does not run nine separate streams over the same
ingest — it runs one micro-batch loop that fans each trigger's rows
out to every monitor (VERDICT r9 ask #2). This module composes the
layer's consumers — incremental LSH dedup, HLL distinct-
cardinality, count-min heavy hitters, rare-gram exposure, centroid
drift, first-seen vocabulary, context-length economics, the
audio-fingerprint dup guard (r11), and the incremental embedding
near-dup monitor (r12) — under a single ``foreachBatch`` against one
state root::

    state_root/
      dedup/{corpus,idx,pairs,id_bloom}   incremental_dedup
      hll/                                per-source distinct words
      cm/                                 per-source word heavy hitters
      exposure/                           rare-gram exposure
      drift/                              label-centroid drift
      vocab/                              first-seen vocabulary
      ctx/                                context-length economics
      audio/{fpk,pairs}                   exact audio-dup detections
      embed/{idx,vecs,pairs}              embedding near-dup detections

Input contract: rows with ``doc_id, text, source`` and — for the
drift and embedding-dedup monitors — ``label, embedding``; when
``embedding`` is absent those two consumers are skipped, the rest
run. The trigger persists the batch once (the consumers would
otherwise re-run the source scan) and derives the shared word frame
once for HLL + CM. The audio guard runs over clips synthesized
deterministically from the text column
(operators/multimodal.synth_media_from_text — the sandbox ships no
audio corpus); a deployment with real media swaps in its payload
column via streaming/audio_monitor.stream_audio_dups directly. The
embedding monitor runs at the q_k21 audit threshold (the synthetic
embeddings are random — a production deployment passes its own
``embed_threshold``).

Because every consumer writes batch-addressed overwrite deltas to its
own dir, the composed job inherits the layer's replay story wholesale:
a re-delivered trigger rewrites each dir's ``batch=N`` byte-for-byte.
Maintenance against the LIVE stream is the ``maintain`` CLI with
``--checkpoint <this stream's checkpoint>`` — the commits log names
exactly the batches that are safe to fold, and vacuuming between
triggers with a grace margin honors state.vacuum_state's concurrency
contract (pinned by tests/test_monitor_suite.py).

Fan-out is CONCURRENT (``SUITE_PARALLELISM`` threads): the consumers
are independent job DAGs over the one persisted batch, writing
disjoint state dirs, so the trigger's wall is the longest consumer
chain instead of the sum of all nine. Sequential submission left the
cluster idle through each chain's driver-side barriers (bounded
collects, state-dir listings, write commits) — profiled at sf0.1,
the three heavy consumers (LSH dedup, audio guard, embedding dedup)
were 117 s of a 129 s drain run back-to-back. Spark schedules jobs
submitted from separate threads concurrently; a failure in any
consumer fails the whole trigger (the thread pool re-raises), so
commit-on-success and the replay contract are unchanged — pinned by
the slicing-independent equality suite in tests/test_monitor_suite.py.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import words
from cdc_publisher_spark.operators.multimodal import synth_media_from_text
from cdc_publisher_spark.streaming.audio_monitor import audio_dup_micro_batch
from cdc_publisher_spark.streaming.cm_monitor import cm_micro_batch
from cdc_publisher_spark.streaming.ctx_monitor import ctx_micro_batch
from cdc_publisher_spark.streaming.drift_monitor import drift_micro_batch
from cdc_publisher_spark.streaming.embed_monitor import embed_dup_micro_batch
from cdc_publisher_spark.streaming.exposure_monitor import exposure_micro_batch
from cdc_publisher_spark.streaming.hll_monitor import hll_micro_batch
from cdc_publisher_spark.streaming.incremental_dedup import dedup_micro_batch
from cdc_publisher_spark.streaming.vocab_monitor import vocab_micro_batch

#: state_root-relative dir of every consumer the suite drives.
SUITE_DIRS = {
    "dedup_corpus": "dedup/corpus",
    "dedup_index": "dedup/idx",
    "dedup_pairs": "dedup/pairs",
    "dedup_bloom": "dedup/id_bloom",
    "hll": "hll",
    "cm": "cm",
    "exposure": "exposure",
    "drift": "drift",
    "vocab": "vocab",
    "ctx": "ctx",
    "audio_fpk": "audio/fpk",
    "audio_pairs": "audio/pairs",
    "embed_idx": "embed/idx",
    "embed_vecs": "embed/vecs",
    "embed_pairs": "embed/pairs",
}


#: Concurrent consumer chains per trigger. 6 overlaps the three heavy
#: consumers (the profiled 90% of trigger wall) AND most of the six
#: cheap ones, while still bounding how many consumers' persisted
#: intermediates are live at once. Measured r15 at the 8k-rows/trigger
#: point (interleaved fresh-JVM reps, sf1 corpus): width 6 beat the
#: old width 4 consistently (~1.09-1.12x, medians 36.9 s vs 41.4 s
#: over 5 reps; every width-6 sample 34.6-38.4 s vs width-4
#: 37.4-64.8 s); width 9 measured WORSE than 6 (medians 43.6 vs
#: 41.0 s — over-subscription, the same lesson as the rejected r12
#: nested concurrency). Pass ``parallelism=1`` to
#: ``monitor_suite_batch`` for strictly sequential fan-out.
SUITE_PARALLELISM = 6


def suite_dir(state_root: str, name: str) -> str:
    return os.path.join(state_root, SUITE_DIRS[name])


def monitor_suite_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    label_col: str = "label",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    embed_threshold: float = 0.42,
    parallelism: int | None = None,
    timings: dict[str, list[float]] | None = None,
) -> None:
    """foreachBatch body: one trigger's rows through all nine consumers.

    Each consumer keeps its own idempotence contract (overwrite of its
    own ``batch=N``); the composition adds none of its own state. The
    input batch is persisted and fully materialized once up front, then
    the consumer chains run CONCURRENTLY (``parallelism`` threads,
    default ``SUITE_PARALLELISM``) — they are independent DAGs over the
    cached batch writing disjoint dirs, so the trigger's wall is the
    longest chain, not the sum. Any consumer's failure propagates and
    fails the trigger before the offset commits. The word explode is
    shared by HLL and CM. ``embed_threshold`` defaults to the q_k21
    audit value (0.42, the synthetic-fixture near-dup tail);
    production passes its own.
    """
    batch = batch_df.persist()
    try:
        # One driver job both materializes the cache (before the
        # fan-out) and probes for the empty trigger — no separate
        # take(1). The early return skips the per-consumer batch=N
        # overwrites, which is safe because Structured Streaming file
        # sources are immutable-by-contract: a replayed trigger carries
        # the same rows as the failed attempt, so an EMPTY replay of a
        # previously non-empty batch id (the only path to a stale
        # batch=N dir surviving) can only happen if source files
        # mutated under the stream — outside the source contract.
        if batch.count() == 0:
            return  # every consumer is a no-op on an empty trigger
        word_rows = batch.select(
            F.col(source_col).alias("source"),
            F.explode(words(F.col(text_col))).alias("w"),
        )
        thunks = [
            ("dedup_lsh", lambda: dedup_micro_batch(
                batch,
                batch_id,
                suite_dir(state_root, "dedup_corpus"),
                suite_dir(state_root, "dedup_index"),
                suite_dir(state_root, "dedup_pairs"),
                id_col=id_col,
                text_col=text_col,
                threshold=threshold,
            )),
            ("audio_dup", lambda: audio_dup_micro_batch(
                synth_media_from_text(batch, id_col=id_col, text_col=text_col),
                batch_id,
                suite_dir(state_root, "audio_fpk"),
                suite_dir(state_root, "audio_pairs"),
            )),
            ("hll", lambda: hll_micro_batch(
                word_rows, batch_id, suite_dir(state_root, "hll"),
                group_col="source", value_col="w",
            )),
            ("cm", lambda: cm_micro_batch(
                word_rows, batch_id, suite_dir(state_root, "cm"),
                value_col="w", group_cols=["source"],
            )),
            ("exposure", lambda: exposure_micro_batch(
                batch, batch_id, suite_dir(state_root, "exposure"),
                id_col=id_col, text_col=text_col, source_col=source_col,
            )),
            ("vocab", lambda: vocab_micro_batch(
                batch, batch_id, suite_dir(state_root, "vocab"),
                text_col=text_col, source_col=source_col,
            )),
            ("ctx", lambda: ctx_micro_batch(
                batch, batch_id, suite_dir(state_root, "ctx"),
                text_col=text_col,
            )),
        ]
        if vec_col in batch.columns:
            thunks.insert(  # heavy chain — submit with the other two
                1,
                ("embed_dup", lambda: embed_dup_micro_batch(
                    batch.select(F.col(id_col), F.col(vec_col)),
                    batch_id,
                    suite_dir(state_root, "embed_idx"),
                    suite_dir(state_root, "embed_vecs"),
                    suite_dir(state_root, "embed_pairs"),
                    id_col=id_col,
                    vec_col=vec_col,
                    threshold=embed_threshold,
                )),
            )
            if label_col in batch.columns:
                thunks.append(
                    ("drift", lambda: drift_micro_batch(
                        batch, batch_id, suite_dir(state_root, "drift"),
                        label_col=label_col, vec_col=vec_col,
                    ))
                )
        if timings is not None:
            # Per-consumer wall clock INSIDE the trigger (r13 VERDICT
            # ask #1) — the clock starts when a pool worker picks the
            # thunk up, so queue wait is excluded and the figure is
            # each chain's own wall under whatever executor contention
            # the fan-out creates. dict-of-list appends are GIL-atomic
            # and consumer names are distinct within a trigger.
            def timed(name, t):
                def f():
                    t0 = time.perf_counter()
                    out = t()
                    timings.setdefault(name, []).append(
                        time.perf_counter() - t0
                    )
                    return out
                return f

            thunks = [(name, timed(name, t)) for name, t in thunks]
        workers = parallelism if parallelism is not None else SUITE_PARALLELISM
        if workers <= 1:
            for _name, t in thunks:
                t()
        else:
            # With PYSPARK_PIN_THREAD (default since Spark 3.2) each
            # Python thread pins to its own JVM thread, so plain pool
            # threads would NOT inherit this trigger's job group /
            # local properties — query.stop() could not cancel
            # in-flight consumer jobs and Spark-UI attribution to the
            # streaming query would be lost. Clone the parent thread's
            # JVM local properties once and install them in each
            # worker before its thunk runs — the pyspark
            # InheritableThread recipe applied to a pool.
            sc = batch.sparkSession.sparkContext
            try:
                parent_props = sc._jsc.sc().getLocalProperties().clone()
            except Exception:  # non-JVM test doubles
                parent_props = None

            def run_inheriting(named):
                _name, t = named
                # Each worker gets its OWN clone: Spark mutates
                # thread-local properties during actions (e.g.
                # SQLExecution.withNewExecutionId sets/restores
                # spark.sql.execution.id around every write), so a
                # single Properties object shared across pool threads
                # races — a sibling's restore can null the key
                # mid-write and fail the trigger. Clone-per-thread is
                # Spark's own InheritableThread recipe.
                if parent_props is not None:
                    try:
                        sc._jsc.sc().setLocalProperties(parent_props.clone())
                    except Exception:
                        pass
                return t()

            with ThreadPoolExecutor(max_workers=workers) as pool:
                # list() drains the iterator so every future resolves;
                # the first consumer exception re-raises here and fails
                # the trigger BEFORE the stream commits the offset
                list(pool.map(run_inheriting, thunks))
    finally:
        batch.unpersist()


def stream_monitor_suite(
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Start the composed job: one readStream in, nine monitors' state
    out, offsets committed to ``checkpoint_dir`` after each trigger
    completes EVERY consumer's write (commit-on-success — a crash
    mid-fan-out replays the whole trigger and each dir's overwrite
    absorbs it). Maintenance runs OUT of band: ``maintain
    --state-root <state_root> --checkpoint <checkpoint_dir>``."""

    def body(df: DataFrame, bid: int) -> None:
        monitor_suite_batch(df, bid, state_root, **kwargs)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


__all__ = [
    "SUITE_DIRS",
    "monitor_suite_batch",
    "stream_monitor_suite",
    "suite_dir",
]
