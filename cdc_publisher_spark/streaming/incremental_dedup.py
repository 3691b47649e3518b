"""Streaming near-duplicate detection over an unbounded corpus
(SURVEY.md §2.2 K-79 streaming twin).

Each micro-batch of documents is checked against everything ingested
so far via the incremental LSH probe (operators/minhash.py
incremental_near_duplicates): the batch's bucket rows probe the
accumulated corpus, candidate cost is O(batch × collisions) per
trigger, and history-vs-history pairs are never recomputed.

Completeness theorem (pytest-pinned): every near-dup pair (a, b) is
emitted exactly once — in the micro-batch where the LATER of the two
documents arrives. So the union of per-batch emissions over any
partitioning of the corpus into batches equals the full batch-mode
q_k2 pair set: the stream is a partition of the pairs by max-side
arrival, not an approximation.

State layout (both plain parquet dirs, so the operator survives
restart with the stream's checkpoint):

- ``corpus_dir``   — accumulated documents (appended per batch). In a
  100 TB deployment this is the corpus lake table itself; only its
  shingle/bucket derivation is recomputed per probe here, and a real
  deployment persists ``lsh_buckets`` incrementally instead (the
  operator's probe side only ever reads the batch's own buckets).
- ``pairs_dir``    — emitted (d1, d2, jaccard, batch_id) rows.

foreachBatch (not a stateful operator): the per-key state primitives
(``applyInPandasWithState``) hold state per GROUP, but dedup state is
corpus-global and join-shaped — exactly the case SURVEY §4.3 assigns
to foreachBatch + external state, the same pattern as the CDC
multi-table applier (operators/cdc_apply.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.minhash import incremental_near_duplicates


def dedup_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> None:
    """foreachBatch body: append the batch to the corpus, probe the
    accumulated corpus with the batch's ids, append touching pairs.

    Append order is corpus-first so a crash between the writes replays
    the batch (stream checkpoint) into an idempotent probe — pairs for
    a batch are derived deterministically from (corpus ≤ batch, batch),
    and pairs_dir rows carry batch_id so replays can be reconciled.
    """
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, text_col)
    if not batch.take(1):
        return
    batch.write.mode("append").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    new_ids = batch.select(id_col)
    pairs = incremental_near_duplicates(
        corpus, new_ids, id_col=id_col, text_col=text_col, threshold=threshold
    )
    # within-batch pairs appear once; a pair straddling two batches has
    # exactly one side in new_ids, so no emission is ever duplicated
    # across batches (completeness theorem in the module docstring)
    pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
        pairs_dir
    )


def stream_neardup_pairs(
    stream_df: DataFrame,
    corpus_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """Start the streaming dedup: documents in, near-dup pairs out.

    Returns the StreamingQuery. Offsets commit to ``checkpoint_dir``
    after each batch's writes — the commit-on-success contract the CDC
    pipeline uses (streaming/pipeline.py).
    """
    os.makedirs(corpus_dir, exist_ok=True)

    def body(df: DataFrame, bid: int) -> None:
        dedup_micro_batch(
            df, bid, corpus_dir, pairs_dir, id_col, text_col, threshold
        )

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
