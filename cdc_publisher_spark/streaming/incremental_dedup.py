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

State layout (plain parquet dirs, so the operator survives restart
with the stream's checkpoint):

- ``corpus_dir``   — accumulated documents (appended per batch; the
  corpus lake table in a real deployment). Read back ONLY for
  candidate-touching docs — verify_candidates semi-join-prunes before
  shingling.
- ``index_dir``    — the accumulated ``lsh_buckets`` frame (appended
  per batch): the persisted LSH index. Each batch signs ONLY its own
  documents and probes this table, so per-trigger cost is O(batch) +
  the probe join — independent of corpus size.
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

from cdc_publisher_spark.operators.minhash import (
    incremental_near_duplicates,
    lsh_buckets,
    minhash_signatures,
)


def dedup_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> None:
    """foreachBatch body: sign the batch, probe the persisted index,
    append touching pairs, then append the batch's rows to the corpus
    and index state.

    State writes go last so a crash mid-batch replays (stream
    checkpoint) into an idempotent probe — the batch is not yet in the
    state it probes, and pairs_dir rows carry batch_id so a replayed
    batch's duplicate emissions are reconcilable by max-batch_id.
    """
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, text_col)
    if not batch.take(1):
        return
    new_buckets = lsh_buckets(minhash_signatures(batch, id_col, text_col))
    have_index = os.path.isdir(index_dir) and any(
        f.endswith(".parquet") for f in os.listdir(index_dir)
    )
    if have_index:
        history_index = spark.read.parquet(index_dir)
        corpus = spark.read.parquet(corpus_dir).unionByName(batch)
    else:
        history_index = None
        corpus = batch
    pairs = incremental_near_duplicates(
        corpus,
        batch.select(id_col),
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        history_index=history_index,
    )
    # within-batch pairs appear once; a pair straddling two batches has
    # exactly one side in the new batch, so no emission is duplicated
    # across batches (completeness theorem in the module docstring)
    pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
        pairs_dir
    )
    batch.write.mode("append").parquet(corpus_dir)
    new_buckets.write.mode("append").parquet(index_dir)


def stream_neardup_pairs(
    stream_df: DataFrame,
    corpus_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    index_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """Start the streaming dedup: documents in, near-dup pairs out.

    Returns the StreamingQuery. Offsets commit to ``checkpoint_dir``
    after each batch's writes — the commit-on-success contract the CDC
    pipeline uses (streaming/pipeline.py). ``index_dir`` defaults to a
    sibling of ``corpus_dir``.
    """
    os.makedirs(corpus_dir, exist_ok=True)
    idx = index_dir or os.path.join(os.path.dirname(corpus_dir.rstrip("/")), "lsh_index")

    def body(df: DataFrame, bid: int) -> None:
        dedup_micro_batch(
            df, bid, corpus_dir, idx, pairs_dir, id_col, text_col, threshold
        )

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
