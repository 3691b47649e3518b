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

State layout — every write is an OVERWRITE of a batch-addressed
subdirectory (``.../batch=N/``), so foreachBatch's at-least-once
replay is idempotent: a re-delivered batch rewrites its own partition
byte-for-byte instead of appending duplicates (duplicated doc rows
would corrupt downstream shingling — the per-doc lead() window would
interleave the copies). All reads go through the Spark reader, so the
state dirs work on any Hadoop filesystem (HDFS/S3), not just the
driver's local disk:

- ``corpus_dir``   — accumulated documents, one partition per batch
  (the corpus lake table in a real deployment). Read back ONLY for
  candidate-touching docs — verify_candidates semi-join-prunes before
  shingling.
- ``index_dir``    — the accumulated ``lsh_buckets`` frame, one
  partition per batch: the persisted LSH index. Each batch signs ONLY
  its own documents (once) and probes this table, so per-trigger cost
  is O(batch) + the probe join — independent of corpus size.
- ``pairs_dir``    — (d1, d2, jaccard) rows, one partition per batch.

foreachBatch (not a stateful operator): the per-key state primitives
(``applyInPandasWithState``) hold state per GROUP, but dedup state is
corpus-global and join-shaped — exactly the case SURVEY §4.3 assigns
to foreachBatch + external state, the same pattern as the CDC
multi-table applier (operators/cdc_apply.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cdc_publisher_spark.operators.minhash import (
    incremental_near_duplicates,
    lsh_buckets,
    minhash_signatures,
)


def _read_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a batch-partitioned state dir via the Spark reader (works
    on any Hadoop FS); None when it doesn't exist yet. Other reader
    errors (corrupt state) propagate — silently treating them as
    "first batch" would drop history pairs."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


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
    """foreachBatch body: sign the batch once, probe the persisted
    index, then overwrite this batch's own state partitions.

    Idempotence under replay: every write targets ``.../batch=N`` with
    mode("overwrite"), so a re-delivered batch (crash after any subset
    of the three writes, before the checkpoint commit) rewrites the
    same partitions and the state never accumulates duplicates. The
    probe excludes this batch's partitions from history by
    construction (they are filtered out of the reads below), so a
    replayed probe sees exactly the pre-batch state.
    """
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, text_col)
    if not batch.take(1):
        return
    new_buckets = lsh_buckets(minhash_signatures(batch, id_col, text_col))

    from pyspark.sql import functions as F

    # corpus is written before index each batch, so its presence is the
    # authoritative "history exists" signal; a replayed batch may
    # already have its own state partitions — exclude them so the probe
    # sees exactly the pre-batch state
    corpus_state = _read_state(spark, corpus_dir)
    if corpus_state is not None:
        history_docs = corpus_state.filter(F.col("batch") != batch_id).select(
            id_col, text_col
        )
        history_index = _read_state(spark, index_dir)
        if history_index is not None:
            history_index = history_index.filter(
                F.col("batch") != batch_id
            ).select(id_col, "band", "bh")
        else:  # index lost out-of-band: rebuild from the history docs
            history_index = lsh_buckets(
                minhash_signatures(history_docs, id_col, text_col)
            )
        pairs = incremental_near_duplicates(
            history_docs.unionByName(batch),
            batch.select(id_col),
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            history_index=history_index,
            probe_buckets=new_buckets,
        )
    else:
        pairs = incremental_near_duplicates(
            batch,
            batch.select(id_col),
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
        )
    pairs.write.mode("overwrite").parquet(os.path.join(pairs_dir, f"batch={batch_id}"))
    batch.write.mode("overwrite").parquet(os.path.join(corpus_dir, f"batch={batch_id}"))
    new_buckets.write.mode("overwrite").parquet(
        os.path.join(index_dir, f"batch={batch_id}")
    )


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
