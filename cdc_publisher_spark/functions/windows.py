"""Window algebra that avoids partition-sized windows.

The one recurring scale trap in per-group running computations is
``W.partitionBy(low_cardinality_key).orderBy(...)`` over a corpus-sized
input: with ~20 sources over 100 TB, each group's full data share
funnels through ONE task's sort (the q_k17/q_k62/q_k80 round-5 weak
marks; tripwired by ``plans.low_cardinality_corpus_windows``). The
decomposition here is the shared fix for the running-SUM case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def bucketed_running_sum(
    df: DataFrame,
    part_col: str,
    bucket_col: str,
    order_cols: list[str],
    val_col: str | Column,
    out_col: str,
) -> DataFrame:
    """Per-``part_col`` inclusive running sum of ``val_col`` in
    ``(bucket_col, *order_cols)`` order, WITHOUT a partition-sized
    window — bit-identical to
    ``SUM(val) OVER (PARTITION BY part ORDER BY bucket, ... ROWS
    UNBOUNDED PRECEDING)`` in exact integer math.

    Decomposition: per-(part, bucket) partial sums roll up to a bucket
    OFFSET table (one row per bucket — corpus/bucket_width rows), whose
    per-part cumulative window runs over that small table only; each
    row then adds its intra-bucket cumsum, a window on the
    high-cardinality (part, bucket) key whose per-task input is one
    bucket's rows. Requires ``bucket_col`` to be monotone
    non-decreasing in the intended total order (ordering by
    ``(bucket_col, *order_cols)`` must equal the target order — e.g. a
    ``doc_id div 4096`` range bucket under a doc_id order, or an md5
    hex prefix under the full-md5 order).
    """
    w_b = (
        W.partitionBy(part_col)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    boff = (
        df.groupBy(part_col, bucket_col)
        .agg(F.sum(val_col).alias("_btok"))
        .select(
            part_col,
            bucket_col,
            F.coalesce(F.sum("_btok").over(w_b), F.lit(0)).alias("_boff"),
        )
    )
    w_in = (
        W.partitionBy(part_col, bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # NULL-SAFE join back (ADVICE r6): window partitionBy treats NULL
    # as a real partition/bucket value, so the offset join must match
    # it too — a plain equi-join would silently drop every NULL-keyed
    # row instead of summing it like the window form does
    boff = boff.withColumnRenamed(part_col, "_bp").withColumnRenamed(
        bucket_col, "_bb"
    )
    return (
        df.join(
            boff,
            F.col(part_col).eqNullSafe(F.col("_bp"))
            & F.col(bucket_col).eqNullSafe(F.col("_bb")),
        )
        .drop("_bp", "_bb")
        .withColumn(out_col, F.col("_boff") + F.sum(val_col).over(w_in))
        .drop("_boff")
    )
