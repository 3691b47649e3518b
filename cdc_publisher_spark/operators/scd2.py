"""SCD2 history materialization from a CDC change log.

The type-1 consumer (operators/cdc_apply.py) keeps only latest state;
the type-2 consumer keeps every version: each insert/update opens a
version at its sequence number, and ANY later change to the same key
(including a delete) closes it. A key whose last change is a delete
has no current version — the delete row itself never becomes a
version, it only closes one.

One window over one (key, seq) partitioning does all of it: ``lead``
supplies the closing sequence, so the whole history costs a single
shuffle + sort regardless of how many versions a key has — no
self-join of the change log against itself (the naive form, which
explodes on hot keys at 100 TB).

Reference tie-in: the change log is exactly the reference's published
DML envelope stream (jms_publisher.clj:138-167 message shape); this
operator is the downstream warehouse's view of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    type_col: str = "op",
) -> DataFrame:
    """Versioned history: key + payload + (valid_from, valid_to,
    is_current). ``valid_to`` is NULL on the open (current) version."""
    w = W.partitionBy(*key_cols).orderBy(seq_col)
    closed = changes.withColumn("valid_to", F.lead(seq_col).over(w))
    payload = [
        c for c in changes.columns if c not in {*key_cols, seq_col, type_col}
    ]
    return closed.filter(F.col(type_col).isin("insert", "update")).select(
        *key_cols,
        *payload,
        F.col(seq_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def snapshot_asof(history: DataFrame, asof_seq) -> DataFrame:
    """Time travel over an SCD2 history: the table state as of
    ``asof_seq`` — versions open at that point (valid_from <= T and
    valid_to absent-or-later). A pure filter over the history, so it
    rides partition pruning if the history is written partitioned on
    is_current / valid_from ranges."""
    return history.filter(
        (F.col("valid_from") <= asof_seq)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof_seq))
    )
