"""A1 — latest-value-per-key (Kafka-compaction semantics in user space).

Reference: ``last-known-values`` groups consumer records by key and
keeps the value with the highest offset (kafka_ccd_store.clj:28-42);
the live tail then maintains the same state incrementally.

Batch form: ``max_by(value, offset)`` — a single partial+final hash
aggregate; shuffle volume is O(distinct keys), which is what makes
snapshot resolution viable when the control topic holds billions of
records.

Streaming form: ``dropDuplicates`` on key over an ever-growing state
store is wrong (unbounded, keeps the FIRST seen); the right primitive
is per-key stateful max — implemented in
streaming/latest_state_stream.py via applyInPandasWithState. This
module is the batch/plan-level API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Latest full row per key by (order_col, *tiebreak_cols).

    Implemented as ``max_by(struct(all columns), struct(order))`` — one
    hash aggregate, no window sort, no row_number shuffle+filter. The
    struct comparison gives lexicographic (order, tiebreak...) argmax.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ordering = F.struct(*[F.col(c) for c in [order_col, *(tiebreak_cols or [])]])
    payload_cols = [c for c in df.columns if c not in keys]
    packed = F.max_by(F.struct(*[F.col(c) for c in payload_cols]), ordering).alias("_latest")
    out = df.groupBy(*keys).agg(packed)
    return out.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload_cols])


def max_offset(df: DataFrame, offset_col: str = "offset") -> DataFrame:
    """A2 — the snapshot resume token: max offset, 0 when empty
    (kafka_ccd_store.clj:133's ``(apply max 0 ...)``)."""
    return df.agg(F.coalesce(F.max(offset_col), F.lit(0).cast("bigint")).alias("resume_offset"))
