"""As-of join (SURVEY.md §2.2 Q-C7, §4.3 item 5).

Spark has no native ASOF JOIN. The scalable rewrite used here:

1. tag both sides and union them on (key, ts);
2. one window sort per key carries the latest right-side row forward
   (``last(col, ignorenulls=True)`` over rows-unbounded-preceding);
3. keep the left rows.

Cost: a single hash-partition + sort on (key, ts) — O(n log n) per key
group, no range cross-product, no skew beyond what the key distribution
already has. This survives 100 TB where the naive
``join(l.key==r.key & r.ts<=l.ts) + argmax`` explodes on hot keys:
that variant materializes every (left,right) in-range pair before
reducing; this one never materializes pairs at all.

DuckDB's ``ASOF JOIN`` is the test oracle for the same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    strict: bool = True,
    right_tiebreak: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    greatest ``right_ts`` <= (``<`` when ``strict``) the left row's
    ``left_ts``, matching on ``on``. Unmatched left rows keep NULLs.

    ``direction="forward"`` attaches instead the right row with the
    SMALLEST ``right_ts`` >= (``>`` when strict) the left timestamp —
    pandas ``merge_asof`` parity. Same machinery: the union is walked
    in descending time order, so "carry the last non-null right row
    forward" means "nearest future row". Identical cost profile.

    ``right_cols`` defaults to every right column except keys+ts.
    ``right_tiebreak`` names a right column that breaks ties among
    right rows sharing (key, ts) — pass one whenever that can happen,
    otherwise the carried row is arbitrary.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    carried = [f"{c}{suffix}" for c in right_cols]
    ts_r = f"{right_ts}{suffix}"
    rtypes = dict(right.dtypes)
    left_cols = list(left.columns)

    # At equal (key, ts): with strict matching the right row must sort
    # AFTER the left row (invisible to it); with inclusive matching,
    # before. _side encodes that.
    left_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0 if strict else 1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_left_payload"),
        F.lit(None).cast(rtypes[right_ts]).alias(ts_r),
        *[F.lit(None).cast(rtypes[c]).alias(a) for c, a in zip(right_cols, carried)],
    )
    # A right row with NULL ts can never legitimately match, but it
    # would sort first (asc, nulls first) and its PAYLOAD columns would
    # still carry forward (last/ignorenulls skips nulls per-column),
    # producing mixed rows with ts_r NULL + a real payload. Drop them.
    right = right.filter(F.col(right_ts).isNotNull())
    right_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1 if strict else 0).alias("_side"),
        F.lit(None).cast(left_side.schema["_left_payload"].dataType).alias("_left_payload"),
        F.col(right_ts).alias(ts_r),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
    )

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ts_order = (
        F.col("_asof_ts").asc() if direction == "backward" else F.col("_asof_ts").desc()
    )
    # _side ordering is direction-independent: at equal (key, ts) the
    # right row sorts after the left iff the match is strict (invisible).
    order: list[Column] = [ts_order, F.col("_side").asc()]
    if right_tiebreak is not None:
        # forward keeps the EARLIEST future row; walking time descending
        # means later duplicates are seen first, so the nearest-in-ts
        # tie still resolves by taking the last-seen (minimal) one.
        order.append(
            F.col(f"{right_tiebreak}{suffix}").asc_nulls_first()
            if direction == "backward"
            else F.col(f"{right_tiebreak}{suffix}").desc_nulls_first()
        )
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carry = [F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in [ts_r, *carried]]

    return (
        left_side.unionByName(right_side)
        .select(*keys, "_asof_ts", "_side", "_left_payload", *carry)
        .filter(F.col("_left_payload").isNotNull())
        .select(
            *[F.col(f"_left_payload.{c}").alias(c) for c in left_cols],
            F.col(ts_r),
            *[F.col(c) for c in carried],
        )
    )
