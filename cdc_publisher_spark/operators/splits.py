"""Deterministic dataset splitting & shuffling (north-star training-
data pipeline ops).

``randomSplit`` is partitioning-dependent — rerun with different
parallelism and rows change splits, which poisons train/val hygiene at
100 TB. These operators key every decision on a content hash
(xxhash64 of the id + salt), so:

- the same row lands in the same split on any cluster size, forever;
- splits are disjoint and exhaustive by construction;
- changing the salt re-rolls the assignment globally (new experiment).

The deterministic shuffle is the same idea applied to ordering: sort
by keyed hash — a stable, reproducible permutation for training-data
interleaving, expressible as a plain range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = "split-v1"
_BUCKETS = 1_000_000


def split_bucket(key: Column, salt: str = DEFAULT_SALT) -> Column:
    """Uniform bucket in [0, 1e6) from a keyed content hash."""
    return F.pmod(F.xxhash64(F.lit(salt), key), F.lit(_BUCKETS))


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = DEFAULT_SALT,
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label with the given weights
    (must sum to 1.0 within fp tolerance)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    upper = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        upper += w
        cond = bucket < int(upper * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def deterministic_shuffle(df: DataFrame, key_col: str, salt: str = DEFAULT_SALT) -> DataFrame:
    """Stable pseudo-random permutation: sort by keyed hash (ties broken
    by the key itself). Range-partitioned sort — scales like any other
    global sort, and the order is identical on every run."""
    h = F.xxhash64(F.lit(salt), F.col(key_col))
    return df.orderBy(h, F.col(key_col))
