"""Vector math as built-in higher-order functions (SURVEY.md §2.2 K-5).

Everything here is pure Catalyst expression — no UDF, no Arrow hop —
so similarity scans stay inside whole-stage codegen. Elements are cast
float->double (exact) before arithmetic; sums fold left-to-right, which
both Spark and DuckDB's list functions do sequentially, keeping the
oracle comparison exact after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l1_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double")))


def linf_norm(a: Column) -> Column:
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    """Per-pair cosine. For candidate scans, pre-stage each side's norm
    once per row (cosine_with_norms) — this form re-folds both norms on
    every pair, tripling the interpreted-HOF work."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_with_norms(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """cosine from pre-staged norms: bit-identical to :func:`cosine`
    (same op order: dot / (na * nb)), one fold per pair instead of three."""
    return dot(a, b) / (a_norm * b_norm)


def normalize(a: Column) -> Column:
    """Unit-normalize an array column (null-safe on zero vectors)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n))
