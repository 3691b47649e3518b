"""Deterministic source mixing / token-budget sampling (north-star
training-data pipeline op).

A pretraining mix rebalances heterogeneous sources ("web", "code",
"books", …) toward target token shares. At 100 TB the sampling decision
must be (a) per-row independent — no global sort or count — and
(b) deterministic across reruns and cluster sizes, or the mix drifts
between experiment and production runs.

Both hold here: each doc draws a uniform u in [0, 1) from the first 8
hex digits of ``md5(id)`` (content-keyed, partitioning-independent —
same rationale as operators/splits.py), and survives iff
``u < rate(source)`` where ``rate = min(1, target_tokens /
source_tokens)``. Per-source totals are one partial+final agg; the
rates broadcast back — the only shuffle is the O(sources) aggregate.

md5 (not xxhash64) so the draw is reproducible outside Spark: DuckDB
computes the identical u via ``('0x' || substr(md5(id), 1, 8))::
UBIGINT`` — which is how the q_k20 oracle hash-checks the exact
sampled set cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO32 = 4294967296.0


def uniform_from_id(id_col: Column) -> Column:
    """Deterministic u ~ U[0,1): first 32 bits of md5(id as string)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("bigint")
        / F.lit(_TWO32)
    )


def sample_to_token_budget(
    docs: DataFrame,
    source_col: str,
    token_col: str,
    id_col: str,
    target_tokens: int | None = None,
) -> DataFrame:
    """Downsample each source to ~``target_tokens`` (default: the
    smallest source's total — a uniform mix). Returns ``docs`` plus
    ``sample_rate`` / ``sampled`` columns; filter on ``sampled`` for
    the mixed dataset. Sources under budget keep every row (rate 1)."""
    totals = docs.groupBy(source_col).agg(F.sum(token_col).alias("_source_tokens"))
    if target_tokens is None:
        tgt = totals.agg(F.min("_source_tokens").alias("_target"))
        rates = totals.crossJoin(F.broadcast(tgt))
    else:
        rates = totals.withColumn("_target", F.lit(int(target_tokens)).cast("bigint"))
    rates = rates.withColumn(
        "sample_rate", F.least(F.lit(1.0), F.col("_target") / F.col("_source_tokens"))
    ).select(source_col, "sample_rate")
    u = uniform_from_id(F.col(id_col))
    return docs.join(F.broadcast(rates), source_col).withColumn(
        "sampled", u < F.col("sample_rate")
    )
