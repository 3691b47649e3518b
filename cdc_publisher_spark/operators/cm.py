"""Count-min sketch primitives (Cormode & Muthukrishnan 2005).

Shared by the batch heavy-hitters query (queries/llm_select.py
q_k57_countmin_heavy_hitters) and the streaming monitor
(streaming/cm_monitor.py), so both engines hash values into the SAME
d×w counter table — the stream's accumulated cells equal the one-shot
batch cells over the same rows, pytest-pinned.

Sketch shape: the counter table is ``CM_DEPTH × CM_WIDTH`` cells
regardless of corpus size, built by ONE partial+final aggregate over
(row, md5-salted bucket) pairs — Spark's map-side combine IS the
sketch merge, so the shuffle is bounded by d×w per partition however
many tokens flow through. Point estimates take the min over the d row
counters, with the one-sided guarantee est ≥ true.

md5 (not xxhash64) for the bucket hash so DuckDB reproduces the
identical bucket from the same bytes — q_k57 stays oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 256


def md5_bucket(g: Column, salt: str, width: int) -> Column:
    """Deterministic bucket in [0, width): first 32 bits of md5(salt||g)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), g)), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(width)
    )


def _bucket(value: Column) -> Column:
    return md5_bucket(
        F.concat(F.lit("cm"), F.col("r").cast("string"), value), "", CM_WIDTH
    )


def cm_cells(
    values: DataFrame, value_col: str = "g", group_cols: list[str] | None = None
) -> DataFrame:
    """(r, b, cnt) counter cells over ``values`` — the sketch build.
    ``group_cols`` prefix the cell key for per-group (e.g. per-time-
    window) sketches: state stays O(groups × d × w), never O(values).
    """
    gcols = list(group_cols or [])
    spark = values.sparkSession
    rows = spark.range(CM_DEPTH).select(F.col("id").alias("r"))
    return (
        values.crossJoin(F.broadcast(rows))
        .select(*gcols, "r", _bucket(F.col(value_col)).alias("b"))
        .groupBy(*gcols, "r", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(cells: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge cell deltas: counter-wise sum (the sketch's merge operator
    — associative and commutative but NOT idempotent, so callers must
    count each delta exactly once; the batch-addressed overwrite in
    streaming/state.py is what makes that safe under replay)."""
    gcols = list(group_cols or [])
    return (
        cells.groupBy(*gcols, "r", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cm_point_estimates(
    cells: DataFrame,
    probes: DataFrame,
    value_col: str = "g",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``probes`` (one row per value to estimate, plus any group cols)
    joined against the d matching cells; returns the probe columns +
    ``cm_est`` = min over the d counters. The cell table is SPARSE
    (only touched buckets have rows), so the join is a left join with
    an absent cell counting as 0 — a probe value whose buckets the
    sketch never touched estimates 0, preserving the one-sided
    guarantee est ≥ true for unseen values too."""
    gcols = list(group_cols or [])
    spark = probes.sparkSession
    rows = spark.range(CM_DEPTH).select(F.col("id").alias("r"))
    pcols = probes.columns
    probed = (
        probes.crossJoin(F.broadcast(rows))
        .withColumn("b", _bucket(F.col(value_col)))
    )
    return (
        probed.join(cells, gcols + ["r", "b"], "left")
        .groupBy(*pcols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cm_est"))
    )


__all__ = ["CM_DEPTH", "CM_WIDTH", "cm_cells", "cm_merge", "cm_point_estimates", "md5_bucket"]
