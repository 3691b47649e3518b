"""HyperLogLog distinct-cardinality registers (Flajolet et al. 2007).

The register construction shared by the batch audit query
(queries/llm_sketch.py q_k84) and the streaming monitor
(streaming/hll_monitor.py): a 32-bit md5-derived hash per value, low
8 bits pick one of ``HLL_M = 256`` registers, the remaining 24 bits'
leading-zero rank (an engine-portable generated integer CASE — no
bin()/log2(), whose padding and rounding differ across engines) is
max()-aggregated per register.

Why this shape scales: max() absorbs duplicates, so the register
build needs NO distinct and NO count-distinct shuffle — one linear
scan plus a (group, bucket)-keyed aggregate whose partial+final
combine IS the HLL merge. The register table is O(groups x 256) rows
at any corpus size, and merging two register tables (streaming
batches, partitions, clusters) is the same max() aggregate again —
HLL's merge is associative, commutative, and idempotent, which is
what makes the streaming twin's replay-safety free (see
streaming/hll_monitor.py).

Determinism: the hash is md5-derived so DuckDB reproduces the exact
register bytes (the q_k84 oracle); the harmonic core is an exact
integer (sum of 2^(25-M) — dyadic terms, no float summation); the
only floats are one division and, on the linear-counting branch, one
ln(), both rounded at the query edge per registry.py policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 256  # 2^8 registers; sigma = 1.04/sqrt(m) ~ 6.5%
HLL_RHO_MAX = 25  # 32-bit hash - 8 bucket bits -> rho in [1, 25]
#: alpha_256 from the HLL paper (0.7213 / (1 + 1.079/m)); inlined as the
#: same decimal literal on both engines so the float product is identical.
HLL_ALPHA = repr(0.7213 / (1 + 1.079 / 256))


def bitlen_case(col: str, width: int) -> str:
    """SQL CASE computing bit_length(col) for 0 <= col < 2**width.

    Generated as plain integer comparisons so the SAME text runs in
    Spark SQL and DuckDB with bit-identical results."""
    whens = " ".join(f"WHEN {col} >= {1 << (p - 1)} THEN {p}" for p in range(width, 0, -1))
    return f"(CASE {whens} ELSE 0 END)"


#: rho of the 24 post-bucket bits (column must be named ``rest``).
RHO_SQL = f"({HLL_RHO_MAX} - {bitlen_case('rest', 24)})"


def hll_hash(value: Column) -> Column:
    """Deterministic 32-bit hash of a string value ('hll' salt)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("hll"), value)), 1, 8), 16, 10
    ).cast("bigint")


def hll_registers(
    rows: DataFrame, group_cols: list[str], value_col: str = "s"
) -> DataFrame:
    """(group..., bucket, M) register table from ONE max() aggregate.

    ``rows`` need not be distinct — duplicate values land on the same
    (bucket, rho) and max() absorbs them."""
    h = hll_hash(F.col(value_col))
    buckets = rows.select(
        *group_cols,
        (h % HLL_M).alias("bucket"),
        F.floor(h / HLL_M).cast("bigint").alias("rest"),
    )
    return (
        buckets.select(*group_cols, "bucket", F.expr(RHO_SQL).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register rows from any number of sketches of the same
    geometry (streaming batches, shards): max per (group, bucket)."""
    return regs.groupBy(*group_cols, "bucket").agg(F.max("M").alias("M"))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group estimate from a merged register table.

    Returns (group..., n_zero_registers, harmonic_z, hll_estimate)
    with the exact-integer harmonic core exposed and the standard
    estimator with linear-counting small-range correction. The
    expression tree is kept bit-identical to the q_k84 oracle's."""
    per = (
        regs.select(
            *group_cols,
            F.expr(f"shiftleft(cast(1 as bigint), {HLL_RHO_MAX} - M)").alias("zterm"),
        )
        .groupBy(*group_cols)
        .agg(F.count("*").cast("long").alias("n_present"), F.sum("zterm").alias("z_present"))
    )
    v_zero = (F.lit(HLL_M) - F.col("n_present")).cast("long")
    z = (F.col("z_present") + v_zero * (1 << HLL_RHO_MAX)).cast("long")
    calc = per.select(*group_cols, v_zero.alias("n_zero_registers"), z.alias("harmonic_z"))
    e_raw = (
        F.lit(float(HLL_ALPHA)) * F.lit(float(HLL_M * HLL_M)) * F.lit(float(1 << HLL_RHO_MAX))
        / F.col("harmonic_z")
    )
    e = F.when(
        (e_raw <= 2.5 * HLL_M) & (F.col("n_zero_registers") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("n_zero_registers")),
    ).otherwise(e_raw)
    return calc.select(
        *group_cols, "n_zero_registers", "harmonic_z", e.alias("hll_estimate")
    )
