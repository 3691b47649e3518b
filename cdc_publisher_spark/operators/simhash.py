"""SimHash near-duplicate detection (SURVEY.md §2.2 K-2 variant).

64-bit SimHash over word tokens: each token votes its hash bits
(+weight for 1, -weight for 0); the fingerprint takes the sign of each
bit's vote. Near-duplicates = fingerprints within Hamming distance d.

Spark shape: explode to (doc, token, weight) and compute all 64 bit
votes in ONE hash aggregate (64 conditional sums) — linear scan, one
shuffle of O(doc) rows. Candidate search uses the pigeonhole banding
trick: split 64 bits into (d+1) bands; any pair within distance d
agrees exactly on >= 1 band, so an equi-join per band finds all true
pairs without doc×doc comparison. Exact Hamming verify runs on the
candidates only (bit_count is a built-in).

Pure Python twin: :func:`simhash64_py` (property-tested equal).
"""

from __future__ import annotations

import ctypes

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import cdc_publisher_spark.functions.text as TX

N_BITS = 64


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash bigint) via one explode + one 64-vote aggregate.
    Token weight = occurrence count (explode keeps duplicates)."""
    toks = docs.select(F.col(id_col), F.explode(TX.words(F.col(text_col))).alias("w"))
    h = F.xxhash64(F.col("w"))
    votes = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
            f"v{i}"
        )
        for i in range(N_BITS)
    ]
    voted = toks.groupBy(id_col).agg(*votes)
    fingerprint = None
    for i in range(N_BITS):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseXOR(term)
    return voted.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """(d1, d2, hamming) for pairs within ``max_hamming`` bits."""
    fp = simhash_fingerprints(docs, id_col, text_col)
    n_bands = max_hamming + 1
    width = N_BITS // n_bands
    extras = N_BITS % n_bands

    def band_expr(col, b: int):
        # band b covers [start, start+w) bits; early bands absorb extras
        start = b * width + min(b, extras)
        w = width + (1 if b < extras else 0)
        mask = (1 << w) - 1
        return F.shiftright(col, start).bitwiseAND(F.lit(mask))

    banded = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_expr(F.col("simhash"), b).alias("bh"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    ).select(id_col, "simhash", "bucket.band", "bucket.bh")

    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            F.col("a.simhash").alias("f1"),
            F.col("b.simhash").alias("f2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("f1").bitwiseXOR(F.col("f2")))
    return (
        cands.select("d1", "d2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# --- pure-Python twin (property-test oracle) --------------------------

_XXHASH_SPARK = None


def _spark_xxhash64_fn(spark):
    """Spark's xxhash64 via a tiny lookup query — used only in tests to
    keep the Python twin bit-identical without reimplementing xxhash."""

    def h(word: str) -> int:
        df = spark.createDataFrame([(word,)], "w string")
        return df.select(F.xxhash64("w").alias("h")).collect()[0]["h"]

    return h


def simhash64_py(token_hashes: list[int], weights: list[int] | None = None) -> int:
    """Reference SimHash over pre-hashed tokens (signed 64-bit ints,
    e.g. from Spark's xxhash64)."""
    weights = weights or [1] * len(token_hashes)
    votes = [0] * N_BITS
    for th, w in zip(token_hashes, weights):
        u = ctypes.c_uint64(th).value
        for i in range(N_BITS):
            votes[i] += w if (u >> i) & 1 else -w
    out = 0
    for i in range(N_BITS):
        if votes[i] > 0:
            out |= 1 << i
    return ctypes.c_int64(out).value
