"""Semantic + engine-portability tests for the round-6 sketch family
(q_k81..q_k86, queries/llm_sketch.py).

The oracle suite already proves Spark == DuckDB on the full outputs;
these tests pin the SKETCH CONTRACTS themselves — the invariants a
user relies on when the exact audit twin is too expensive to run:
Bloom one-sidedness, HLL error bounds, HDR bucket containment, and
the bit-arithmetic shared between both engines.
"""

from __future__ import annotations

import duckdb
import pytest

from cdc_publisher_spark.queries.llm_sketch import (
    HDR_SIG_BITS,
    HLL_M,
    HLL_RHO_MAX,
    _bitlen_case,
)
from cdc_publisher_spark.registry import all_specs


def _run(spark, sf, name):
    return all_specs()[name].spark(spark, sf)


# --------------------------------------------------------------------------
# shared integer bit arithmetic: the generated CASE must equal
# int.bit_length() in BOTH engines (it is the only piece of "math"
# the sketches share as literal SQL text)
# --------------------------------------------------------------------------
EDGE_VALUES = sorted(
    {0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 31, 63, 64, 127, 255, 4095, 4096}
    | {(1 << k) - 1 for k in range(1, 25)}
    | {1 << k for k in range(24)}
    | {(1 << 24) - 1, 12345, 987654, 16777215}
)


def test_bitlen_case_matches_python_in_duckdb():
    con = duckdb.connect()
    vals = ",".join(f"({v})" for v in EDGE_VALUES)
    rows = con.execute(
        f"SELECT rest, {_bitlen_case('rest', 24)} AS bl FROM (VALUES {vals}) t(rest)"
    ).fetchall()
    for v, bl in rows:
        assert bl == int(v).bit_length(), v


def test_bitlen_case_matches_python_in_spark(spark):
    df = spark.createDataFrame([(v,) for v in EDGE_VALUES], "rest long")
    from pyspark.sql import functions as F

    rows = df.select("rest", F.expr(_bitlen_case("rest", 24)).alias("bl")).collect()
    for r in rows:
        assert r.bl == int(r.rest).bit_length(), r.rest


# --------------------------------------------------------------------------
# HDR bucket geometry: pure-Python mirror of the SQL bucketing; the
# containment + relative-width contract must hold for every n
# --------------------------------------------------------------------------
def _hdr_bucket(n: int) -> tuple[int, int, int]:
    if n < 8:
        return n, n, n
    eb = n.bit_length()
    shift = eb - HDR_SIG_BITS
    sub = n >> shift
    return eb * 8 + sub, sub << shift, ((sub + 1) << shift) - 1


@pytest.mark.parametrize("n", EDGE_VALUES + [5, 6, 100, 1000, 65537])
def test_hdr_bucket_contains_value_with_bounded_width(n):
    bid, lo, hi = _hdr_bucket(n)
    assert lo <= n <= hi
    # relative width contract: hi - lo < lo * 2^-(sig_bits - 1)
    if n >= 8:
        assert (hi - lo + 1) * (1 << (HDR_SIG_BITS)) <= 2 * lo
    # bucket ids are monotone in n (needed for the cumulative read-off)


def test_hdr_bucket_ids_monotone():
    prev = -1
    for n in range(0, 5000):
        bid, _, _ = _hdr_bucket(n)
        assert bid >= prev
        prev = bid


# --------------------------------------------------------------------------
# end-to-end sketch contracts at smoke scale
# --------------------------------------------------------------------------
def test_k84_hll_error_within_bound_and_integer_core(spark, sf_smoke):
    rows = _run(spark, sf_smoke, "q_k84_hll_distinct_shingles").collect()
    assert rows
    for r in rows:
        assert r.err_ok, (r.source, r.rel_err)
        # harmonic core: every register contributes at least 2^0 and at
        # most 2^25; zero registers contribute exactly 2^25 each
        assert r.harmonic_z >= r.n_zero_registers * (1 << HLL_RHO_MAX)
        assert r.harmonic_z <= HLL_M * (1 << HLL_RHO_MAX)
        assert 0 <= r.n_zero_registers <= HLL_M


def test_k85_quantiles_in_bucket_and_monotone(spark, sf_smoke):
    rows = _run(spark, sf_smoke, "q_k85_hdr_quantile_sketch").collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        assert r.in_bucket, (r.source, r.p)
        assert r.est_lo <= r.exact_q <= r.est_hi
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r.p)
        assert [r.p for r in rs] == [0.5, 0.9, 0.99]
        # quantile estimates must be monotone in p
        assert rs[0].est_lo <= rs[1].est_lo <= rs[2].est_lo, src
        assert rs[0].exact_q <= rs[1].exact_q <= rs[2].exact_q, src


def test_k86_calibration_is_tight_at_high_jaccard(spark, sf_smoke):
    rows = _run(spark, sf_smoke, "q_k86_minhash_calibration").collect()
    assert rows
    for r in rows:
        assert r.well_calibrated, (r.decile, r.mean_abs_err)
        assert 0 <= r.decile <= 9
        assert r.n_pairs >= 1
    # LSH banding (8x2) makes high-J pairs near-certain candidates: the
    # top decile must be present and its estimate must track exactly
    top = max(rows, key=lambda r: r.decile)
    assert top.decile == 9
    assert abs(top.mean_est - top.mean_exact) <= 0.1


# --------------------------------------------------------------------------
# q_k83 exact audit at >64 sources (VERDICT r6 ask #3): the old
# single-bigint source bitmap silently corrupted past 64 sources and
# for non-srcN names; the self-join audit must be exact for both.
# --------------------------------------------------------------------------
def test_k83_exact_audit_survives_70_sources_and_arbitrary_names(
    spark, tmp_path_factory
):
    import os

    from pyspark.sql import functions as F

    # 70 sources with engineered overlap: every source shares the
    # 5-token "common c0..c4" run (3 common trigrams); source i adds
    # 7 private tokens (5 private trigrams + 2 bridge trigrams).
    # Exact per-pair Jaccard is the same closed form for ALL pairs:
    # |A∩B| = 3, |A| = |B| = 10  =>  J = 3 / 17.
    n_src = 70
    rows = []
    for i in range(n_src):
        name = f"weird name-{i}!" if i % 2 else f"Quelle_{i}"
        text = " ".join(["common", "c0", "c1", "c2", "c3"] + [f"p{i}_{j}" for j in range(7)])
        rows.append((i, text, "en", name, len(text)))
    d = str(tmp_path_factory.mktemp("k83wide"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    out = _run(spark, d, "q_k83_kmv_source_overlap")
    rows_out = out.collect()
    assert len(rows_out) == n_src * (n_src - 1) // 2
    want = round(3 / 17, 4)
    assert all(r.exact_jaccard == want for r in rows_out), sorted(
        {r.exact_jaccard for r in rows_out}
    )[:5]
    # the KMV estimate side is name-agnostic too and within its bound
    assert all(r.err_ok for r in rows_out)
