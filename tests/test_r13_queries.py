"""Hand-pins for the round-13 registry additions (q_k116..q_k120):
tiny constructed corpora with hand-computable answers, independent of
both engines (the DuckDB cross-check runs separately in
tests/test_oracle_queries.py, which parametrizes every registered
query)."""

from __future__ import annotations

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F

from cdc_publisher_spark.queries.llm_audit import q_k120_intrinsic_dimension
from cdc_publisher_spark.queries.llm_cluster import (
    q_k116_dedup_threshold_sensitivity,
)
from cdc_publisher_spark.queries.llm_prep import SHARD_FAN, q_k118_shard_manifest
from cdc_publisher_spark.queries.llm_signals import q_k117_bigram_entropy_rate
from cdc_publisher_spark.queries.llm_sketch import q_k119_lsh_recall_curve

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, d, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], _DOC_SCHEMA
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def _write_vecs(spark, d, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "embeddings.parquet")
    )
    return str(d)


def test_k116_threshold_bins_exact_pair(spark, tmp_path):
    """One exact-dup pair (J=1.0) and one partial pair (J=0.6: shingle
    sets {pqr,qrs,rst,stu} vs {pqr,qrs,rst,stz}) against a distinct
    doc: the 1.0 pair survives every threshold, the 0.6 pair only
    t<=60; drops/tokens follow the keep-min-id convention."""
    rows = [
        (1, "a b c d e f", "s0"),
        (2, "a b c d e f", "s0"),        # J(1,2) = 1.0
        (4, "p q r s t u", "s1"),
        (5, "p q r s t z", "s1"),        # J(4,5) = 3/5 = 0.6
        (9, "m n o m n o", "s2"),        # no shared shingle with others
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        r.threshold_pct: (r.n_pairs, r.n_docs_dropped, r.tokens_dropped)
        for r in q_k116_dedup_threshold_sensitivity(spark, d).collect()
    }
    assert set(out) == set(range(50, 96, 5))
    for t in (50, 55, 60):
        assert out[t] == (2, 2, 12), t   # docs 2 and 5 dropped, 6 tokens each
    for t in (65, 70, 75, 80, 85, 90, 95):
        assert out[t] == (1, 1, 6), t    # only the exact pair survives


def test_k117_deterministic_transitions_have_zero_rate(spark, tmp_path):
    """'a b a b a b' has H(w2|w1) = 0 (after a always b, after b
    always a); 'a a b b' does not — hand values from the counts:
    joint {aa:1, ab:1, bb:1}, contexts {a:2, b:1}."""
    rows = [
        (1, "a b a b a b", "det"),
        (2, "a a b b", "mix"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_k117_bigram_entropy_rate(spark, d).collect()}
    det, mix = out["det"], out["mix"]
    assert (det.n_bigrams, det.n_distinct_bigrams) == (5, 2)
    assert det.entropy_rate == 0.0
    assert (mix.n_bigrams, mix.n_distinct_bigrams) == (3, 3)
    hb = math.log(3)                                   # -3 * (1/3 ln 1/3) / 3
    hc = -(2 * math.log(2 / 3) + 1 * math.log(1 / 3)) / 3
    assert mix.h_bigram == pytest.approx(hb, abs=2e-4)
    assert mix.h_context == pytest.approx(hc, abs=2e-4)
    assert mix.entropy_rate == pytest.approx(hb - hc, abs=2e-4)


def test_k118_manifest_counts_and_md5_assignment(spark, tmp_path):
    """Shard totals partition the corpus; the shard of a specific doc
    equals the md5 draw computed independently here."""
    rows = [(i, "w x y z", f"s{i % 2}") for i in range(1, 41)]
    d = _write_docs(spark, tmp_path, rows)
    out = q_k118_shard_manifest(spark, d).collect()
    assert sum(r.n_docs for r in out) == 40
    assert sum(r.n_tokens for r in out) == 160          # 4 tokens per doc
    assert all(abs(r.load_factor - r.n_docs * SHARD_FAN / 40) < 1e-9 for r in out)

    def shard_of(doc_id: int) -> int:
        return int(hashlib.md5(f"shard{doc_id}".encode()).hexdigest()[:8], 16) % SHARD_FAN

    by_shard = {r.shard: r for r in out}
    for doc_id in (1, 7, 40):
        s = shard_of(doc_id)
        assert by_shard[s].min_doc_id <= doc_id <= by_shard[s].max_doc_id
    # every doc is in exactly one shard: recompute the full histogram
    import collections

    hist = collections.Counter(shard_of(i) for i in range(1, 41))
    assert {r.shard: r.n_docs for r in out} == dict(hist)


def test_k119_recall_curve_finds_planted_dup(spark, tmp_path):
    """A verbatim dup pair lands in decile 9 with recall 1.0; docs
    with zero shingle overlap contribute no truth rows at all."""
    rows = [
        (1, "a b c d e f g h", "s0"),
        (2, "a b c d e f g h", "s0"),    # J = 1.0 -> decile 9
        (3, "p q r s t u v w", "s1"),    # no overlap with 1/2
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.decile: r for r in q_k119_lsh_recall_curve(spark, d).collect()}
    assert set(out) == {9}
    assert (out[9].n_true, out[9].n_nominated, out[9].recall) == (1, 1, 1.0)


def test_k120_twonn_counts_degenerates_and_positive_id(spark, tmp_path):
    """A planted exact-duplicate vector pair makes both copies
    degenerate probes (d1 = 0, excluded and counted); the remaining
    random cloud yields a finite positive estimate per label."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [
        (i, rng.standard_normal(8).astype("float32").tolist(), i % 2)
        for i in range(1, 21)
    ]
    rows.append((21, rows[0][1], rows[0][2]))  # exact copy of vec 1
    d = _write_vecs(spark, tmp_path, rows)
    out = {r.label: r for r in q_k120_intrinsic_dimension(spark, d).collect()}
    # 21 vectors, all probed (<= KNN_PROBES); labels 0 (ids even) / 1 (odd)
    assert sum(r.n_probes for r in out.values()) == 21
    lab = rows[0][2]  # the duplicated pair's label
    assert out[lab].n_probes - out[lab].n_used == 2
    other = 1 - lab
    assert out[other].n_used == out[other].n_probes
    for r in out.values():
        assert r.id_estimate is not None and r.id_estimate > 0
