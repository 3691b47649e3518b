"""Semantic pins for the K-88/K-89 risk audits (hand-computed
fixtures — the DuckDB hash equivalence itself rides the registry-wide
sweep in test_oracle_queries.py)."""

import math
import os

import pytest

from cdc_publisher_spark.queries.llm_risk import (
    q_k88_rare_gram_exposure,
    q_k89_label_centroid_drift,
)


@pytest.fixture(scope="module")
def risk_docs_dir(spark, tmp_path_factory):
    """Three-source corpus with fully hand-countable 5-gram structure:

    - srcA doc 1 and srcB doc 2 are IDENTICAL 6-word texts → each of
      their two 5-grams has corpus df=2 (rare, not unique).
    - srcA doc 3 is a disjoint 5-word text → its single 5-gram has
      df=1 (unique).
    - srcC doc 4 has 4 words → no 5-grams at all, so srcC is absent
      from the output.
    """
    d = tmp_path_factory.mktemp("riskdocs")
    shared = "a b c d e f"  # 5-grams: "a b c d e", "b c d e f"
    rows = [
        (1, shared, "en", "srcA", len(shared)),
        (2, shared, "en", "srcB", len(shared)),
        (3, "p q r s t", "en", "srcA", 9),  # one unique 5-gram
        (4, "w x y z", "en", "srcC", 7),  # too short for any 5-gram
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def test_rare_gram_exposure_hand_counts(spark, risk_docs_dir):
    out = {r.source: r for r in q_k88_rare_gram_exposure(spark, risk_docs_dir).collect()}
    assert sorted(out) == ["srcA", "srcB"]  # srcC has no grams
    a, b = out["srcA"], out["srcB"]
    # srcA: 2 shared grams (df=2) + 1 unique gram (df=1)
    assert (a.n_grams, a.n_unique, a.n_rare) == (3, 1, 3)
    assert a.unique_frac == round(1 / 3, 4)
    # srcB: only the 2 shared grams — rare but not unique
    assert (b.n_grams, b.n_unique, b.n_rare) == (2, 0, 2)
    assert b.unique_frac == 0.0


def test_rare_gram_exposure_invariants_on_fixture(spark, sf_smoke):
    """Structural invariants at any corpus: unique ⊆ rare ⊆ all grams,
    and a df=1 gram belongs to exactly one source, so the per-source
    unique counts sum to the corpus-wide df=1 gram count."""
    rows = q_k88_rare_gram_exposure(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_unique <= r.n_rare <= r.n_grams
        assert r.unique_frac == round(r.n_unique / r.n_grams, 4)
    # independent corpus-wide df=1 count
    from pyspark.sql import functions as F

    from cdc_publisher_spark.functions import text as TX
    from cdc_publisher_spark.tables import load

    docs = load(spark, sf_smoke, "documents")
    sh = TX.shingle_rows(docs, "doc_id", "text", 5)
    uniq = sh.groupBy("s").count().filter(F.col("count") == 1).count()
    assert sum(r.n_unique for r in rows) == uniq


@pytest.fixture(scope="module")
def drift_vecs_dir(spark, tmp_path_factory):
    """Two labels with geometrically obvious centroids: label 0 vectors
    point along +x, label 1 along +y, so the global sum vector is the
    diagonal and each label's drift cosine is cos(45°) ≈ 0.707107."""
    d = tmp_path_factory.mktemp("driftvecs")
    rows = [
        (1, [2.0, 0.0], 0),
        (2, [4.0, 0.0], 0),
        (3, [0.0, 2.0], 1),
        (4, [0.0, 4.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "embeddings.parquet")
    )
    return str(d)


def test_label_centroid_drift_geometry(spark, drift_vecs_dir):
    out = {r.label: r for r in q_k89_label_centroid_drift(spark, drift_vecs_dir).collect()}
    assert sorted(out) == [0, 1]
    for lbl in (0, 1):
        r = out[lbl]
        assert r.n_vecs == 2
        # sum vectors: (6,0) and (0,6); global (6,6) → cos = 1/sqrt(2)
        assert r.drift_cos == round(1 / math.sqrt(2), 6)
        # centroid = sum/2 → norm 3
        assert r.centroid_l2 == 3.0


@pytest.fixture(scope="module")
def growth_docs_dir(spark, tmp_path_factory):
    """Two sources with hand-derivable growth shapes:

    - srcNat: every document introduces entirely fresh words, so
      cumulative vocab == cumulative tokens at every point — the
      log-log points lie EXACTLY on y = x and the OLS slope is 1.
    - srcTpl: doc 1 introduces 4 words; docs 2-4 repeat the same 4
      words verbatim — vocabulary saturates after the first doc, so
      beta is far below srcNat's.
    """
    d = tmp_path_factory.mktemp("growthdocs")
    rows = []
    for i in range(4):
        fresh = " ".join(f"n{i}_{j}" for j in range(4))
        rows.append((10 + i, fresh, "en", "srcNat", len(fresh)))
        rows.append((20 + i, "t0 t1 t2 t3", "en", "srcTpl", 11))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def test_heaps_growth_separates_fresh_from_templated(spark, growth_docs_dir):
    from cdc_publisher_spark.queries.llm_risk import q_k90_heaps_vocab_growth

    out = {r.source: r for r in q_k90_heaps_vocab_growth(spark, growth_docs_dir).collect()}
    nat, tpl = out["srcNat"], out["srcTpl"]
    assert (nat.n_docs, nat.total_tokens, nat.vocab_size) == (4, 16, 16)
    assert (tpl.n_docs, tpl.total_tokens, tpl.vocab_size) == (4, 16, 4)
    # all-fresh: V(N) == N, slope exactly 1 on the log-log grid
    assert nat.heaps_beta == 1.0
    # saturated vocabulary: V flat after doc 1 while N keeps growing —
    # the slope collapses (exact value: OLS over (ln 4k, ln 4) points,
    # y constant => beta == 0)
    assert tpl.heaps_beta == 0.0


def test_heaps_growth_invariants_on_fixture(spark, sf_smoke):
    """On the synthetic corpus: 0 <= beta <= 1 (vocab can't grow
    faster than tokens, and the fixture's generator draws from a tiny
    word pool, so saturation — beta rounding to 0 — is the EXPECTED
    templated-text reading, exactly what the screen flags), and
    vocab_size <= total_tokens."""
    from cdc_publisher_spark.queries.llm_risk import q_k90_heaps_vocab_growth

    rows = q_k90_heaps_vocab_growth(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.heaps_beta <= 1.0, r
        assert 0 < r.vocab_size <= r.total_tokens, r


@pytest.fixture(scope="module")
def qi_docs_dir(spark, tmp_path_factory):
    """Hand-countable k-anonymity ladder:

    - srcSafe: four docs, two langs x two docs each, identical
      n_chars within each lang pair → every class has k=2 at EVERY
      width → min_safe_width = 16, zero singletons everywhere.
    - srcRisk: two docs in the same lang whose lengths (10 vs 500)
      only share a bucket at width 1024 (10//1024 == 500//1024 == 0)
      → singletons at 16/64/256, safe only at 1024.
    - srcBad: one doc — a singleton at every width, min_safe_width -1.
    """
    d = tmp_path_factory.mktemp("qidocs")
    rows = [
        (1, "x", "en", "srcSafe", 100), (2, "x", "en", "srcSafe", 100),
        (3, "x", "fr", "srcSafe", 300), (4, "x", "fr", "srcSafe", 300),
        (5, "x", "en", "srcRisk", 10), (6, "x", "en", "srcRisk", 500),
        (7, "x", "en", "srcBad", 42),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def test_quasi_identifier_ladder_hand_counts(spark, qi_docs_dir):
    from cdc_publisher_spark.queries.llm_risk import (
        q_k91_quasi_identifier_kanonymity,
    )

    out = {
        r.source: r
        for r in q_k91_quasi_identifier_kanonymity(spark, qi_docs_dir).collect()
    }
    safe, risk, bad = out["srcSafe"], out["srcRisk"], out["srcBad"]
    assert (safe.singletons_w16, safe.singletons_w64, safe.singletons_w256,
            safe.singletons_w1024) == (0, 0, 0, 0)
    assert safe.min_safe_width == 16 and safe.n_docs == 4
    # 10 vs 500 chars: distinct buckets until width 1024 merges them
    assert (risk.singletons_w16, risk.singletons_w64, risk.singletons_w256,
            risk.singletons_w1024) == (2, 2, 2, 0)
    assert risk.min_safe_width == 1024
    # a lone document can never reach k=2 by generalizing length
    assert (bad.singletons_w16, bad.singletons_w1024) == (1, 1)
    assert bad.min_safe_width == -1


def test_label_frechet_distance_closed_form(spark, tmp_path_factory):
    """Hand-computable cohorts in 2-D: label 0 = {(0,0),(2,0)} (mean
    (1,0), vars (1,0)), label 1 = {(5,0),(5,0)} (mean (5,0), vars 0),
    label 2 = a copy of label 0's distribution. d²(0,1) = 4² mean
    shift + (1+0-2·√0)=1 spread mismatch = 17; d²(0,2) = 0 exactly
    (identical distributions); d²(1,2) mirrors (0,1)."""
    from cdc_publisher_spark.queries.llm_risk import q_k114_label_frechet_distance

    rows = [
        (1, [0.0, 0.0], 0),
        (2, [2.0, 0.0], 0),
        (3, [5.0, 0.0], 1),
        (4, [5.0, 0.0], 1),
        (5, [0.0, 0.0], 2),
        (6, [2.0, 0.0], 2),
    ]
    d = tmp_path_factory.mktemp("frechet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "embeddings.parquet")
    )
    out = {
        (r.label_a, r.label_b): (r.mean_term, r.cov_term, r.frechet_sq)
        for r in q_k114_label_frechet_distance(spark, str(d)).collect()
    }
    assert out == {
        (0, 1): (16.0, 1.0, 17.0),
        (0, 2): (0.0, 0.0, 0.0),
        (1, 2): (16.0, 1.0, 17.0),
    }
