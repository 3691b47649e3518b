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
