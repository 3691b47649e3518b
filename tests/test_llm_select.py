"""Semantic tests for the round-4 data-selection operators
(queries/llm_select.py): DSIR importance resampling and the count-min
sketch. Cross-engine exactness is covered by test_oracle_queries.py;
these pin the *meaning* — DSIR must prefer target-like raw docs, the
count-min estimate must be one-sided."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_publisher_spark.queries.llm_select import (
    DSIR_KEEP,
    DSIR_TARGET,
    q_k54_dsir_importance,
    q_k57_countmin_heavy_hitters,
)


@pytest.fixture(scope="module")
def tiny_corpus_dir(spark, tmp_path_factory):
    """documents.parquet where half the raw pool shares the target's
    vocabulary and half is disjoint gibberish."""
    d = tmp_path_factory.mktemp("dsir")
    rows = []
    target_text = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(20):  # target pool
        rows.append((i, target_text, "en", DSIR_TARGET, len(target_text)))
    for i in range(20, 40):  # target-like raw docs
        rows.append((i, "alpha beta gamma delta iota kappa", "en", "src1", 30))
    for i in range(40, 60):  # disjoint raw docs
        rows.append((i, "zzz yyy xxx www vvv uuu", "en", "src2", 23))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_dsir_prefers_target_like_docs(spark, tiny_corpus_dir):
    out = q_k54_dsir_importance(spark, tiny_corpus_dir).collect()
    assert 0 < len(out) <= DSIR_KEEP
    # target pool never appears in the selected set
    assert all(r.source != DSIR_TARGET for r in out)
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.dsir_score)
    # every target-vocabulary doc outscores every disjoint-vocabulary doc
    assert min(by_src["src1"]) > max(by_src["src2"])


def test_dsir_scores_descend_and_raw_only(spark, sf_oracle):
    out = q_k54_dsir_importance(spark, sf_oracle).collect()
    assert len(out) == DSIR_KEEP
    assert all(r.source != DSIR_TARGET for r in out)
    scores = [r.dsir_score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_countmin_is_one_sided(spark, sf_oracle):
    out = q_k57_countmin_heavy_hitters(spark, sf_oracle)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.overestimate_ok for r in rows)
    assert all(r.cm_est >= r.true_c for r in rows)


def test_countmin_top_tokens_match_exact_counts(spark, sf_oracle):
    from cdc_publisher_spark.functions.text import words
    from cdc_publisher_spark.tables import load

    docs = load(spark, sf_oracle, "documents")
    exact = (
        docs.select(F.explode(words(F.col("text"))).alias("g"))
        .groupBy("g")
        .count()
        .orderBy(F.col("count").desc(), F.col("g").asc())
        .limit(20)
        .collect()
    )
    got = {r.token: r.true_c for r in q_k57_countmin_heavy_hitters(spark, sf_oracle).collect()}
    assert {r.g: r["count"] for r in exact} == got
