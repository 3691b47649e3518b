"""Unit semantics for operators/spans.py (duplicate-substring masking)
and operators/quality_filter.py (per-group quantile gate).

The oracle gate (test_oracle_queries) value-checks q_k32/q_k33 against
DuckDB on the real tables; these tests pin the operator semantics on
hand-built corpora where the right answer is computable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.quality_filter import quantile_filter
from cdc_publisher_spark.operators.spans import mask_frequent_ngrams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_mask_covers_every_occurrence_of_frequent_gram(spark):
    # "a b c d" appears in all three docs -> frequent at min_count=3;
    # every token of every occurrence is masked, the rest survives.
    docs = _docs(
        spark,
        [
            (1, "x a b c d y"),
            (2, "a b c d"),
            (3, "p q a b c d"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in mask_frequent_ngrams(docs, n=4, min_count=3).collect()
    }
    assert out[1]["n_masked"] == 4 and out[1]["kept_text"] == "x y"
    assert out[2]["n_masked"] == 4 and out[2]["kept_text"] == ""
    assert out[3]["n_masked"] == 4 and out[3]["kept_text"] == "p q"
    assert out[1]["n_tokens"] == 6


def test_mask_merges_overlapping_occurrences(spark):
    # "a a a a a" contains two overlapping occurrences of the frequent
    # gram "a a a a" (positions 0 and 1) -> the union spans all 5
    # tokens, not 8; no double counting.
    docs = _docs(
        spark,
        [
            (1, "a a a a a"),
            (2, "z a a a a"),
            (3, "a a a a z"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in mask_frequent_ngrams(docs, n=4, min_count=3).collect()
    }
    assert out[1]["n_masked"] == 5 and out[1]["kept_text"] == ""
    assert out[2]["kept_text"] == "z"
    assert out[3]["kept_text"] == "z"


def test_infrequent_grams_survive(spark):
    docs = _docs(
        spark,
        [
            (1, "unique words here only once"),
            (2, "another totally different sentence"),
            (3, "third doc with fresh tokens"),
        ],
    )
    out = mask_frequent_ngrams(docs, n=4, min_count=3).collect()
    assert all(r["n_masked"] == 0 for r in out)
    assert {r["kept_text"] for r in out} == {
        "unique words here only once",
        "another totally different sentence",
        "third doc with fresh tokens",
    }


@pytest.fixture()
def scored(spark):
    # two groups: g1 scores 1..8, g2 scores 10..13
    rows = [("g1", float(i)) for i in range(1, 9)] + [
        ("g2", float(i)) for i in range(10, 14)
    ]
    return spark.createDataFrame(rows, "grp string, score double")


def test_exact_quantile_filter_drops_bottom_quartile(scored):
    kept = quantile_filter(scored, "score", "grp", q=0.25, exact=True)
    got = {(r["grp"], r["score"]) for r in kept.collect()}
    # g1: percent_rank of score s is (s-1)/7 -> keep s >= 2.75 -> {3..8}
    assert {s for g, s in got if g == "g1"} == {3.0, 4.0, 5.0, 6.0, 7.0, 8.0}
    # g2: ranks 0,1/3,2/3,1 -> keep pr >= .25 -> {11,12,13}
    assert {s for g, s in got if g == "g2"} == {11.0, 12.0, 13.0}


def test_approx_path_agrees_away_from_cutoff(scored):
    exact = quantile_filter(scored, "score", "grp", q=0.25, exact=True)
    approx = quantile_filter(scored, "score", "grp", q=0.25, accuracy=10000)
    e = {(r["grp"], r["score"]) for r in exact.collect()}
    a = {(r["grp"], r["score"]) for r in approx.collect()}
    # The two paths may disagree only on rows whose score equals the
    # group's realized threshold neighborhood (one grid step).
    diff = e.symmetric_difference(a)
    thr = {g: min(s for gg, s in e if gg == g) for g in ("g1", "g2")}
    assert all(abs(s - thr[g]) <= 1.0 for g, s in diff)


def test_approx_path_broadcasts_and_never_window_sorts(scored):
    # Scale path: threshold via tiny agg + broadcast join — the plan
    # must contain a broadcast exchange and NO Window operator (the
    # exact path's per-group sort is exactly what this avoids).
    plan = quantile_filter(
        scored, "score", "grp", q=0.25
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "Window" not in plan
