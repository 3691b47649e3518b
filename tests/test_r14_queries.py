"""Hand-pins for the round-14 registry additions (q_k121..q_k124):
tiny constructed corpora with hand-computable answers, independent of
both engines (the DuckDB cross-check runs separately in
tests/test_oracle_queries.py)."""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import functions as F

from cdc_publisher_spark.queries.llm_audit import (
    EPOCH_BUDGET_MULT,
    EPOCH_CAP,
    q_k121_epoch_allocation,
)
from cdc_publisher_spark.queries.llm_ml import q_k122_quantization_fidelity
from cdc_publisher_spark.queries.llm_prep import (
    NORM_DECON_FRAC,
    q_k123_contamination_severity,
)
from cdc_publisher_spark.queries.llm_signals import q_k124_context_gain_screen

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


def _is_bench(doc_id: int) -> bool:
    """The q_k61/q_k97/q_k123 content-keyed draw, replicated exactly."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:8], 16) / 2**32 < NORM_DECON_FRAC


def test_k121_uniform_split_with_epoch_cap(spark, tmp_path):
    """Two sources, unique masses 2 and 10: B = 3*12 = 36, uniform
    share 18 each; the small source hits the 4-epoch cap (serves 8,
    repeats 6), the big one runs 1.8 epochs (repeats 8)."""
    assert (EPOCH_BUDGET_MULT, EPOCH_CAP) == (3, 4)  # pins assume these
    rows = [(1, "a b", "sA"), (2, "c d e f g h i j k l", "sB")]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_k121_epoch_allocation(spark, d).collect()}
    a, b = out["sA"], out["sB"]
    assert (a.unique_tok, a.req_tok, a.served_tok) == (2, 18, 8)
    assert a.epoch_capped and a.epochs == 4.0 and a.repeated_tok == 6
    assert (b.unique_tok, b.req_tok, b.served_tok) == (10, 18, 18)
    assert not b.epoch_capped and b.epochs == 1.8 and b.repeated_tok == 8


def test_k121_remainder_goes_to_first_sources_by_name(spark, tmp_path):
    """Total 3 tokens -> B = 9, 2 sources: base 4 and the odd token to
    the name-first source."""
    rows = [(1, "a", "s1"), (2, "b c", "s0")]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_k121_epoch_allocation(spark, d).collect()}
    assert out["s0"].req_tok == 5 and out["s1"].req_tok == 4


def test_k122_lossless_and_degenerate_vectors(spark, tmp_path):
    """Vectors whose components are exact multiples of amax/127
    round-trip losslessly (cosine 1.0); the zero vector is degenerate
    (counted, excluded from the means)."""
    lossless0 = [127.0, -64.0, 1.0, 0.0]
    lossless1 = [254.0, 2.0, 0.0, -254.0]  # amax 254, scale 2: exact
    rows = [
        (1, lossless0, 0),
        (2, lossless1, 0),
        (3, [0.0, 0.0, 0.0, 0.0], 1),      # degenerate
        (4, lossless0, 1),
    ]
    d = _write_vecs(spark, tmp_path, rows)
    out = {r.label: r for r in q_k122_quantization_fidelity(spark, d).collect()}
    assert (out[0].n_vecs, out[0].n_degenerate) == (2, 0)
    assert out[0].mean_cos == 1.0 and out[0].min_cos == 1.0
    assert out[0].frac_degraded == 0.0
    assert (out[1].n_vecs, out[1].n_degenerate) == (2, 1)
    assert out[1].mean_cos == 1.0  # the one non-degenerate vector


def test_k122_lossy_vector_scores_below_one(spark, tmp_path):
    """63 components sitting just under half a quantization step all
    round to ZERO (0.0039·127 = 0.4953 -> qi 0), dropping ~0.1% of the
    vector's mass: cosine 1/sqrt(1 + 63·0.0039²) ≈ 0.9995 — visibly
    below 1.0 at the 4dp output precision."""
    rows = [(1, [1.0] + [0.0039] * 63, 0)]
    d = _write_vecs(spark, tmp_path, rows)
    r = q_k122_quantization_fidelity(spark, d).collect()[0]
    assert 0.99 < r.mean_cos < 1.0
    assert r.frac_degraded == 0.0  # above the 0.999 retrieval floor


def test_k123_coverage_deciles(spark, tmp_path):
    """One bench doc half-covered (decile 5), one fully covered
    (decile 9), one too short for a 5-gram (decile -1)."""
    bench_ids = [i for i in range(1, 200) if _is_bench(i)]
    train_ids = [i for i in range(1, 200) if not _is_bench(i)]
    assert len(bench_ids) >= 3 and len(train_ids) >= 2
    half = "a b c d e f"              # grams: "a b c d e", "b c d e f"
    full = "p q r s t"                # one gram, present verbatim in train
    rows = [
        (bench_ids[0], half, "s0"),
        (bench_ids[1], full, "s0"),
        (bench_ids[2], "x y", "s0"),  # no 5-gram
        (train_ids[0], "a b c d e zz", "s1"),   # covers one of half's grams
        (train_ids[1], "p q r s t uu", "s1"),   # covers full verbatim
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.decile: r for r in q_k123_contamination_severity(spark, d).collect()}
    assert set(out) == {-1, 5, 9}
    assert out[-1].n_docs == 1 and out[-1].mean_cov is None
    assert out[5].n_docs == 1 and out[5].mean_cov == 0.5
    assert out[9].n_docs == 1 and out[9].mean_cov == 1.0


def test_k124_alternating_vs_distinct_vs_degenerate(spark, tmp_path):
    """'a b a b a b a b': H_uni = ln 2, perfectly predictable
    transitions given the multiset (H_cond = 0) -> gap = 0.6931,
    bucket 2. Four distinct words: gap = ln 4 = 1.3863, bucket 5.
    A one-token doc has no bigram -> bucket -1."""
    rows = [
        (1, "a b a b a b a b", "s0"),
        (2, "w1 w2 w3 w4", "s1"),
        (3, "solo", "s2"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        (r.source, r.bucket): r
        for r in q_k124_context_gain_screen(spark, d).collect()
    }
    assert set(out) == {("s0", 2), ("s1", 5), ("s2", -1)}
    assert out[("s0", 2)].n_docs == 1 and out[("s0", 2)].tokens == 8
    assert out[("s1", 5)].tokens == 4
    assert out[("s2", -1)].tokens == 1
    # sanity on the hand math the buckets encode
    assert math.floor(round(math.log(2), 4) * 4) == 2
    assert math.floor(round(math.log(4), 4) * 4) == 5
