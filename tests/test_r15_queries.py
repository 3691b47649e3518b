"""Hand-pins for the round-15 registry additions (q_k125..q_k128):
tiny constructed corpora with hand-computable answers, independent of
both engines (the DuckDB cross-check runs separately in
tests/test_oracle_queries.py)."""

from __future__ import annotations

import os

from cdc_publisher_spark.queries.llm_cluster import q_k127_cluster_purity
from cdc_publisher_spark.queries.llm_ml import (
    q_k125_participation_ratio,
    q_k128_norm_outlier_screen,
)
from cdc_publisher_spark.queries.llm_prep import q_k126_dedup_keeper_policy

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


# ---------------------------------------------------------------- q_k125


def test_k125_axis_line_isotropic_and_degenerate(spark, tmp_path):
    """Label 0 = all variance on one axis -> eff_dim exactly 1; label
    1 = +/-e_i over 4 axes, equal variance 0.25 each -> eff_dim
    exactly 4; label 2 = all-zero vectors -> NULL (the q_k120 guard
    class, from birth)."""
    rows = [
        # label 0: values +/-1, +/-2 on dim 0 -> var = 2.5, others 0
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [-1.0, 0.0, 0.0, 0.0], 0),
        (3, [2.0, 0.0, 0.0, 0.0], 0),
        (4, [-2.0, 0.0, 0.0, 0.0], 0),
        # label 2: degenerate
        (30, [0.0, 0.0, 0.0, 0.0], 2),
        (31, [0.0, 0.0, 0.0, 0.0], 2),
    ]
    # label 1: +/-e_i over 4 axes (8 vectors) -> per-dim var = 2/8 = 0.25
    rows += [
        (10 + 2 * i + k, [0.0] * i + [s] + [0.0] * (3 - i), 1)
        for i in range(4)
        for k, s in enumerate((1.0, -1.0))
    ]
    d = _write_vecs(spark, tmp_path, rows)
    out = {r.label: r for r in q_k125_participation_ratio(spark, d).collect()}
    l0, l1, l2 = out[0], out[1], out[2]
    assert (l0.n_vecs, l0.eff_dim, l0.eff_dim_frac) == (4, 1.0, 0.25)
    assert l0.total_var == 2.5 and l0.top_var_frac == 1.0
    assert (l1.n_vecs, l1.eff_dim, l1.eff_dim_frac) == (8, 4.0, 1.0)
    assert l1.total_var == 1.0 and l1.top_var_frac == 0.25
    assert l2.eff_dim is None and l2.eff_dim_frac is None
    assert l2.total_var == 0.0 and l2.top_var_frac is None


# ---------------------------------------------------------------- q_k126


def test_k126_rarity_keeper_repatriates_tokens(spark, tmp_path):
    """One set-fingerprint cluster spanning sources: doc 1 (big source
    sA, 3 tokens) and doc 2 (rare source sB, 4 tokens — same distinct
    word SET, different multiplicity). Baseline keeps doc 1 (min id);
    the rarity policy keeps doc 2 (sB has the smaller corpus token
    mass), moving the cluster's kept mass from sA to sB."""
    rows = [
        (1, "x y z", "sA"),          # fp {x,y,z}, nt=3
        (2, "z y x x", "sB"),        # fp {x,y,z}, nt=4 — same cluster
        (3, "a b c d e f g h", "sA"),  # unique filler: sA mass 3+8=11
        # sB total mass = 4 < 11 -> sB is the rare source
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_k126_dedup_keeper_policy(spark, d).collect()}
    a, b = out["sA"], out["sB"]
    assert (a.n_docs, a.n_tok, a.dup_docs) == (2, 11, 1)
    assert (b.n_docs, b.n_tok, b.dup_docs) == (1, 4, 1)
    # baseline: doc 1 (sA) + filler doc 3 (sA) kept; sB keeps nothing
    assert (a.kept_base, a.tok_kept_base) == (2, 11)
    assert (b.kept_base, b.tok_kept_base) == (0, 0)
    # rarity: the cluster keeper moves to doc 2 (sB)
    assert (a.kept_rarity, a.tok_kept_rarity) == (1, 8)
    assert (b.kept_rarity, b.tok_kept_rarity) == (1, 4)
    assert a.tok_delta == -3 and b.tok_delta == 4


def test_k126_tie_breaks_inside_rare_source_by_min_id(spark, tmp_path):
    """Two copies inside the SAME rare source: the rarity policy must
    fall back to min doc_id among the rare-source members."""
    rows = [
        (1, "x y z", "sA"),
        (5, "z y x", "sB"),
        (4, "x z y", "sB"),
        (9, "a b c d e f g h i j", "sA"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_k126_dedup_keeper_policy(spark, d).collect()}
    # sB mass 6 < sA mass 13 -> keeper is min(4, 5) = doc 4
    assert out["sB"].kept_rarity == 1 and out["sB"].tok_kept_rarity == 3
    assert out["sA"].kept_rarity == 1  # the filler only


# ---------------------------------------------------------------- q_k127


def test_k127_chain_flagged_clean_pair_not(spark, tmp_path):
    """A~B (J=4/6), B~C (J=4/6) but J(A,C)=3/7 < 0.5: one 3-cluster
    held together by transitivity — 2 direct pairs of 3 possible,
    density 2/3, chained. D==E is a complete 2-cluster, J=1, not
    chained. F matches nothing and must not appear."""
    rows = [
        (1, "o p q r s t u", "s0"),   # A: shingles {opq,pqr,qrs,rst,stu}
        (2, "p q r s t u v", "s0"),   # B: {pqr,qrs,rst,stu,tuv}
        (3, "q r s t u v w", "s0"),   # C: {qrs,rst,stu,tuv,uvw}
        (4, "m m m m m m n", "s1"),   # D
        (5, "m m m m m m n", "s1"),   # E = D verbatim -> J = 1
        (6, "z1 z2 z3 z4 z5", "s1"),  # F: isolated
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.cluster_id: r for r in q_k127_cluster_purity(spark, d).collect()}
    assert set(out) == {1, 4}
    chain = out[1]
    assert (chain.csize, chain.n_direct_pairs, chain.possible_pairs) == (3, 2, 3)
    assert chain.edge_density == 0.6667 and chain.chained
    assert chain.min_jaccard == 0.6667 and chain.mean_jaccard == 0.6667
    clean = out[4]
    assert (clean.csize, clean.n_direct_pairs, clean.possible_pairs) == (2, 1, 1)
    assert clean.edge_density == 1.0 and not clean.chained
    assert clean.min_jaccard == 1.0 and clean.mean_jaccard == 1.0


# ---------------------------------------------------------------- q_k128


def test_k128_fences_zeros_and_degenerate_label(spark, tmp_path):
    """Label 0: four norm-2 vectors + one zero vector -> mean 1.6,
    high fence 3.2 catches nothing, low fence 0.8 catches the zero.
    Label 1: two norm-3 vectors -> fences empty. Label 2: all zero ->
    mean 0, fences strict so fracs are exactly 0 (no 0/0 anywhere)."""
    rows = [
        *[(i, [2.0, 0.0, 0.0, 0.0], 0) for i in range(1, 5)],
        (5, [0.0, 0.0, 0.0, 0.0], 0),
        (10, [3.0, 0.0, 0.0, 0.0], 1),
        (11, [0.0, 3.0, 0.0, 0.0], 1),
        (20, [0.0, 0.0, 0.0, 0.0], 2),
        (21, [0.0, 0.0, 0.0, 0.0], 2),
    ]
    d = _write_vecs(spark, tmp_path, rows)
    out = {r.label: r for r in q_k128_norm_outlier_screen(spark, d).collect()}
    l0 = out[0]
    assert (l0.n_vecs, l0.n_zero) == (5, 1)
    assert l0.mean_norm == 1.6 and (l0.min_norm, l0.max_norm) == (0.0, 2.0)
    assert l0.frac_high == 0.0 and l0.frac_low == 0.2
    l1 = out[1]
    assert (l1.n_vecs, l1.n_zero) == (2, 0)
    assert l1.mean_norm == 3.0 and l1.frac_high == 0.0 and l1.frac_low == 0.0
    l2 = out[2]
    assert (l2.n_vecs, l2.n_zero) == (2, 2)
    assert l2.mean_norm == 0.0
    assert l2.frac_high == 0.0 and l2.frac_low == 0.0
