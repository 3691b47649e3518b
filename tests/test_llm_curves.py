"""Hand-computed pins for the round-10 session-2 K additions
(k99/k100/k101).

The oracle sweep (tests/test_oracle_queries.py) proves Spark==DuckDB on
the fixture; these pin the SEMANTICS on constructed corpora where the
right answer is known by hand — exact truncate/pad token algebra, exact
distinct-n counts, and a dup curve where every duplicate's decile and
token mass is chosen in advance.
"""

from __future__ import annotations

from cdc_publisher_spark.registry import all_specs


def _mini_corpus(spark, tmp_path, rows):
    """rows: list of (doc_id, text, source)."""
    sf = str(tmp_path / "mini")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_k99_truncate_and_pad_algebra_by_hand(spark, tmp_path):
    # two docs: 600 tokens and 100 tokens
    long_doc = " ".join(f"w{i}" for i in range(600))
    short_doc = " ".join(f"v{i}" for i in range(100))
    sf = _mini_corpus(spark, tmp_path, [(0, long_doc, "s"), (1, short_doc, "s")])
    out = {
        r.budget: r
        for r in all_specs()["q_k99_context_length_efficiency"]
        .spark(spark, sf)
        .collect()
    }
    b = out[512]
    assert b.n_docs == 2 and b.total_tokens == 700
    # truncate-to-one-sequence: only the 600-token doc exceeds 512
    assert b.n_trunc_docs == 1 and b.trunc_lost_tokens == 600 - 512
    # chunk-and-pad: ceil(600/512)=2 chunks + ceil(100/512)=1
    assert b.n_chunks == 3
    assert b.pad_tokens == (2 * 512 - 600) + (512 - 100)
    big = out[32768]
    assert big.n_trunc_docs == 0 and big.trunc_lost_tokens == 0
    assert big.n_chunks == 2 and big.pad_tokens == 2 * 32768 - 700
    # every budget row sees the same corpus
    assert {r.total_tokens for r in out.values()} == {700}
    assert sorted(out) == [512, 2048, 8192, 32768]


def test_k100_distinct_ngram_counts_by_hand(spark, tmp_path):
    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            (0, "a b a b", "rep"),   # uni: 4 tok/2 types; bi: 3 grams/2 types
            (1, "a b c", "div"),     # all distinct at every order
            (2, "x", "tiny"),        # 1 token: no bigrams, no trigrams
        ],
    )
    out = {
        r.source: r
        for r in all_specs()["q_k100_distinct_ngram_diversity"]
        .spark(spark, sf)
        .collect()
    }
    rep = out["rep"]
    assert (rep.n_uni, rep.v_uni) == (4, 2)
    assert (rep.n_bi, rep.v_bi) == (3, 2)       # "a b","b a","a b"
    assert (rep.n_tri, rep.v_tri) == (2, 2)     # "a b a","b a b"
    div = out["div"]
    assert (div.n_uni, div.v_uni) == (3, 3)
    assert (div.n_bi, div.v_bi) == (2, 2)
    assert (div.n_tri, div.v_tri) == (1, 1)
    tiny = out["tiny"]
    # sources with no n-grams at an order report 0, not a dropped row
    assert (tiny.n_uni, tiny.v_uni) == (1, 1)
    assert (tiny.n_bi, tiny.v_bi) == (0, 0)
    assert (tiny.n_tri, tiny.v_tri) == (0, 0)


def test_k101_dup_curve_places_every_dup_in_its_decile(spark, tmp_path):
    # doc_ids 0..9 -> max_id 9, decile = doc_id*10 div 10 = doc_id itself
    text_a = "t1 t2 t3"          # 3 tokens
    text_b = "u1 u2 u3 u4 u5"    # 5 tokens
    rows = [(i, f"unique{i} x y", "s") for i in range(10)]
    rows[0] = (0, text_a, "s")   # first occurrence of A
    rows[4] = (4, text_a, "s")   # dup of A in decile 4
    rows[5] = (5, text_b, "s")   # first occurrence of B
    rows[9] = (9, text_b, "s")   # dup of B in decile 9
    sf = _mini_corpus(spark, tmp_path, rows)
    out = {
        r.decile: r
        for r in all_specs()["q_k101_dup_pressure_by_ingestion"]
        .spark(spark, sf)
        .collect()
    }
    assert sorted(out) == list(range(10))
    for d, r in out.items():
        assert r.n_docs == 1
        if d == 4:
            assert r.n_dup == 1 and r.dup_tokens == 3 and r.total_tokens == 3
        elif d == 9:
            assert r.n_dup == 1 and r.dup_tokens == 5 and r.total_tokens == 5
        else:
            # first occurrences are NOT duplicates — only later copies
            assert r.n_dup == 0 and r.dup_tokens == 0


def test_k102_boilerplate_prefix_by_hand(spark, tmp_path):
    header = "nav home about contact login search help menu"  # 8 tokens
    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            (0, f"{header} body one two", "web"),    # 11 tokens, shared prefix
            (1, f"{header} other body", "web"),      # 10 tokens, shared prefix
            (2, "a unique opening never repeated anywhere at all plus tail", "web"),
            (3, "short text", "web"),                # < 8 tokens: no prefix row
            (4, f"{header} solo", "clean"),          # same prefix, OTHER source:
            # prefix sharing is within-source — this doc is NOT boilerplate
        ],
    )
    out = {
        r.source: r
        for r in all_specs()["q_k102_boilerplate_prefix"].spark(spark, sf).collect()
    }
    web = out["web"]
    assert web.n_docs == 3            # doc 3 too short to have a prefix
    assert web.n_prefixes == 2        # header-prefix + the unique opening
    assert web.n_boilerplate_docs == 2
    assert web.boilerplate_tokens == 11 + 10
    assert web.total_tokens == 11 + 10 + 10
    clean = out["clean"]
    assert clean.n_boilerplate_docs == 0 and clean.n_docs == 1


def test_k103_temperature_mixing_by_hand(spark, tmp_path):
    # sources with 90 and 10 tokens -> p = .9/.1
    big = " ".join(f"b{i}" for i in range(90))
    small = " ".join(f"s{i}" for i in range(10))
    sf = _mini_corpus(spark, tmp_path, [(0, big, "big"), (1, small, "small")])
    out = {
        (float(r.alpha), r.source): r
        for r in all_specs()["q_k103_temperature_mixing_weights"]
        .spark(spark, sf)
        .collect()
    }
    # alpha=1.0 is the natural-proportion control: w == p, boost == 1
    assert out[(1.0, "big")].weight == 0.9
    assert out[(1.0, "small")].weight == 0.1
    assert out[(1.0, "big")].boost == 1.0
    # alpha=0.5: w_small = sqrt(.1)/(sqrt(.9)+sqrt(.1)) ~ 0.25 — the
    # low-resource source is up-weighted, the big one down-weighted
    import math

    z = math.sqrt(0.9) + math.sqrt(0.1)
    assert abs(out[(0.5, "small")].weight - math.sqrt(0.1) / z) < 1e-7
    assert out[(0.5, "small")].boost > 1.0 > out[(0.5, "big")].boost
    # weights sum to 1 at every alpha
    for a in (0.3, 0.5, 0.7, 1.0):
        s = out[(a, "big")].weight + out[(a, "small")].weight
        assert abs(s - 1.0) < 1e-7


def test_k104_temporal_psi_zero_when_halves_identical(spark, tmp_path):
    # doc_ids 0..3, max=9? no — max=3, half split at doc_id*2 <= 3:
    # docs 0,1 are h1; 2,3 are h2. Same text both halves -> PSI 0.
    same = "alpha beta gamma delta"
    drifted_a = "one one one one one one"
    drifted_b = "two two two two two two"
    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            (0, same, "stable"),
            (1, drifted_a, "drifty"),
            (2, same, "stable"),
            (3, drifted_b, "drifty"),
        ],
    )
    out = {
        r.source: r
        for r in all_specs()["q_k104_temporal_drift_psi"].spark(spark, sf).collect()
    }
    stable = out["stable"]
    assert stable.tokens_h1 == stable.tokens_h2 == 4
    assert stable.psi == 0.0  # identical distributions, exactly
    drifty = out["drifty"]
    # disjoint vocab across halves: strictly positive drift signal
    assert drifty.psi > 0.1
    assert drifty.tokens_h1 == drifty.tokens_h2 == 6


def test_k105_vocab_coverage_by_hand(spark, tmp_path):
    # tf: a:5 b:3 c:1 d:1 -> total 10, types 4; cutoffs cover all here,
    # so pin the CUMULATIVE math with a corpus where ranks matter via
    # the tie-break (c before d alphabetically at tf=1)
    text = "a a a a a b b b c d"
    sf = _mini_corpus(spark, tmp_path, [(0, text, "s")])
    rows = {
        r.v_budget: r
        for r in all_specs()["q_k105_vocab_coverage_curve"].spark(spark, sf).collect()
    }
    for v, r in rows.items():
        assert r.n_types == 4 and r.total_tokens == 10
        assert r.covered_tokens == 10  # every budget >= vocab size
    assert sorted(rows) == [1000, 10000, 100000]


def test_k105_cutoff_below_vocab_counts_top_ranked_only(spark, tmp_path):
    # 1500 types: "xx" appears twice, w0000..w1498 once each. At
    # V=1000 the head is xx (tf 2) + the 999 alphabetically-first
    # singletons (the deterministic tf-desc, word-asc tie-break):
    # covered = 2 + 999.
    singles = [f"w{i:04d}" for i in range(1499)]
    text = "xx xx " + " ".join(singles)
    sf = _mini_corpus(spark, tmp_path, [(0, text, "s")])
    rows = {
        r.v_budget: r
        for r in all_specs()["q_k105_vocab_coverage_curve"].spark(spark, sf).collect()
    }
    assert rows[1000].n_types == 1500 and rows[1000].total_tokens == 1501
    assert rows[1000].covered_tokens == 2 + 999
    assert rows[10000].covered_tokens == 1501  # budget exceeds vocab
