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
