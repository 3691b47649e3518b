"""Hand-computed pins for the round-10 K additions (k94/k95/k96).

The oracle sweep (tests/test_oracle_queries.py) proves Spark==DuckDB on
the fixture; these tests pin the SEMANTICS against constructed corpora
where the right answer is known by hand — identical sources have JSD 0,
a doc made of one repeated block is 100% duplicate paragraphs, a
subset-source has containment exactly 1.0.
"""

from __future__ import annotations

import math

from cdc_publisher_spark.registry import all_specs


def _mini_corpus(spark, tmp_path, rows):
    """Write a documents.parquet the queries' load() can read."""
    sf = str(tmp_path / "mini")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_k94_jsd_zero_for_identical_and_near_ln2_for_disjoint(spark, tmp_path):
    same = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight"
    sf = _mini_corpus(
        spark,
        tmp_path,
        [(same, "sA"), (same, "sB"), (other, "sC")],
    )
    rows = {
        (r.s1, r.s2): r.jsd
        for r in all_specs()["q_k94_source_token_jsd"].spark(spark, sf).collect()
    }
    assert rows[("sA", "sB")] == 0.0  # identical distributions
    # fully disjoint vocabularies: JSD = ln 2 exactly (every bucket is
    # one-sided unless two words hash-collide across the 128 cells —
    # with 16 distinct words the clean value is overwhelmingly likely,
    # and any collision only LOWERS it, so pin a tight band)
    # 8dp per-bucket rounding can land a hair above ln 2 (0.69314718...)
    assert 0.6 <= rows[("sA", "sC")] <= math.log(2) + 1e-6
    assert rows[("sA", "sC")] == rows[("sB", "sC")]  # sA == sB content


def test_k95_duplicate_paragraph_counts_by_hand(spark, tmp_path):
    block = "w1 w2 w3 w4 w5 w6 w7 w8"
    uniq = "u1 u2 u3 u4 u5 u6 u7 u8"
    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            (f"{block} {block} {block}", "s"),  # 3 blocks, all one value
            (f"{block} {uniq}", "s"),  # 2 blocks, both unique
            ("short text only", "s"),  # < 8 tokens: no blocks, no row
            (f"{block} {uniq} {block} tail1 tail2", "s"),  # dup pair + 1;
            # the 2-token tail is dropped (partial block)
        ],
    )
    got = {
        r.doc_id: (r.n_paras, r.n_distinct, r.n_dup, r.keep)
        for r in all_specs()["q_k95_duplicate_paragraph_fraction"]
        .spark(spark, sf)
        .collect()
    }
    assert got == {
        0: (3, 1, 3, False),  # 3/3 duplicated > 30%
        1: (2, 2, 0, True),
        3: (3, 2, 2, False),  # 2/3 duplicated > 30%
    }


def test_k96_subset_source_has_containment_one(spark, tmp_path):
    big = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
    small = "a1 a2 a3 a4 a5 a6"  # shingles are a strict subset of big's
    sf = _mini_corpus(spark, tmp_path, [(big, "sBig"), (small, "sSmall")])
    (row,) = all_specs()["q_k96_containment_sketch"].spark(spark, sf).collect()
    assert (row.s1, row.s2) == ("sBig", "sSmall")
    # directed semantics: ALL of small's shingles are in big (c21 = 1),
    # only some of big's are in small — and with < K shingles per side
    # the sketches are complete, so the estimates are exact too
    assert row.exact_c21 == 1.0 and row.est_c21 == 1.0
    assert row.exact_c12 == round(4 / 10, 4) == row.est_c12
    assert row.err12_ok and row.err21_ok


def test_k96_fixture_estimates_within_declared_tolerance(spark, sf_smoke):
    rows = (
        all_specs()["q_k96_containment_sketch"].spark(spark, sf_smoke).collect()
    )
    assert rows, "no source pairs at smoke scale"
    assert all(r.err12_ok and r.err21_ok for r in rows)


def test_k97_reformatted_copy_is_caught(spark, tmp_path):
    """A train doc that is a bench doc reformatted (case, accents,
    whitespace) must flag as contaminated; a genuinely new doc must
    not. Doc ids are chosen by computing the same md5 draw the query
    uses, so the bench/train assignment is known by construction."""
    import hashlib

    def u(doc_id: int) -> float:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32

    bench_id = next(i for i in range(1000) if u(i) < 0.1)
    t1, t2 = [i for i in range(1000) if u(i) >= 0.1][:2]

    sf = str(tmp_path / "mini97")
    rows = [
        (bench_id, "the quick brown fox jumps over dogs", "sA"),
        (t1, "  The  QUICK  brown fox jumps over dogs ", "sA"),  # reformat
        (t2, "a completely different training document", "sA"),
    ]
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    (row,) = (
        all_specs()["q_k97_normalized_exact_decontam"].spark(spark, sf).collect()
    )
    assert (row.source, row.n_train, row.n_contaminated, row.n_clean) == (
        "sA", 2, 1, 1,
    )
