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


# --------------------------------------------------------------------------
# q_k55 / q_k56 semantics
# --------------------------------------------------------------------------


def test_dhash64_deterministic_and_discriminative():
    from cdc_publisher_spark.operators.multimodal import dhash64, synth_ppm_from_text

    a1 = synth_ppm_from_text("alpha beta gamma delta epsilon zeta")
    a2 = synth_ppm_from_text("alpha beta gamma delta epsilon zeta")
    b = synth_ppm_from_text("totally different words entirely here now")
    assert a1 == a2
    ha, hb = dhash64(a1), dhash64(b)
    assert ha == dhash64(a2)
    assert ha != hb
    assert -(1 << 63) <= ha < (1 << 63)  # fits LongType


def test_dhash_small_edit_changes_fewer_bits_than_rewrite():
    from cdc_publisher_spark.operators.multimodal import dhash64, synth_ppm_from_text

    t0 = " ".join(f"w{i}" for i in range(50))
    t1 = " ".join(f"w{i}" if i != 25 else "CHANGED" for i in range(50))
    t2 = " ".join(f"z{i}" for i in range(50))
    h0, h1, h2 = (dhash64(synth_ppm_from_text(t)) for t in (t0, t1, t2))

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(h0, h1) < ham(h0, h2)


# --------------------------------------------------------------------------
# q_k106 semantics: HK-style audio fingerprint (operators/multimodal.py)
# --------------------------------------------------------------------------


def _rebuild_wav(samples, rate):
    import struct

    import numpy as np

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_fp_deterministic_discriminative_and_long():
    from cdc_publisher_spark.operators.multimodal import (
        AUDIO_FP_FRAMES,
        audio_fp_frames,
        synth_wav_from_text,
    )

    t = "alpha beta gamma delta epsilon zeta"
    a1, a2 = (audio_fp_frames(synth_wav_from_text(t)) for _ in range(2))
    b = audio_fp_frames(synth_wav_from_text("totally different words here now"))
    assert a1 == a2 and a1 != b
    assert len(a1) == AUDIO_FP_FRAMES
    assert all(0 <= w < (1 << 32) for w in a1)  # 32-bit words, LongType-safe
    # one-word doc still yields a full fingerprint (tile-salted synth)
    short = audio_fp_frames(synth_wav_from_text("solo"))
    assert len(short) == AUDIO_FP_FRAMES and any(w != 0 for w in short[1:])


def test_audio_fp_perturbation_hamming_smaller_than_rewrite():
    """The HK property the banded join depends on: a small signal
    perturbation (amplitude scale, mild additive noise) moves far
    fewer fingerprint bits than different content — and uniform
    amplitude scaling moves NONE (band-energy DIFFERENCES scale
    together, preserving every sign)."""
    import numpy as np

    from cdc_publisher_spark.operators.multimodal import (
        audio_fp_frames,
        synth_wav_from_text,
        wav_samples,
    )

    def ham(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x, y))

    t = " ".join(f"w{i}" for i in range(40))
    w = synth_wav_from_text(t)
    base = audio_fp_frames(w)
    s, rate, _ = wav_samples(w)
    scaled = audio_fp_frames(_rebuild_wav(s * 0.7, rate))
    rng = np.random.default_rng(7)
    noisy = audio_fp_frames(_rebuild_wav(s + rng.normal(0, 0.01, len(s)), rate))
    other = audio_fp_frames(synth_wav_from_text(" ".join(f"z{i}" for i in range(40))))
    assert ham(base, scaled) == 0
    assert ham(base, noisy) < ham(base, other)
    # the banded lookup finds the noisy near-dup: >=1 frame unchanged
    assert any(a == b for a, b in zip(base, noisy))


def test_audio_candidate_pairs_and_hamming_verify(spark):
    """Spark-side banded join + bit_count(xor) verify: an exact dup
    pair lands at Hamming 0, a noisy near-dup is a candidate with a
    small distance, unrelated clips share no bucket or verify far."""
    import numpy as np

    from cdc_publisher_spark.operators.multimodal import (
        audio_candidate_pairs,
        audio_fingerprint,
        audio_hamming_pairs,
        synth_wav_from_text,
        wav_samples,
    )

    t = " ".join(f"tok{i}" for i in range(40))
    w = synth_wav_from_text(t)
    s, rate, _ = wav_samples(w)
    rng = np.random.default_rng(11)
    payloads = [
        (1, w),
        (2, w),  # exact dup of 1
        (3, _rebuild_wav(s + rng.normal(0, 0.01, len(s)), rate)),  # near-dup
        (4, synth_wav_from_text(" ".join(f"other{i}" for i in range(40)))),
    ]
    media = spark.createDataFrame(payloads, "media_id long, payload binary")
    fp = audio_fingerprint(media).persist()
    try:
        assert fp.count() == 4 * 8
        cands = audio_candidate_pairs(fp)
        ham = {
            (r.d1, r.d2): r.hamming
            for r in audio_hamming_pairs(fp, cands).collect()
        }
        assert ham.get((1, 2)) == 0
        assert (1, 3) in ham and 0 < ham[(1, 3)] < 64
        assert (1, 4) not in ham or ham[(1, 4)] > ham[(1, 3)]
    finally:
        fp.unpersist()


def test_fuzzy_dedup_pairs_respect_threshold(spark, sf_oracle):
    from cdc_publisher_spark.queries.llm_select import (
        FUZZY_SIM,
        q_k56_fuzzy_editdist_dedup,
    )

    rows = q_k56_fuzzy_editdist_dedup(spark, sf_oracle).collect()
    assert rows, "sf0.01 corpus has near-duplicates by construction"
    for r in rows:
        assert r.d1 < r.d2
        assert r.edit_sim >= FUZZY_SIM
        assert r.edit_dist >= 0


def test_matryoshka_recall_bounds(spark, sf_oracle):
    from cdc_publisher_spark.queries.llm_select import (
        MRL_K,
        MRL_QUERIES,
        q_k58_matryoshka_recall,
    )

    rows = q_k58_matryoshka_recall(spark, sf_oracle).collect()
    assert len(rows) == MRL_QUERIES
    for r in rows:
        assert 0 <= r.n_common <= MRL_K
        assert abs(r.recall_at_10 - r.n_common / MRL_K) < 1e-9
    # truncation keeps SOME signal: chance recall@10 over ~480
    # candidates is ~0.02; the synthetic near-random embeddings land
    # ~0.19, so 0.05 separates signal from chance with margin
    assert sum(r.n_common for r in rows) / (len(rows) * MRL_K) > 0.05


def test_countmin_sketch_is_streaming_mergeable(spark, sf_smoke, tmp_path):
    """The count-min table is a plain keyed COUNT, so Spark's partial+
    final (and micro-batch) merges ARE the sketch merge: building the
    d x w table over a document STREAM must give the identical table
    the batch aggregate produces."""
    from cdc_publisher_spark.queries.llm_select import CM_DEPTH, CM_WIDTH, _md5_bucket
    from cdc_publisher_spark.sources.files import stream_table
    from cdc_publisher_spark.functions.text import words
    from cdc_publisher_spark.tables import load

    def cells(df):
        rows = spark.range(CM_DEPTH).select(F.col("id").alias("r"))
        return (
            df.select(F.explode(words(F.col("text"))).alias("g"))
            .crossJoin(F.broadcast(rows))
            .select(
                "r",
                _md5_bucket(
                    F.concat(F.lit("cm"), F.col("r").cast("string"), F.col("g")),
                    "",
                    CM_WIDTH,
                ).alias("b"),
            )
            .groupBy("r", "b")
            .agg(F.count("*").alias("cnt"))
        )

    stream = stream_table(spark, sf_smoke, "documents", str(tmp_path))
    q = (
        cells(stream)
        .writeStream.format("memory")
        .queryName("cm_stream_t")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.r, r.b): r.cnt for r in spark.sql("SELECT * FROM cm_stream_t").collect()
    }
    expected = {
        (r.r, r.b): r.cnt
        for r in cells(load(spark, sf_smoke, "documents")).collect()
    }
    assert got == expected


def test_prototype_pruning_invariants_hold(spark, sf_oracle):
    from cdc_publisher_spark.queries.llm_select import q_k60_prototype_pruning

    r = q_k60_prototype_pruning(spark, sf_oracle).collect()[0]
    assert r.n_total == 500
    assert r.quota_exact and r.coverage_ok and r.scores_in_range
    # seeded clustering + deterministic tie-break => stable rerun
    r2 = q_k60_prototype_pruning(spark, sf_oracle).collect()[0]
    assert r == r2


def test_leakage_safe_split_has_no_test_gram_in_train(spark, sf_oracle):
    from cdc_publisher_spark.functions import text as TX
    from cdc_publisher_spark.queries.llm_select import (
        LEAK_GRAM,
        q_k61_leakage_safe_split,
    )
    from cdc_publisher_spark.tables import load

    roles = q_k61_leakage_safe_split(spark, sf_oracle)
    counts = {r.role: r.n for r in roles.groupBy("role").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 500  # roles partition the corpus
    assert 0 < counts.get("test", 0) < 100  # ~10% draw
    # hard leakage check: zero shared 5-grams between train and test
    docs = load(spark, sf_oracle, "documents")
    grams = TX.shingle_rows(docs, "doc_id", "text", LEAK_GRAM, hashed=True).join(
        roles, "doc_id"
    )
    shared = (
        grams.filter(F.col("role") == "train")
        .join(
            grams.filter(F.col("role") == "test").select("s").distinct(),
            "s",
            "left_semi",
        )
        .count()
    )
    assert shared == 0


# --------------------------------------------------------------------------
# Property tests for the round-4 pure kernels (no Spark session needed)
# --------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcdefg", min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(
    word=_word,
    pairs=st.lists(
        st.tuples(st.text("abcdefg", min_size=1, max_size=3),
                  st.text("abcdefg", min_size=1, max_size=3)),
        max_size=8,
    ),
)
def test_bpe_encode_word_properties(word, pairs):
    from cdc_publisher_spark.operators.bpe import encode_word

    merges = [(left, right, rank) for rank, (left, right) in enumerate(pairs)]
    toks = encode_word(word, merges)
    # lossless and bounded: concatenation reconstructs; counts in [1, len]
    assert "".join(toks) == word
    assert 1 <= len(toks) <= len(word)
    # deterministic
    assert toks == encode_word(word, merges)


@settings(max_examples=50, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(0, 255), min_size=3, max_size=3),
        min_size=4,
        max_size=64,
    )
)
def test_dhash64_properties(data):
    import numpy as np

    from cdc_publisher_spark.operators.multimodal import dhash64, encode_ppm

    h = max(2, int(len(data) ** 0.5))
    w = max(2, len(data) // h)
    px = np.array(data[: h * w], dtype=np.uint8).reshape(h, w, 3)
    payload = encode_ppm(px)
    v = dhash64(payload)
    assert -(1 << 63) <= v < (1 << 63)
    assert v == dhash64(payload)  # deterministic


@settings(max_examples=100, deadline=None)
@given(tokens=st.lists(_word, min_size=1, max_size=60))
def test_countmin_overestimate_property_pure(tokens):
    """Pure-python count-min replica of the q_k57 bucket algebra: the
    min-over-rows estimate can never undercount — for any multiset."""
    import hashlib
    from collections import Counter

    D, W_ = 4, 16  # narrow table to force collisions
    cells = Counter()
    for t in tokens:
        for r in range(D):
            b = int(hashlib.md5(f"cm{r}{t}".encode()).hexdigest()[:8], 16) % W_
            cells[(r, b)] += 1
    true = Counter(tokens)
    for t, c in true.items():
        est = min(
            cells[(r, int(hashlib.md5(f"cm{r}{t}".encode()).hexdigest()[:8], 16) % W_)]
            for r in range(D)
        )
        assert est >= c


def test_ccnet_buckets_are_equal_thirds_per_language(spark, sf_oracle):
    from cdc_publisher_spark.queries.llm_select import q_k62_ccnet_perplexity_buckets

    rows = q_k62_ccnet_perplexity_buckets(spark, sf_oracle).collect()
    assert len(rows) == 500
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        counts = {}
        for r in rs:
            counts[r.bucket] = counts.get(r.bucket, 0) + 1
        # ntile: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1, (lang, counts)
        # head is the most fluent third: its max CE <= tail's min CE
        head = [r.cross_entropy for r in rs if r.bucket == "head"]
        tail = [r.cross_entropy for r in rs if r.bucket == "tail"]
        if head and tail:
            assert max(head) <= min(tail) + 1e-9


def test_curriculum_interleaves_sources_within_bands(spark, sf_oracle):
    from cdc_publisher_spark.queries.llm_select import q_k63_curriculum_order

    rows = q_k63_curriculum_order(spark, sf_oracle).collect()
    assert len(rows) == 500
    by_band = {}
    for r in rows:
        by_band.setdefault(r.band, []).append(r)
    assert set(by_band) == {0, 1, 2, 3}
    for band, rs in by_band.items():
        # slots are unique within a band (a total schedule)
        slots = [r.slot_in_band for r in rs]
        assert len(set(slots)) == len(slots)
        # round-robin: among the first n_sources slots, no source repeats
        # before every present source has appeared once
        srcs = sorted({r.source for r in rs})
        first = [r.source for r in sorted(rs, key=lambda r: r.slot_in_band)[: len(srcs)]]
        assert len(set(first)) == len(first), (band, first)


@settings(max_examples=300, deadline=None)
@given(
    a_us=st.integers(min_value=0, max_value=2**52),
    delta=st.integers(min_value=-60_000_000, max_value=60_000_000),
)
def test_interval_binning_covers_window(a_us, delta):
    """q_c14's bucket math: if |b - a| <= 60 s then bucket(b) is one of
    {bucket(a)-1, bucket(a), bucket(a)+1} — the equi-join on candidate
    buckets can never drop a qualifying pair."""
    from cdc_publisher_spark.queries.joins import INTERVAL_BIN_US as w

    b_us = a_us + delta
    if b_us < 0:
        return
    ba, bb = a_us // w, b_us // w
    assert bb in (ba - 1, ba, ba + 1)


@settings(max_examples=300, deadline=None)
@given(
    a_us=st.integers(min_value=0, max_value=2**52),
    delta=st.integers(min_value=60_000_001, max_value=10**12),
    sign=st.sampled_from([-1, 1]),
)
def test_interval_binning_excess_gap_is_filtered_not_missed(a_us, delta, sign):
    """Out-of-window pairs may still share a candidate bucket (boundary
    adjacency) — correctness comes from the residual filter, so the
    invariant to pin is only one-directional: the residual predicate
    rejects them."""
    from cdc_publisher_spark.queries.joins import INTERVAL_BIN_US

    b_us = a_us + sign * delta
    if b_us < 0:
        return
    assert abs(b_us - a_us) > INTERVAL_BIN_US  # residual filter rejects


def test_bigram_lm_score_semantics(spark, sf_oracle):
    from cdc_publisher_spark.queries.llm_select import q_k64_bigram_lm_score
    from cdc_publisher_spark.tables import load

    import re

    rows = q_k64_bigram_lm_score(spark, sf_oracle).collect()
    docs = {r.doc_id: r.text for r in load(spark, sf_oracle, "documents").collect()}
    # tokenize the expected side with Spark's split semantics (keeps
    # edge empties), not str.split
    ntok = {i: len(re.split(r"\s+", t)) for i, t in docs.items()}
    assert len(rows) == sum(1 for n in ntok.values() if n >= 2)
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert r.cross_entropy > 0  # probabilities < 1
        assert r.n_bigrams == ntok[r.doc_id] - 1
    # identical texts score identically (pure function of content)
    by_text = {}
    for i, t in docs.items():
        if i in by_id:
            by_text.setdefault(t, set()).add(by_id[i].cross_entropy)
    assert all(len(v) == 1 for v in by_text.values())


def test_winnowing_guarantee_and_density(spark, tmp_path):
    import os

    from cdc_publisher_spark.queries.llm_select import (
        WIN_W,
        q_k65_winnowing_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(30))
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(20)), "en", "s0", 0),
        (2, " ".join(f"b{i}" for i in range(20)) + " " + shared, "en", "s0", 0),
        (3, " ".join(f"z{i}" for i in range(60)), "en", "s0", 0),
    ]
    d = tmp_path / "win"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    pairs = {(r.d1, r.d2): r.n_shared for r in q_k65_winnowing_pairs(spark, str(d)).collect()}
    # 30 shared tokens >> w+k-1: docs 1 and 2 must share fingerprints
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    # doc 3 is disjoint from both
    assert not any(3 in p for p in pairs)


def test_winnowing_density_near_theory(spark, sf_oracle):
    """Selected-fingerprint density should sit near the paper's
    2/(w+1) expectation on effectively-random hashes."""
    from pyspark.sql import Window as W

    from cdc_publisher_spark.functions.text import words
    from cdc_publisher_spark.queries.llm_select import WIN_K, WIN_W
    from cdc_publisher_spark.tables import load

    from cdc_publisher_spark.functions.text import kgram_hashes

    docs = load(spark, sf_oracle, "documents")
    toks = docs.select("doc_id", words(F.col("text")).alias("ws"))
    kg = kgram_hashes(toks, WIN_K, hex_len=8)
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(WIN_W - 1), 0)
    sel = (
        kg.withColumn(
            "k",
            F.min(
                F.concat(F.col("h"), F.lit("-"),
                         F.lpad((F.lit(99999999) - F.col("pos")).cast("string"), 8, "0"))
            ).over(w),
        )
        .filter(F.col("pos") >= WIN_W)
    )
    n_grams = sel.count()
    n_sel = sel.select("doc_id", "k").distinct().count()
    density = n_sel / n_grams
    assert 0.25 < density < 0.55, density  # theory: 2/(w+1) = 0.4


def test_duplicate_runs_are_maximal_and_exact(spark, tmp_path):
    import os

    from cdc_publisher_spark.queries.llm_select import q_k66_duplicate_runs

    run = " ".join(f"r{i}" for i in range(20))  # the duplicated span
    rows = [
        (1, " ".join(f"a{i}" for i in range(7)) + " " + run + " " +
            " ".join(f"c{i}" for i in range(5)), "en", "s0", 0),
        (2, " ".join(f"b{i}" for i in range(3)) + " " + run + " " +
            " ".join(f"d{i}" for i in range(9)), "en", "s0", 0),
        (3, " ".join(f"z{i}" for i in range(40)), "en", "s0", 0),
    ]
    d = tmp_path / "runs"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    out = q_k66_duplicate_runs(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    # maximal: exactly the 20 duplicated tokens, at the right offsets
    assert (r.d1, r.d2) == (1, 2)
    assert r.run_tokens == 20
    assert r.start1 == 8  # after 7 prefix tokens, 1-based
    assert r.start2 == 4  # after 3 prefix tokens, 1-based
