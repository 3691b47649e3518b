"""Byte-pair-encoding merge training over the documents table
(SURVEY.md §2.2 K-family extension; round-3 addition).

Classic BPE (Sennrich 2016) trains on the *word frequency histogram*,
not the raw corpus: the corpus-sized work is one distributed word
count, after which the vocabulary histogram is bounded (≲ a few
million rows at any corpus scale — Heaps' law) and the merge loop is
driver-side Python over that histogram. This is exactly how the
public trainers (subword-nmt, HuggingFace tokenizers) structure it,
and it is the scale-correct split on Spark:

- :func:`word_histogram` — one explode + groupBy on the corpus
  (the only O(rows) stage; shuffle key is the word itself).
- :func:`train_bpe` — collects the bounded histogram (guarded by
  ``max_vocab``) and runs the deterministic merge loop: each round
  merges the (count desc, pair lexicographic asc)-best adjacent
  symbol pair. Ties are total-ordered, so the merge list is unique.

The registered query (queries/llm_ml.py::q_k50) hash-checks the
round-0 pair ranking against DuckDB exactly; the iterative loop is
pinned by unit tests against hand-computed merges
(tests/test_operators.py::test_bpe_*).

Reference parity: no tokenizer exists in the reference (CDC
microservice); declared extension surface.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import words


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — the distributed stage."""
    return (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def _merge_pair(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    merged = pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_hist: DataFrame, n_merges: int, max_vocab: int = 2_000_000
) -> list[tuple[str, str, int]]:
    """Driver-side merge loop over the bounded word histogram.

    Returns ``[(left, right, rank)]``, rank 0 = first merge. The
    histogram collect is guarded: more than ``max_vocab`` distinct
    words raises instead of silently OOMing the driver.
    """
    rows = word_hist.limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"train_bpe: >{max_vocab} distinct words; raise max_vocab "
            "or pre-filter the histogram (min count)"
        )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        vocab[tuple(r["word"])] = vocab.get(tuple(r["word"]), 0) + int(r["n"])
    merges: list[tuple[str, str, int]] = []
    for rank in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        # Unique best: count desc, then pair lexicographic asc.
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], rank))
        nxt: dict[tuple[str, ...], int] = {}
        for s, n in vocab.items():
            m = _merge_pair(s, best)
            nxt[m] = nxt.get(m, 0) + n
        vocab = nxt
    return merges


def encode_word(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply the trained merge list (in rank order) to one word —
    the pure-Python reference encoder, shared by the distributed
    encoder's closure and the tests."""
    syms: tuple[str, ...] = tuple(word)
    for left, right, _rank in merges:
        if len(syms) < 2:
            break
        syms = _merge_pair(syms, (left, right))
    return list(syms)


def apply_bpe(
    docs: DataFrame, merges: list[tuple[str, str, int]], text_col: str = "text"
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: adds a
    ``tokens array<string>`` column (whitespace-split words, each
    BPE-encoded, flattened in order — detokenizing by concatenation
    reconstructs each word exactly).

    Scale shape: the merge list is vocabulary-bounded and ships in the
    closure (same broadcast-sized footprint as the stats tables other
    operators broadcast); encoding is an Arrow-batched pandas_udf with
    per-batch word memoization — Zipf's law makes the cache hit rate
    high, so the per-row cost is a dict lookup for all but the first
    occurrence of each word in a batch.
    """
    from pyspark.sql.functions import pandas_udf

    ordered = sorted(merges, key=lambda m: m[2])

    def _encode_series(texts):
        # Self-contained closure: driver-contract sessions run queries
        # from outside the package, so executors cannot import this
        # module (and register_pickle_by_value would drag in this
        # module's own package imports) — everything the worker needs
        # is defined locally and cloudpickled by value. Kept in
        # lockstep with encode_word/_merge_pair by the parity check in
        # tests/test_llm_ml.py::test_bpe_encode_roundtrip_and_train_consistency.
        def merge_pair(syms, left, right):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        def encode(word):
            syms = tuple(word)
            for left, right, _rank in ordered:
                if len(syms) < 2:
                    break
                syms = merge_pair(syms, left, right)
            return list(syms)

        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").split():
                got = cache.get(w)
                if got is None:
                    got = encode(w)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(enc)

    _encode = pandas_udf(_encode_series, "array<string>")
    return docs.withColumn("tokens", _encode(F.col(text_col)))
