"""Text-analysis column expressions (SURVEY.md §2.2 K-4, north star).

All built-in expressions (split/regexp/aggregate) — token counting,
quality ratios, shingling — so per-document stats run at scan speed.
The documents table is whitespace-tokenized word soup; the same
expressions apply to real text unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, r"\s+")


def n_words(text: Column) -> Column:
    return F.size(words(text))


def n_tokens_regex(text: Column) -> Column:
    """Token count under the BPE-ish regex (K token counting)."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def distinct_words(text: Column) -> Column:
    return F.array_distinct(words(text))


def type_token_ratio(text: Column) -> Column:
    return F.size(distinct_words(text)).cast("double") / F.size(words(text)).cast("double")


def avg_word_len(text: Column) -> Column:
    """Mean characters per whitespace token."""
    total = F.aggregate(words(text), F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w))
    return total.cast("double") / F.size(words(text)).cast("double")


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array column.

    WARNING — small inputs only: higher-order functions evaluate
    interpreted (outside codegen, no common-subexpression elimination),
    so the embedded split() re-evaluates per element — O(words²) regex
    work per row. The scalable row-wise form is :func:`shingle_rows`.
    """
    ws = words(text)
    joined = F.transform(
        F.sequence(F.lit(0), F.size(ws) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j + 1) for j in range(k)]),
    )
    return F.array_distinct(F.when(F.size(ws) >= k, joined).otherwise(F.array()))


def shingle_rows(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    hashed: bool = False,
    distinct: bool = True,
):
    """Distinct k-word shingles as ROWS (id, s) — the scale path.
    ``distinct=False`` keeps duplicate shingles (repetition statistics
    need the multiset).

    posexplode evaluates the split exactly once per document (generator
    semantics), then one per-doc window assembles shingles via lead().
    Linear work, whole-stage codegen throughout, one hash shuffle on
    the doc id; no interpreted higher-order functions anywhere.

    ``hashed=True`` replaces the shingle string with its xxhash64
    BEFORE the distinct, so no string ever enters a shuffle — ~20%
    faster on the dedup path; 64-bit collision odds are negligible at
    any realistic shingle cardinality.

    Measured alternative (sf0.1, rejected): materializing the words
    array once and shingling via transform()+array_distinct+explode
    (no window, no first shuffle) benches ~10% SLOWER than this window
    form — the interpreted-HOF per-element cost outweighs the saved
    shuffle at realistic doc lengths. Re-measure before switching.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("pos")
    tokens = docs.select(F.col(id_col), F.posexplode(words(F.col(text_col))).alias("pos", "w"))
    parts = [F.col("w")] + [F.lead("w", j).over(w) for j in range(1, k)]
    shingle = F.concat_ws(" ", *parts)
    assembled = tokens.select(
        F.col(id_col),
        (F.xxhash64(shingle) if hashed else shingle).alias("s"),
        F.lead("w", k - 1).over(w).isNotNull().alias("_full"),
    )
    rows = assembled.filter(F.col("_full")).select(id_col, "s")
    return rows.distinct() if distinct else rows


def set_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct-word list (K document fingerprinting; the rolling-hash
    variant lives in operators/fingerprint.py)."""
    return F.md5(F.concat_ws(" ", F.array_sort(distinct_words(text))))


def kgram_hashes(toks, k: int, hex_len: int = 8, id_col: str = "doc_id", arr_col: str = "ws"):
    """md5-hex k-gram frame over a (id, token-array) DataFrame:
    (id, pos 1-based, h) — one row per k-gram, hash = first ``hex_len``
    hex digits of md5(space-joined gram). Shared by the winnowing
    selector (q_k65), the duplicate-run seeder (q_k66), and their
    tests, and mirrored verbatim by their DuckDB oracles (md5 is
    cross-engine; positions are 1-based to match SQL arrays)."""
    gram = "concat(" + ", ' ', ".join(f"{arr_col}[i+{j}]" for j in range(k)) + ")"
    return (
        toks.filter(F.size(arr_col) >= k)
        .select(
            id_col,
            F.posexplode(
                F.expr(f"transform(sequence(0, size({arr_col}) - {k}), i -> {gram})")
            ).alias("p0", "g"),
        )
        .select(
            id_col,
            (F.col("p0") + 1).alias("pos"),
            F.substring(F.md5("g"), 1, hex_len).alias("h"),
        )
    )
