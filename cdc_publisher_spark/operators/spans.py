"""Frequent-n-gram span masking — exact duplicate-substring removal.

The corpus-curation move from "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2021, public): any token span
whose n-gram occurs at least ``min_count`` times across the corpus is
boilerplate / duplicated text and is removed from every document,
leaving the unique remainder. (The reference engine has no such
operator; this is part of the LLM-pipeline surface the engine adds —
SURVEY.md §2.2 family K.)

Spark-first shape (no UDFs, no driver loops):

1. one ``posexplode`` pass tokenizes each document (generator
   semantics — the split evaluates once per row);
2. a per-doc ``lead()`` window assembles n-grams; grams are
   ``xxhash64``-hashed *before* any shuffle so only 8-byte keys move;
3. a global count + ``HAVING >= min_count`` yields the frequent-gram
   set — at 100 TB this aggregation is the only corpus-wide shuffle,
   and it is map-side-combined and fixed-width;
4. a left-semi join marks occurrence *start* positions; a second
   per-doc window (``max() OVER (ROWS n-1 PRECEDING)``) smears starts
   over the n positions they cover — span merging of overlapping
   occurrences falls out of the window algebra for free;
5. per-doc reassembly keeps unmasked tokens in position order.

Cost at scale: two narrow per-doc windows (both partitioned by the
uniform ``doc_id`` key — no skew), one fixed-width global agg, one
semi join against a set that is small by construction (only grams
crossing the threshold). Nothing quadratic, nothing interpreted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import words


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.posexplode(words(F.col(text_col))).alias("pos", "w")
    )


def _gram_tokens(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """One row per token with its n-gram context: (id, pos, w, g,
    _full) where ``g`` is the xxhash64 of the n-gram STARTING here and
    ``_full`` marks positions with a complete n-gram (the last n-1
    positions of each doc are not full). Single posexplode + one
    per-doc window — the shared scan both the frequent-gram count and
    the masking pass derive from (r15: previously three separate
    explode passes plus an (id, pos) join re-attached the flags)."""
    w = W.partitionBy(id_col).orderBy("pos")
    toks = _tokens(docs, id_col, text_col)
    parts = [F.col("w")] + [F.lead("w", j).over(w) for j in range(1, n)]
    return toks.select(
        F.col(id_col),
        F.col("pos"),
        F.col("w"),
        F.xxhash64(F.concat_ws(" ", *parts)).alias("g"),
        F.lead("w", n - 1).over(w).isNotNull().alias("_full"),
    )


def frequent_ngram_starts(
    docs: DataFrame,
    n: int = 4,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos) rows where a corpus-frequent n-gram starts.

    Grams shuffle as xxhash64 values only; 64-bit collisions are
    negligible at any realistic gram cardinality (and would only ever
    merge two counts, never drop a span).
    """
    grams = _gram_tokens(docs, n, id_col, text_col).filter("_full")
    frequent = (
        grams.groupBy("g").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("g")
    )
    return grams.join(frequent, "g", "left_semi").select(id_col, "pos")


def mask_frequent_ngrams(
    docs: DataFrame,
    n: int = 4,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document span-masking summary.

    Returns ``(id, n_tokens, n_masked, kept_text)`` where ``kept_text``
    is the document with every token covered by a frequent n-gram
    occurrence removed (position order preserved). Overlapping and
    adjacent occurrences merge naturally: a token is masked iff ANY
    frequent gram starts within the previous ``n-1`` positions.
    """
    # ONE tokenize+window pass (r15): each token row carries the hash
    # of the n-gram starting at it, so the start flags attach with a
    # g-keyed left join against the (small by construction) frequent
    # set instead of re-exploding the corpus and joining on (id, pos).
    # Partial trailing grams (_full = false) hash a <n-token string,
    # which can never equal a full n-gram string (full grams contain
    # exactly n-1 spaces, tokens contain none), but the _full guard
    # makes the exclusion explicit rather than relying on that.
    gramtok = _gram_tokens(docs, n, id_col, text_col)
    frequent = (
        gramtok.filter("_full")
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("g", F.lit(1).alias("st"))
    )
    flagged = gramtok.join(frequent, "g", "left").withColumn(
        "st", F.when(F.col("_full") & F.col("st").isNotNull(), 1).otherwise(0)
    )
    cover = W.partitionBy(id_col).orderBy("pos").rowsBetween(-(n - 1), 0)
    masked = flagged.withColumn("masked", F.max("st").over(cover))
    return (
        masked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("masked").alias("n_masked"),
            _kept_text().alias("kept_text"),
        )
    )


def _kept_text() -> Column:
    """Unmasked tokens in position order, space-joined.

    collect_list order is partition-dependent, so tokens carry their
    position: sort_array on (pos, w) structs restores document order
    deterministically. The per-doc array is small (document length),
    so the interpreted transform() is off the hot path.
    """
    kept = F.collect_list(
        F.when(F.col("masked") == 0, F.struct(F.col("pos"), F.col("w")))
    )
    return F.concat_ws(" ", F.transform(F.sort_array(kept), lambda s: s["w"]))
