"""Benchmark decontamination (north-star training-data pipeline op).

Pretraining corpora must drop documents that overlap evaluation sets,
or benchmark numbers are memorization. The standard mechanism (public:
GPT-3/Gopher/Llama papers) is n-gram overlap: a training doc is
contaminated if it shares at least one k-gram with any eval document.

Scale shape — the eval side is small (benchmarks are thousands of
docs), the corpus side is the 100 TB: shingle both sides into
(id, xxhash64(k-gram)) rows, broadcast the distinct eval-gram set, and
semi-join the corpus grams against it. No shuffle touches the corpus
beyond its own per-doc shingling window; the join is map-side against
the broadcast set. Hashing first keeps strings out of the exchange
(same trick as the MinHash path, functions/text.py shingle_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import shingle_rows


def ngram_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(corpus id, n_shared) for every corpus doc sharing >= 1 k-gram
    with any eval doc. ``n_shared`` counts the doc's distinct
    contaminated k-grams — a contamination-severity signal."""
    corpus_sh = shingle_rows(corpus, id_col, text_col, k, hashed=True)
    eval_sh = shingle_rows(eval_docs, id_col, text_col, k, hashed=True).select("s").distinct()
    return (
        corpus_sh.join(F.broadcast(eval_sh), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``corpus`` minus contaminated docs (left_anti on the hit list)."""
    hits = ngram_contamination(corpus, eval_docs, k, id_col, text_col)
    return corpus.join(hits.select(id_col), id_col, "left_anti")
