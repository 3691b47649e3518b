"""Unified deduplication API (SURVEY.md north star K-1/K-2).

One entry point over the engine's dedup family:

- ``exact``     hash-groupBy on content (md5 shuffle key)
- ``minhash``   MinHash+LSH candidates, exact-Jaccard verified
- ``simhash``   64-bit SimHash within Hamming distance
- ``embedding`` cosine >= threshold on an embedding column

Each returns the *drop list* (doc ids to remove, keeping the smallest
id per duplicate cluster) so callers compose:
``df.join(drops, "doc_id", "left_anti")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.ann import cosine_pairs_exact, cosine_pairs_lsh
from cdc_publisher_spark.operators.components import neardup_clusters
from cdc_publisher_spark.operators.minhash import minhash_near_duplicates
from cdc_publisher_spark.operators.simhash import simhash_near_duplicates


def _drops_from_pairs(pairs: DataFrame) -> DataFrame:
    """Pairs (d1 < d2) -> drop list: connected components over the pair
    graph, keep the min id per cluster, drop the rest. (Dropping every
    d2 is NOT equivalent: for pairs (1,3),(2,3) it would keep both 1
    and 2 from one cluster.)"""
    cc = neardup_clusters(pairs, left="d1", right="d2")
    return cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")


def exact_duplicate_drops(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    # Shuffle a fixed-width md5 of the content, never the raw text: at
    # 100 TB the document bodies dominate shuffle bytes otherwise.
    hashed = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("_text_hash"))
    keep = hashed.groupBy("_text_hash").agg(F.min(id_col).alias("keep_id"))
    return (
        hashed.join(keep, "_text_hash")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col).alias("doc_id"))
        .distinct()
    )


def near_duplicate_drops(
    docs: DataFrame,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    max_hamming: int = 3,
) -> DataFrame:
    if method == "minhash":
        pairs = minhash_near_duplicates(docs, id_col, text_col, threshold=jaccard_threshold)
    elif method == "simhash":
        pairs = simhash_near_duplicates(docs, id_col, text_col, max_hamming=max_hamming)
    else:
        raise ValueError(f"unknown method {method!r}; use 'minhash' or 'simhash'")
    return _drops_from_pairs(pairs)


def embedding_duplicate_drops(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    method: str = "exact",
) -> DataFrame:
    """Embedding-cosine near-dup drop list: ALL pairs with cosine >=
    threshold (not just top-1 neighbors), clustered transitively.
    ``method='lsh'`` swaps in the bucketed candidate miner — the
    100 TB path (subset of exact, recall-tested)."""
    miner = cosine_pairs_exact if method == "exact" else cosine_pairs_lsh
    pairs = miner(vectors, cosine_threshold, id_col=id_col, vec_col=vec_col).select(
        F.col("i").alias("d1"), F.col("j").alias("d2")
    )
    return _drops_from_pairs(pairs)


def deduplicate(
    docs: DataFrame, method: str = "exact", id_col: str = "doc_id", text_col: str = "text", **kw
) -> DataFrame:
    """Return ``docs`` minus duplicates under ``method``."""
    if method == "exact":
        drops = exact_duplicate_drops(docs, id_col, text_col)
    else:
        drops = near_duplicate_drops(docs, method, id_col, text_col, **kw)
    return docs.join(drops.withColumnRenamed("doc_id", id_col), id_col, "left_anti")
