"""SemDeDup — cluster-scoped semantic deduplication (SURVEY.md §2.2
K-2 embedding-cosine dedup, the 100 TB path).

Method (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", 2023): instead of mining cosine
near-dup pairs over all O(n²) embedding pairs, first quantize the
corpus with k-means (the IVF index from ``operators/ivf.py`` — seeded
k-means++ trained on a hash-bounded sample, assignment fully
distributed and expression-only), then score pairs ONLY
within each cluster. Cost drops from |C|² to Σ|cluster|², i.e. ~|C|²/k
for balanced clusters — the difference between impossible and routine
at web scale.

Pipeline, all DataFrame ops:

1. ``build_ivf`` assigns every vector a ``list_id`` (one k-means fit +
   one projection; the centroid table is tiny and broadcast).
2. Within-cluster candidate pairs: self equi-join on ``list_id`` with
   ``id < id`` — shuffle keys are small ints, pair scoring is the
   fold-expression cosine (JVM-side, no UDF).
3. Transitive closure via ``connected_components`` (hash-to-min), so a
   chain a~b~c collapses to ONE keeper even when cos(a,c) < threshold.
4. Keeper = min vec_id per component (deterministic; SemDeDup's
   "keep one representative per duplicate group").

Relationship to the exact path: q_k21 (``cosine_pairs_exact``) is the
all-pairs ground truth this approximates; recall against it is pinned
by ``tests/test_operators.py::test_semantic_dedup_*`` the same way the
LSH miner is. Pairs found here are always TRUE near-dups (cosine is
recomputed exactly on candidates), so precision is 1 by construction —
clustering only affects recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.vectors import cosine_with_norms
from cdc_publisher_spark.operators.components import neardup_clusters
from cdc_publisher_spark.operators.ivf import build_ivf


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(i, j, cosine) near-dup pairs with cosine >= threshold, scored
    within k-means clusters only. i < j; cosines are exact."""
    if corpus.limit(1).count() == 0:  # k-means cannot fit on zero rows
        return corpus.sparkSession.createDataFrame(
            [], "i bigint, j bigint, cosine double"
        )
    index = build_ivf(corpus, id_col=id_col, vec_col=vec_col, n_lists=n_lists, seed=seed)
    c = index.corpus  # id, vec, norm, list_id
    a = c.select(
        F.col("list_id"),
        F.col(id_col).alias("i"),
        F.col(vec_col).alias("av"),
        F.col("norm").alias("an"),
    )
    b = c.select(
        F.col("list_id"),
        F.col(id_col).alias("j"),
        F.col(vec_col).alias("bv"),
        F.col("norm").alias("bn"),
    )
    return (
        a.join(b, "list_id")
        .filter(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            cosine_with_norms(F.col("av"), F.col("bv"), F.col("an"), F.col("bn")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 8,
    seed: int = 42,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cluster_id, keep) for EVERY corpus vector: near-dup
    components labeled by their min member, ``keep`` true for the one
    kept representative per component (singletons always keep).

    ``pairs``: pass a precomputed ``semantic_dedup_pairs`` result to
    reuse one k-means index across pair mining and closure (a caller
    auditing both, like q_k35, would otherwise fit and assign twice)."""
    if pairs is None:
        pairs = semantic_dedup_pairs(
            corpus, threshold, id_col=id_col, vec_col=vec_col, n_lists=n_lists, seed=seed
        )
    clustered = neardup_clusters(pairs, left="i", right="j").select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    return (
        corpus.select(id_col)
        .join(clustered, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
            (
                F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col(id_col))
            ).alias("keep"),
        )
    )


def diversity_sample(
    corpus: DataFrame,
    per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Cluster-balanced subsampling: k-means-quantize the corpus, keep
    at most ``per_cluster`` vectors per cluster, chosen by a
    deterministic content hash (not input order). Where uniform random
    sampling over-represents dense regions, this caps every mode's
    contribution — the diversity-preserving counterpart to q_k31's
    by-source stratification. One k-means fit + one partitioned
    row_number; no global ordering anywhere."""
    from pyspark.sql import Window as W

    if corpus.limit(1).count() == 0:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} bigint, list_id int, keep boolean"
        )
    index = build_ivf(corpus, id_col=id_col, vec_col=vec_col, n_lists=n_lists, seed=seed)
    w = W.partitionBy("list_id").orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
    return (
        index.corpus.withColumn("_rk", F.row_number().over(w))
        .select(
            F.col(id_col),
            F.col("list_id").cast("int").alias("list_id"),
            (F.col("_rk") <= per_cluster).alias("keep"),
        )
    )
