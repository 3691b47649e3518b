"""IVF (inverted-file) approximate nearest neighbors (SURVEY.md K-3
"an IVF or LSH-bucketed variant as the scale path").

Classic IVF-Flat, Spark-shaped:

- **build**: unit-normalize vectors, fit k-means centroids (MLlib —
  distributed Lloyd's; on normalized vectors Euclidean argmin ==
  cosine argmax, i.e. spherical quantization), assign every corpus
  vector to its nearest centroid's list. The assignment is the
  index — a plain column, so it persists as parquet and prunes as a
  partition key.
- **query**: score each query against the tiny centroid table
  (broadcast, n_lists rows), take the top ``nprobe`` lists, equi-join
  corpus on list id, exact cosine inside the probed lists only.

Cost: |C|/n_lists * nprobe candidates per query vs |C| brute force;
the probe join shuffles on list id (uniform-ish by construction).
Compared to LSH (operators/ann.py), IVF adapts to the data's cluster
structure instead of random planes — better recall at equal candidate
budget on clustered corpora; equivalent on isotropic noise.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.vectors import cosine_with_norms, l2_norm


@dataclass
class IvfIndex:
    corpus: DataFrame  # id, vec, norm, list_id
    centroids: list[list[float]]  # n_lists x dim
    id_col: str
    vec_col: str


def _centroid_scores(vec_col, centroids: list[list[float]]):
    """Array of dot(vec, centroid_i) (vectors need not be normalized;
    centroid argmax ordering is what matters)."""
    scores = []
    for c in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        scores.append(
            F.aggregate(
                F.zip_with(vec_col, lit_c, lambda x, p: x.cast("double") * p),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return scores


def _best_list_expr(vec_col, centroids: list[list[float]]):
    """argmax centroid index as a column."""
    scores = _centroid_scores(vec_col, centroids)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(i).alias("idx")) for i, s in enumerate(scores)]
    )
    return F.array_max(pairs)["idx"]


def build_ivf(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
) -> IvfIndex:
    """Fit centroids (MLlib k-means on unit-normalized vectors) and
    assign each corpus vector to its list."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    normed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_norm"),
    ).withColumn(
        "_unit", F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm"))
    )
    train = normed.select(array_to_vector("_unit").alias("features"))
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    indexed = normed.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_norm").alias("norm"),
        _best_list_expr(F.col(vec_col), centroids).alias("list_id"),
    )
    return IvfIndex(corpus=indexed, centroids=centroids, id_col=id_col, vec_col=vec_col)


def ivf_topk(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """(query_id, cand_id, cosine, rk<=k) scanning only nprobe lists."""
    scores = _centroid_scores(F.col(vec_col), index.centroids)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(i).alias("idx")) for i, s in enumerate(scores)]
    )
    probed = F.slice(F.reverse(F.array_sort(pairs)), 1, nprobe)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        F.explode(F.transform(probed, lambda p: p["idx"])).alias("list_id"),
    )
    c = index.corpus.select(
        F.col(index.id_col).alias("cand_id"),
        F.col(index.vec_col).alias("cv"),
        F.col("norm").alias("cn"),
        "list_id",
    )
    scored = (
        q.join(c, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_with_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 4).alias("cosine"), "rk")
    )
