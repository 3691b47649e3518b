"""Approximate nearest neighbors over embeddings (SURVEY.md §2.2 K-3,
§4.3 item 4 — the 100 TB path for similarity search).

Random-hyperplane LSH: ``n_planes`` fixed pseudo-random hyperplanes
(numpy, seed pinned) sign-partition the space into 2^n_planes buckets;
a query only scores candidates in its bucket (plus optional multiprobe
neighbors at Hamming distance 1). Cosine is sign-invariant under the
plane test, so bucket collisions concentrate high-cosine pairs.

Cost model vs brute force: brute force is O(|Q|·|C|·d) with a full
shuffle of the corpus per query block; LSH scores
O(|Q|·|C|/2^n_planes·(1+probes)·d) and the bucket join is a plain
equi-join — shuffle keys are uniform hashes, no skew. Recall tunes
with ``n_planes`` (fewer planes = bigger buckets = higher recall) and
``multiprobe``.

Plane projections are built-in expressions (zip_with/aggregate over a
literal plane array) — no UDF anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.vectors import cosine_with_norms, l2_norm

PLANE_SEED = 42


def _planes(dim: int, n_planes: int) -> list[list[float]]:
    rng = np.random.default_rng(PLANE_SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for one vector column."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        proj = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, n_planes: int = 8
) -> DataFrame:
    return df.withColumn("lsh_bucket", _bucket_expr(F.col(vec_col), _planes(dim, n_planes)))


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """(query_id, cand_id, cosine, rk<=k) — approximate top-k.

    ``multiprobe`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (n_planes+1 probes), trading a
    constant factor for recall.
    """
    c = with_lsh_bucket(
        corpus.select(
            F.col(corpus_id).alias("cand_id"),
            F.col(vec_col).alias("cv"),
            l2_norm(F.col(vec_col)).alias("cn"),
        ),
        "cv", dim, n_planes,
    )
    q = with_lsh_bucket(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).alias("qv"),
            l2_norm(F.col(vec_col)).alias("qn"),
        ),
        "qv", dim, n_planes,
    )
    if multiprobe:
        probes = F.array(
            F.col("lsh_bucket"),
            *[F.col("lsh_bucket").bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(n_planes)],
        )
        q = q.select("query_id", "qv", "qn", F.explode(probes).alias("lsh_bucket"))
    scored = (
        q.join(c, "lsh_bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "qv", "cv", "qn", "cn")
        .distinct()  # multiprobe can revisit a candidate
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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k baseline: broadcast the query block, score the whole
    corpus, bounded per-partition pre-rank then global window — the
    TakeOrdered shape, never a corpus×corpus product."""
    c = corpus.select(
        F.col(corpus_id).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
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
