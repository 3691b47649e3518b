"""IVF (inverted-file) approximate nearest neighbors (SURVEY.md K-3
"an IVF or LSH-bucketed variant as the scale path").

Classic IVF-Flat, Spark-shaped:

- **build**: unit-normalize vectors, fit k-means centroids with
  seeded k-means++ on a HASH-BOUNDED sample collected to the driver
  (faiss-style coarse-quantizer training — O(MAX_FIT_ROWS x dim)
  driver bytes at any corpus size; on normalized vectors Euclidean
  argmin == cosine argmax, i.e. spherical quantization), then assign
  every corpus vector to its nearest centroid's list in one
  distributed pass — expression-only for small k, one Arrow-batched
  BLAS matmul per batch past EXPR_ASSIGN_MAX_LISTS centroids. The
  assignment is the index — a plain column, so it persists as parquet
  and prunes as a partition key.
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


#: Centroid training set bound: the fit collects at most ~this many
#: unit vectors to the driver (faiss-style — IVF coarse quantizers are
#: trained on a bounded sample, never the full corpus). 16384 x 64
#: doubles is ~8 MB of driver memory regardless of corpus size.
MAX_FIT_ROWS = 16384

#: Above this many centroids, list assignment switches from the
#: expression-only argmax (k fold-expressions per row — Catalyst
#: interprets higher-order functions, so cost is k x dim PER ROW and
#: the generated plan itself grows with k) to one Arrow-batched numpy
#: matmul per batch (centroid matrix in the UDF closure, O(batch x k x
#: dim) BLAS). The expression path stays for small k so the hot path
#: keeps zero Python where it's genuinely cheap.
EXPR_ASSIGN_MAX_LISTS = 16


def _assign_lists_arrow(vec_col, centroids: list[list[float]]):
    """list_id column via an Arrow-batched pandas UDF: argmax of
    (batch x k) dot products against the broadcast centroid matrix —
    the faiss-style assignment kernel, one BLAS matmul per batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c_t = np.asarray(centroids, dtype=np.float64).T  # dim x k

    k = c_t.shape[1]

    # no type hints: pandas is function-local, so string annotations
    # wouldn't resolve at inference time; hint-less defaults to SCALAR
    @pandas_udf("int")
    def assign(vecs):
        if not len(vecs):
            return pd.Series([], dtype="int32")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        # reversed-column argmax so score ties resolve to the HIGHEST
        # index — bit-compatible with the expression path's
        # array_max((score, idx)) struct ordering
        rev = (mat @ c_t[:, ::-1]).argmax(axis=1)
        return pd.Series((k - 1 - rev).astype("int32"))

    return assign(vec_col)


def _fit_kmeans(mat, k: int, seed: int, n_iter: int = 20):
    """Deterministic seeded k-means++ + Lloyd on a driver-side numpy
    matrix. Vectorized: each iteration is one (n x k) distance matmul —
    ~100 MFLOP at the MAX_FIT_ROWS bound, milliseconds on the driver,
    where the distributed-Lloyd alternative pays per-iteration job
    overhead to fit what is by design a bounded sample."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = mat.shape[0]
    if n == 0:
        raise ValueError("k-means: empty training set (guard the corpus upstream)")
    k = min(k, n)
    # k-means++ seeding
    centers = [mat[rng.randint(n)]]
    d2 = ((mat - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centers.append(mat[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, ((mat - centers[-1]) ** 2).sum(axis=1))
    c = np.array(centers)
    for _ in range(n_iter):
        # ||x-c||^2 argmin == (x.c - ||c||^2/2) argmax for unit rows
        assign = (mat @ c.T - 0.5 * (c**2).sum(axis=1)).argmax(axis=1)
        moved = False
        for j in range(k):
            members = mat[assign == j]
            if len(members):
                nc = members.mean(axis=0)
                if not np.allclose(nc, c[j], rtol=0, atol=1e-12):
                    c[j] = nc
                    moved = True
        if not moved:
            break
    return c


def build_ivf(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    n_rows: int | None = None,
) -> IvfIndex:
    """Fit centroids (seeded k-means++ on a hash-bounded sample of
    unit-normalized vectors) and assign each corpus vector to its list.

    The train set is BOUNDED: if the corpus exceeds MAX_FIT_ROWS, a
    deterministic content-hash filter (pmod(xxhash64(id), m) == 0)
    thins it to ~MAX_FIT_ROWS before the collect, so driver memory is
    O(MAX_FIT_ROWS x dim) at any corpus size — the standard IVF
    coarse-quantizer recipe (train on a sample, assign everything).
    Assignment stays fully distributed: one pass over the corpus with
    no extra shuffle — _best_list_expr (pure expressions) up to
    EXPR_ASSIGN_MAX_LISTS centroids, the Arrow matmul kernel above it."""
    import numpy as np

    normed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_norm"),
    )
    # n sizes the sample-thinning ratio only; callers that already
    # counted (adaptive n_lists) pass it in to avoid a second scan
    n = normed.count() if n_rows is None else n_rows
    train = normed.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if n > MAX_FIT_ROWS:
        m = -(-n // MAX_FIT_ROWS)  # ceil
        train = train.filter(F.pmod(F.xxhash64(F.col("_id")), F.lit(m)) == 0)
    # deterministic fetch order: the fit must not depend on partition
    # arrival order, so sort the bounded sample by id. Arrow transfer +
    # flat-buffer reshape: a row collect() re-boxes every array element
    # through Py4J (~100x slower for the same bytes); unit-normalizing
    # happens HERE in numpy rather than as a per-element Spark HOF.
    tbl = train.orderBy("_id").toArrow()
    vec_arrow = tbl.column("_v").combine_chunks()
    flat = np.asarray(vec_arrow.flatten(), dtype=np.float64)
    # fixed-width check via the actual list offsets — a divisibility
    # test would pass ragged rows whose TOTAL happens to divide the row
    # count (e.g. dims 63 and 65 among 64s) and scramble the reshape
    lengths = np.diff(np.asarray(vec_arrow.offsets))
    if len(tbl) and lengths.size and (lengths == lengths[0]).all() and lengths[0] > 0:
        mat = flat.reshape(len(tbl), int(lengths[0]))
    else:  # ragged/null rows: fall back to per-row conversion
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vec_arrow.to_pylist()])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    centroids = [list(map(float, c)) for c in _fit_kmeans(mat, n_lists, seed)]

    assign = (
        _best_list_expr(F.col(vec_col), centroids)
        if len(centroids) <= EXPR_ASSIGN_MAX_LISTS
        else _assign_lists_arrow(F.col(vec_col), centroids)
    )
    indexed = normed.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_norm").alias("norm"),
        assign.alias("list_id"),
    )
    return IvfIndex(corpus=indexed, centroids=centroids, id_col=id_col, vec_col=vec_col)


def _probe_lists_arrow(vec_col, centroids: list[list[float]], nprobe: int):
    """array<int> of the top-``nprobe`` centroid indices per query row:
    one (batch x k) matmul per Arrow batch. Score ties resolve to the
    HIGHEST index, bit-compatible with the expression path's
    reverse(array_sort((score, idx))) ordering."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c_t = np.asarray(centroids, dtype=np.float64).T  # dim x k
    k = c_t.shape[1]
    take = min(nprobe, k)

    @pandas_udf("array<int>")
    def probe(vecs):
        if not len(vecs):
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        scores = mat @ c_t[:, ::-1]  # reversed cols: stable argsort
        order_rev = np.argsort(-scores, axis=1, kind="stable")[:, :take]
        order = (k - 1 - order_rev).astype("int32")
        return pd.Series(list(order))

    return probe(vec_col)


def ivf_topk(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """(query_id, cand_id, cosine, rk<=k) scanning only nprobe lists."""
    if len(index.centroids) <= EXPR_ASSIGN_MAX_LISTS:
        scores = _centroid_scores(F.col(vec_col), index.centroids)
        pairs = F.array(
            *[F.struct(s.alias("score"), F.lit(i).alias("idx")) for i, s in enumerate(scores)]
        )
        probed = F.slice(F.reverse(F.array_sort(pairs)), 1, nprobe)
        probed_ids = F.transform(probed, lambda p: p["idx"])
    else:
        # large-k indexes (adaptive SemDeDup-style lists): one Arrow
        # matmul per batch, same tie order as the expression path
        probed_ids = _probe_lists_arrow(F.col(vec_col), index.centroids, nprobe)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        F.explode(probed_ids).alias("list_id"),
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
