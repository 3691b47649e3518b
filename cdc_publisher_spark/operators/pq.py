"""Product-quantization ANN (SURVEY.md K-3 "an IVF or LSH-bucketed
variant as the scale path"; public method: Jegou et al., "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011).

PQ compresses each unit-normalized d-dim vector into m small codes
(one per d/m-dim subspace, n_codes centroids each): 64 float32s ->
8 bytes at m=8, a 32x memory cut. Queries score the *compressed*
corpus via asymmetric distance computation (ADC): per query, an
m x n_codes lookup table of exact subspace dot products; a corpus
row's approximate cosine is the sum of m table gathers — the raw
vectors are never touched during the scan.

Spark shape (mirrors operators/ann.py block_topk and operators/ivf.py):

- **train**: bounded driver-side sample (``sample_rows``, TakeOrdered
  by id so the sample is layout-independent), seeded numpy Lloyd's
  per subspace. The codebook is tiny (m * n_codes * d/m floats) and
  ships by closure — no shuffle.
- **encode**: one Arrow-batched ``mapInPandas`` pass; per subspace a
  batch x n_codes distance matrix (BLAS) and an argmin — vectorized,
  never per-row Python.
- **query**: one ``mapInPandas`` pass over the encoded corpus; every
  query shares the pass (LUT tensor, numpy fancy-gather scores of
  shape nq x batch); per-batch top-(k+pad) *nominate*, then an exact
  re-rank on the raw vectors with the same ``cosine_with_norms``
  expression the oracle path uses. PQ nominates, never ranks: every
  emitted cosine is a true cosine (the q_k34/q_k40 contract).

Cost at 100 TB: the ADC scan reads ~m bytes/vector instead of 4*d
(32x fewer bytes at m=8, d=64); candidate traffic is
O(partitions * |Q| * (k+pad)) id pairs, independent of corpus size;
the refine join touches candidates only. Recall floor vs brute force
is pinned by tests/test_operators.py::test_pq_topk_recall.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.vectors import cosine_with_norms, l2_norm


def _safe_unit_rows(X):
    """Row-normalize, mapping zero vectors to zero rows instead of NaN —
    the numpy twin of functions/vectors.py normalize()'s null-safety."""
    import numpy as np

    n = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.where(n > 0, n, 1.0)


@dataclass(frozen=True)
class PqCodebook:
    """m subspace codebooks, each n_codes x (dim/m), plain lists so the
    object pickles into executor closures without the engine package."""

    codebooks: tuple  # m x n_codes x dsub nested tuples of float
    dim: int

    @property
    def m(self) -> int:
        return len(self.codebooks)

    @property
    def n_codes(self) -> int:
        return len(self.codebooks[0])


def _lloyd(X, k: int, iters: int, rng):
    """Seeded numpy Lloyd's on (n, dsub) rows; deterministic for a given
    rng state. Empty clusters keep their previous centroid (no random
    restarts -> reproducible codebooks)."""
    import numpy as np

    n = X.shape[0]
    C = X[rng.choice(n, size=min(k, n), replace=False)].astype(np.float64).copy()
    if len(C) < k:  # degenerate tiny sample: repeat rows to fill k
        C = np.vstack([C, C[rng.choice(len(C), size=k - len(C))]])
    for _ in range(iters):
        # |x-c|^2 = |x|^2 - 2 x.c + |c|^2 ; argmin ignores |x|^2
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def train_pq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    sample_rows: int = 2048,
    iters: int = 15,
    seed: int = 42,
) -> PqCodebook:
    """Fit per-subspace codebooks on a bounded, order-deterministic
    sample of unit-normalized vectors."""
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    )  # TakeOrdered: bounded and layout-independent
    X = np.asarray([list(map(float, r[1])) for r in rows], dtype=np.float64)
    X = _safe_unit_rows(X)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        C = _lloyd(X[:, j * dsub : (j + 1) * dsub], n_codes, iters, rng)
        books.append(tuple(tuple(float(x) for x in c) for c in C))
    return PqCodebook(codebooks=tuple(books), dim=dim)


def encode_pq(
    corpus: DataFrame,
    cb: PqCodebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<smallint>): one vectorized mapInPandas pass."""
    books = cb.codebooks
    dim, m = cb.dim, cb.m
    dsub = dim // m
    v = vec_col

    def gen(batches):
        import numpy as np
        import pandas as pd

        Cs = [np.asarray(b, dtype=np.float64) for b in books]
        c2 = [(C * C).sum(axis=1) for C in Cs]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf[v].values])
            Vn = np.linalg.norm(V, axis=1, keepdims=True)
            V /= np.where(Vn > 0, Vn, 1.0)  # zero vector -> zero row, not NaN codes
            codes = np.empty((len(V), m), dtype=np.int16)
            for j in range(m):
                sub = V[:, j * dsub : (j + 1) * dsub]
                d2 = c2[j][None, :] - 2.0 * (sub @ Cs[j].T)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"_id": pdf["_id"].values, "codes": list(codes)})

    return (
        corpus.select(F.col(id_col).alias("_id"), v)
        .mapInPandas(gen, "_id bigint, codes array<smallint>")
        .select(F.col("_id").alias(id_col), "codes")
    )


def pq_topk(
    corpus: DataFrame,
    encoded: DataFrame,
    cb: PqCodebook,
    queries: DataFrame,
    k: int = 10,
    pad: int = 32,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cand_id, cosine, rk<=k): ADC nominate over the
    compressed corpus, exact cosine re-rank on the nominated raw
    vectors only."""
    q_rows = queries.select(query_id, vec_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, cand_id bigint, cosine double, rk bigint"
        )
    q_ids = [int(r[0]) for r in q_rows]
    q_mat = [list(map(float, r[1])) for r in q_rows]
    books = cb.codebooks
    dim, m = cb.dim, cb.m
    dsub = dim // m
    kk = k + pad

    def nominate(batches):
        # Per-PARTITION top-(k+pad): per-batch candidates are merged in
        # a running (nq, <=k+pad) heap and emitted once at partition
        # end, so candidate traffic is O(partitions * |Q| * (k+pad)) —
        # independent of how many Arrow batches a partition splits into.
        import numpy as np
        import pandas as pd

        Q = np.asarray(q_mat, dtype=np.float64)
        Qn = np.linalg.norm(Q, axis=1, keepdims=True)
        Q /= np.where(Qn > 0, Qn, 1.0)  # zero query -> zero scores, not NaN
        qid = np.asarray(q_ids, dtype=np.int64)
        # LUT[j]: (nq, n_codes) exact subspace dot products
        lut = [
            Q[:, j * dsub : (j + 1) * dsub] @ np.asarray(books[j], dtype=np.float64).T
            for j in range(m)
        ]
        best_s = None  # (nq, <=kk) running scores
        best_c = None  # (nq, <=kk) matching candidate ids
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.asarray([np.asarray(c, dtype=np.int64) for c in pdf["codes"].values])
            S = lut[0][:, codes[:, 0]]
            for j in range(1, m):
                S = S + lut[j][:, codes[:, j]]  # (nq, batch)
            cand = np.broadcast_to(
                np.asarray(pdf["_cid"].values, dtype=np.int64), S.shape
            )
            if best_s is not None:
                S = np.concatenate([best_s, S], axis=1)
                cand = np.concatenate([best_c, cand], axis=1)
            take = min(kk, S.shape[1])
            idx = np.argpartition(-S, take - 1, axis=1)[:, :take]
            rows = np.arange(S.shape[0])[:, None]
            best_s, best_c = S[rows, idx], cand[rows, idx]
        if best_s is not None:
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qid, best_c.shape[1]),
                    "cand_id": best_c.reshape(-1),
                }
            )

    cands = (
        encoded.select(F.col(corpus_id).alias("_cid"), "codes")
        .mapInPandas(nominate, "query_id bigint, cand_id bigint")
        .filter(F.col("query_id") != F.col("cand_id"))
        .distinct()
    )
    c_side = corpus.select(
        F.col(corpus_id).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    q_side = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    rescored = (
        cands.join(c_side, "cand_id")
        .join(F.broadcast(q_side), "query_id")
        .select(
            "query_id",
            "cand_id",
            cosine_with_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 4).alias("cosine"), "rk")
    )
