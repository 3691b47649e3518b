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

import math
from functools import reduce

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


def cosine_pairs_exact(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    accel: str = "blas",
    tile_rows: int = 65536,
) -> DataFrame:
    """Exact (i, j, cosine) pairs with cosine >= threshold, i < j.

    This is the oracle twin for embedding-cosine near-dup (the q_k2 /
    q_k3 pattern: exact ground truth + an LSH scale path; at 100 TB
    corpus×corpus use :func:`cosine_pairs_lsh`).

    ``accel='blas'`` (default) mines candidates with an Arrow-batched
    numpy block matmul over ``mapInPandas`` — each corpus partition ×
    a closure-shipped tile of at most ``tile_rows`` vectors, the
    textbook BLAS tiling — float32 sgemm under a 1e-3 guard band
    (recall-only: candidates are nominated wide), then recomputes the
    cosine of the surviving handful of pairs with the same
    sequential-fold expression the DuckDB oracle uses, so the output
    stays bit-identical to ``accel='hof'`` (the pure-Catalyst
    broadcast-NL form, kept as the equality twin; ~20× slower at
    sf0.1 — 2M interpreted HOF folds).

    Driver memory is bounded by O(tile_rows · d) regardless of corpus
    size: the candidate miner collects one hash-assigned tile at a
    time, never the whole corpus (see :func:`_blas_candidate_pairs`).
    All-pairs work is inherently quadratic — n/tile_rows corpus passes
    — which is the declared cost of the EXACT path; the sub-quadratic
    scale paths are :func:`cosine_pairs_lsh` and SemDeDup.
    """
    a = vectors.select(
        F.col(id_col).alias("i"),
        F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    b = vectors.select(
        F.col(id_col).alias("j"),
        F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    if accel == "blas":
        cand = _blas_candidate_pairs(vectors, threshold, id_col, vec_col, tile_rows)
        scored = (
            cand.join(a, "i")
            .join(b, "j")
            .select(
                "i",
                "j",
                cosine_with_norms(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ).alias("cos"),
            )
        )
    else:
        scored = (
            a.crossJoin(F.broadcast(b))
            .filter(F.col("i") < F.col("j"))
            .select(
                "i",
                "j",
                cosine_with_norms(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ).alias("cos"),
            )
        )
    return (
        scored.filter(F.col("cos") >= threshold)
        .select("i", "j", F.round("cos", 4).alias("cosine"))
    )


def _tile_miner(tile_ids: np.ndarray, tile_mat: np.ndarray, guard: float):
    """mapInPandas generator: corpus batches × one closure-shipped tile.

    Built by a factory so each tile's arrays bind by value and the
    closure pickles standalone (the driver contract runs sessions that
    cannot import this package on executors).

    The mine runs in FLOAT32 (the source column is array<float>, so
    nothing real is lost): half the closure bytes on the wire, sgemm
    instead of dgemm. Candidates only need RECALL — the caller
    re-scores every candidate with the exact fold expression and
    re-filters at the true threshold — so the guard band below absorbs
    float32 rounding (~1e-6 for 64-dim unit-scale dots) with orders of
    magnitude to spare.
    """
    tile_mat = np.ascontiguousarray(tile_mat, dtype=np.float32)
    tile_norms = np.linalg.norm(tile_mat, axis=1)

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        for part in batches:
            ids = _np.asarray(part["i"].to_numpy(), dtype=_np.int64)
            A = _np.array([_np.asarray(v, dtype=_np.float32) for v in part["v"]])
            if len(A) == 0:
                continue
            cos = (A @ tile_mat.T) / _np.outer(_np.linalg.norm(A, axis=1), tile_norms)
            ii, jj = _np.nonzero((cos >= guard) & (ids[:, None] < tile_ids[None, :]))
            if len(ii):
                yield _pd.DataFrame({"i": ids[ii], "j": tile_ids[jj]})

    return gen


def _blas_candidate_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    tile_rows: int = 65536,
) -> DataFrame:
    """(i, j) id pairs with numpy-matmul cosine >= threshold - 1e-9.

    Driver memory is BOUNDED: the corpus is tiled into
    ceil(n / tile_rows) hash-assigned tiles (pmod(xxhash64(id))), and
    only ONE tile at a time is collected and shipped in the closure —
    O(tile_rows · d) driver bytes, never the whole corpus. Each tile
    pass matmuls every corpus partition against that tile; the
    ``i < j`` mask means an unordered pair {x, y} (x < y) is emitted
    exactly once, by the pass whose tile contains y — so the union over
    tiles covers all-pairs with no duplicates. The per-tile corpus
    rescans are the declared quadratic cost of the exact path (the
    projection is persisted across tiles); the sub-quadratic paths are
    cosine_pairs_lsh / SemDeDup.
    """
    v = vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
    # Single-tile fast path: probe with limit(tile_rows + 1) so the
    # common bounded-corpus case pays ONE collect job instead of a
    # count + a collect; the probe itself is the memory guard (at most
    # tile_rows + 1 rows ever reach the driver here).
    probe = v.limit(tile_rows + 1).toPandas()
    if len(probe) == 0:
        return vectors.sparkSession.createDataFrame([], "i bigint, j bigint")
    if len(probe) <= tile_rows:
        n, n_tiles = len(probe), 1
    else:
        n = v.count()
        n_tiles = max(1, math.ceil(n / tile_rows))
        # one materialization feeds n_tiles collects + n_tiles scans;
        # scoped via the registry tracker so a long-lived session frees
        # it when the next registered query starts. Vector-corpus
        # cardinality: explicit SERIALIZED level (VERDICT r15 ask #6).
        from pyspark.storagelevel import StorageLevel

        from cdc_publisher_spark.registry import track_persist

        v = track_persist(v, level=StorageLevel.MEMORY_AND_DISK)
    # float32 mine (see _tile_miner): 1e-3 band >> f32 rounding, and
    # the exact re-score re-filters at the true threshold, so a wider
    # band costs only a few extra candidates, never a wrong pair.
    guard = threshold - 1e-3
    parts: list[DataFrame] = []
    for t in range(n_tiles):
        if n_tiles == 1:
            pdf = probe
        else:
            tile = v.filter(F.pmod(F.xxhash64(F.col("i")), F.lit(n_tiles)) == t)
            pdf = tile.toPandas()
        if len(pdf) == 0:  # np.array([]) is 1-D; axis=1 norms would throw
            continue
        tile_ids = np.asarray(pdf["i"].to_numpy(), dtype=np.int64)
        tile_mat = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        parts.append(v.mapInPandas(_tile_miner(tile_ids, tile_mat, guard), "i bigint, j bigint"))
    if not parts:
        return vectors.sparkSession.createDataFrame([], "i bigint, j bigint")
    return reduce(lambda x, y: x.unionByName(y), parts)


def cosine_pairs_lsh(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bands: int = 8,
    band_planes: int = 4,
) -> DataFrame:
    """Approximate (i, j, cosine) near-dup pairs — the 100 TB path.

    BANDED random-hyperplane LSH (the MinHash-band construction applied
    to sign bits): ``n_bands`` independent signatures of ``band_planes``
    sign bits each; a pair is a candidate when ANY band matches, then
    candidates are exactly verified, so output ⊆
    :func:`cosine_pairs_exact` (precision 1). Banding is what makes the
    collision curve step-shaped: with p = 1 - θ/π per plane, candidate
    probability is 1-(1-p^r)^b — ≈0.998 at cosine 0.9 for (b=8, r=4)
    while uncorrelated pairs (cosine ~0, p=0.5) collide at ~0.39 only
    to be discarded by verification. A single 8-plane signature with
    Hamming-1 multiprobe (the topk shape) caps near 0.7 recall at
    cosine 0.9 — measured before switching; see the recall test.
    Shuffle key is (band, bucket): two ints, uniform, no skew.
    """
    planes = _planes(dim, n_bands * band_planes)
    v = vectors.select(
        F.col(id_col).alias("i"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("n"),
    )
    buckets = F.array(
        *[
            _bucket_expr(F.col("v"), planes[k * band_planes : (k + 1) * band_planes])
            for k in range(n_bands)
        ]
    )
    sig = v.select("i", "v", "n", F.posexplode(buckets).alias("band", "bucket"))
    right = sig.select(
        "band",
        "bucket",
        F.col("i").alias("j"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    return (
        sig.join(right, ["band", "bucket"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", "v", "vb", "n", "nb")
        .distinct()  # a pair may collide in several bands
        .select(
            "i",
            "j",
            cosine_with_norms(F.col("v"), F.col("vb"), F.col("n"), F.col("nb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("i", "j", F.round("cos", 4).alias("cosine"))
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


def block_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    pad: int = 8,
    exclude_same_label: str | None = None,
) -> DataFrame:
    """Exact top-k via the SURVEY §4.3-item-4 shape: block-wise numpy
    matmul per corpus partition (mapInPandas, Arrow-batched), bounded
    per-partition candidate top-(k+pad) (per-batch results merge into
    one running heap before emission), then a global exact re-rank.

    Why this beats :func:`brute_force_topk` as the query block grows:
    the per-pair fold cosine is interpreted (one O(d) fold per
    query×candidate pair), while a batch×block matmul is one BLAS call
    per Arrow batch — the same 37× class of win measured for the
    embedding near-dup miner (operators/ann.py cosine_pairs_exact).

    Exactness: a global top-k member is, by definition, inside the
    top-k of every subset containing it, so per-batch top-k candidate
    sets are complete. ``pad`` extra candidates absorb float-order
    noise between the matmul score and the fold score near the cutoff.
    The FINAL ordering recomputes cosine with the same sequential-fold
    expression the oracle uses (cosine_with_norms), so output values
    and tie-breaks are bit-identical to the per-pair path — the matmul
    only nominates, it never ranks.

    Scale: the query block broadcasts (bounded by design — callers
    shard huge query sets); candidate traffic is
    O(partitions · |Q| · (k+pad)) rows of two ids, independent of
    corpus size; the only corpus-wide pass is the scan itself.

    ``exclude_same_label``: name of a label column present on BOTH
    sides; candidates sharing the query's label are masked to -inf in
    the nominate matmul and filtered in the re-rank — hard-negative
    mining for retrieval/contrastive training (top-k most-similar
    *differing-label* rows). Per-partition top-k among differing-label
    candidates is complete for the global differing-label top-k by the
    same subset argument, so exactness is preserved.
    """
    lbl = exclude_same_label
    q_cols = [query_id, vec_col] + ([lbl] if lbl else [])
    q_rows = queries.select(*q_cols).collect()
    if not q_rows:  # no queries -> empty result, skip the matmul path
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, cand_id bigint, cosine double, rk bigint"
        )
    q_ids = [r[0] for r in q_rows]
    q_mat = [list(map(float, r[1])) for r in q_rows]
    q_lbls = [r[2] for r in q_rows] if lbl else None
    kk = k + pad
    v = vec_col

    def nominate(batches):
        # closure pickles by value: numpy + plain lists only (the
        # driver may run this from a session that cannot import the
        # engine package on executors). Per-batch candidates merge into
        # a running per-PARTITION top-(k+pad) heap, emitted once at
        # partition end, so candidate traffic really is
        # O(partitions * |Q| * (k+pad)) however many Arrow batches a
        # partition splits into.
        import numpy as np
        import pandas as pd

        Q = np.asarray(q_mat, dtype=np.float64)
        Qd = np.linalg.norm(Q, axis=1, keepdims=True)
        Qn = Q / np.where(Qd > 0, Qd, 1.0)
        qid = np.asarray(q_ids, dtype=np.int64)
        best_s = None  # (nq, <=kk) running scores
        best_c = None  # (nq, <=kk) matching candidate ids
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[v].values]
            )
            Cd = np.linalg.norm(C, axis=1, keepdims=True)
            Cn = C / np.where(Cd > 0, Cd, 1.0)
            S = Qn @ Cn.T  # (nq, batch)
            if q_lbls is not None:
                same = (
                    np.asarray(q_lbls, dtype=object)[:, None]
                    == np.asarray(pdf["_lbl"].values, dtype=object)[None, :]
                )
                S = np.where(same, -np.inf, S)
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

    c_scan = [F.col(corpus_id).alias("_cid"), F.col(v)] + (
        [F.col(lbl).alias("_lbl")] if lbl else []
    )
    cands = (
        corpus.select(*c_scan)
        .mapInPandas(nominate, "query_id bigint, cand_id bigint")
        .filter(F.col("query_id") != F.col("cand_id"))
        .distinct()
    )
    c_cols = [
        F.col(corpus_id).alias("cand_id"),
        F.col(v).alias("cv"),
        l2_norm(F.col(v)).alias("cn"),
    ] + ([F.col(lbl).alias("_clbl")] if lbl else [])
    c_side = corpus.select(*c_cols)
    q_cols2 = [
        F.col(query_id).alias("query_id"),
        F.col(v).alias("qv"),
        l2_norm(F.col(v)).alias("qn"),
    ] + ([F.col(lbl).alias("_qlbl")] if lbl else [])
    q_side = queries.select(*q_cols2)
    rescored = (
        cands.join(c_side, "cand_id")
        .join(F.broadcast(q_side), "query_id")
        .select(
            "query_id",
            "cand_id",
            cosine_with_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("cos"),
            *([(F.col("_clbl") != F.col("_qlbl")).alias("_diff")] if lbl else []),
        )
    )
    if lbl:
        rescored = rescored.filter(F.col("_diff")).drop("_diff")
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 4).alias("cosine"), "rk")
    )


def bipartite_cosine_pairs(
    corpus: DataFrame,
    block: DataFrame,
    threshold: float,
    corpus_id: str = "vec_id",
    block_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact (block_id, corpus_id, cosine) pairs with cosine >=
    threshold between two DISJOINT vector sets — the benchmark-vs-train
    contamination shape (the embedding analogue of the n-gram
    decontamination in operators/decontaminate.py).

    The block side (a benchmark suite: tiny by nature) ships inside a
    mapInPandas closure; each corpus partition does ONE numpy matmul
    against it — a single corpus pass, no shuffle, no join. Survivors
    of the float32 1e-3 guard band get their cosine recomputed with the same
    sequential-fold expression the DuckDB oracle uses, so outputs are
    bit-identical to a per-pair evaluation (the matmul only nominates).
    """
    pdf = block.select(F.col(block_id).alias("b"), F.col(vec_col).alias("v")).toPandas()
    if len(pdf) == 0:  # empty benchmark block -> no pairs, by definition
        return corpus.sparkSession.createDataFrame(
            [], "bench_id bigint, train_id bigint, cosine double"
        )
    b_ids = np.asarray(pdf["b"].to_numpy(), dtype=np.int64)
    # float32 mine, wide guard: same recall-only contract as
    # _tile_miner — the exact fold re-score below re-filters at the
    # true threshold (source column is array<float>, f32 loses nothing)
    b_mat = np.array([np.asarray(v, dtype=np.float32) for v in pdf["v"]])
    b_norms = np.linalg.norm(b_mat, axis=1)
    guard = threshold - 1e-3

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        for part in batches:
            ids = _np.asarray(part["i"].to_numpy(), dtype=_np.int64)
            A = _np.array([_np.asarray(v, dtype=_np.float32) for v in part["v"]])
            if len(A) == 0:
                continue
            cos = (A @ b_mat.T) / _np.outer(_np.linalg.norm(A, axis=1), b_norms)
            ii, jj = _np.nonzero(cos >= guard)
            if len(ii):
                yield _pd.DataFrame({"bench_id": b_ids[jj], "train_id": ids[ii]})

    cand = (
        corpus.select(F.col(corpus_id).alias("i"), F.col(vec_col).alias("v"))
        .mapInPandas(gen, "bench_id bigint, train_id bigint")
    )
    b_side = block.select(
        F.col(block_id).alias("bench_id"),
        F.col(vec_col).alias("bv"),
        l2_norm(F.col(vec_col)).alias("bn"),
    )
    c_side = corpus.select(
        F.col(corpus_id).alias("train_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    return (
        cand.join(F.broadcast(b_side), "bench_id")
        .join(c_side, "train_id")
        .select(
            "bench_id",
            "train_id",
            cosine_with_norms(F.col("bv"), F.col("cv"), F.col("bn"), F.col("cn")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("bench_id", "train_id", F.round("cos", 4).alias("cosine"))
    )
