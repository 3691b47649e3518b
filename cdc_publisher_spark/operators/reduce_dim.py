"""PCA dimensionality reduction over an embedding column (SURVEY.md §2.2
K-family extension; round-3 addition).

Training-data pipelines project embeddings to a low-rank basis before
clustering / indexing (SemDeDup's paper pipeline does exactly this).
The scale-correct decomposition on Spark:

1. **Distributed moment pass** (:func:`moments`): one `mapInPandas`
   scan emits, per *partition*, the partial statistics ``(n, Σx,
   XᵀX)`` — a single row of ``1 + d + d²`` doubles (d=64 → ~33 KB).
   Partials are accumulated across Arrow batches inside the iterator,
   so driver traffic is O(partitions · d²), never O(rows).
2. **Driver eigendecomposition**: the d×d covariance is tiny at any
   corpus scale; ``numpy.linalg.eigh`` on the driver is exact and
   O(d³). Eigenvector sign is canonicalized (largest-|coordinate|
   entry made positive) so the basis is deterministic up to eigh's
   ordering, which is ascending-eigenvalue and itself deterministic.
3. **Expression-only projection** (:func:`project`): the k components
   become literal arrays; each output coordinate is one
   ``zip_with``/``aggregate`` fold over the centered input — pure
   Catalyst, whole-stage codegen, no Python in the per-row path.

Covariance uses the sample (n−1) normalization so ``trace(cov)``
equals the sum of per-dimension ``var_samp`` — the SQL-reproducible
invariant the registered query (queries/llm_ml.py::q_k46) checks.

Reference parity: the reference engine has no linear algebra (it is a
CDC microservice, `/root/reference/src/cdc_publisher/core.clj:1-22`);
this operator is part of the declared LLM-data extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    n: int
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, desc eigenvalue
    explained_variance: np.ndarray  # (k,) sample-normalized eigenvalues
    total_variance: float  # trace of the sample covariance


def moments(df: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → ``(n, Σx, XᵀX)``.

    Emits ONE row per partition (accumulated across the iterator's
    Arrow batches), each carrying the flattened d×d partial Gram —
    the same bounded-driver-traffic shape as operators/ann.py's
    nominate paths.
    """

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in it:
            if pdf.empty:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    parts = df.select(vec_col).mapInPandas(
        part, schema="n long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("moments: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    return n, s, g


def fit_pca(df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    n, s, g = moments(df, vec_col)
    if n < 2:
        raise ValueError("fit_pca: need at least 2 rows")
    mean = s / n
    # Sample covariance: (XᵀX − n·μμᵀ) / (n−1).
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # Deterministic sign: largest-|coordinate| entry positive.
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        n=n,
        mean=mean,
        components=comps,
        explained_variance=evals[order],
        total_variance=float(np.trace(cov)),
    )


def _lit_array(vals) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def project(df: DataFrame, model: PCAModel, vec_col: str = "embedding",
            out_col: str = "proj") -> DataFrame:
    """Append ``out_col`` = k projected coordinates of the centered
    vector. Pure Catalyst: one zip_with fold per component over
    literal arrays — no UDF, no Arrow hop, codegen-friendly."""
    centered = F.zip_with(
        F.col(vec_col), _lit_array(model.mean), lambda x, m: x.cast("double") - m
    )
    coords = [
        F.aggregate(
            F.zip_with(centered, _lit_array(c), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in model.components
    ]
    return df.withColumn(out_col, F.array(*coords))
