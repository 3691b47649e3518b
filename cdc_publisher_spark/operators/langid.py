"""Heuristic language identification (SURVEY.md §2.2 K / north star
"text analysis": n-gram heuristic).

Classic character-n-gram profile classifier (Cavnar-Trenkle shape):

- **fit** (distributed): one groupBy aggregation computes per-language
  character-trigram counts from a labeled sample; the top-N profile
  per language is collected to the driver (profiles are tiny — N
  floats per language).
- **predict** (distributed): a vectorized pandas UDF scores each
  document's trigram counts against the broadcast profiles by cosine
  similarity and emits the argmax language.

The synthetic documents table carries no real language signal (word
soup with a random ``lang`` label), so accuracy there is chance-level
by construction; tests/test_operators.py verifies the classifier on a
crafted corpus where the signal exists, and verifies plumbing
(schema, determinism) on the synthetic table.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

PROFILE_SIZE = 300


def trigrams(text_col: str) -> Column:
    """Character trigrams of lowercased text (SQL expression; the
    column must be referenced by name for the lambda substring)."""
    return F.expr(
        f"transform(sequence(1, greatest(length(lower({text_col})) - 2, 0)),"
        f" i -> substring(lower({text_col}), i, 3))"
    )


def fit_profiles(
    labeled: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> dict[str, dict[str, float]]:
    """Per-language top-N trigram frequency profiles (L2-normalized)."""
    grams = labeled.select(
        F.col(label_col).alias("lang"), F.explode(trigrams(text_col)).alias("g")
    )
    counts = grams.groupBy("lang", "g").count()
    rows = (
        counts.withColumn(
            "rk",
            F.row_number().over(W.partitionBy("lang").orderBy(F.col("count").desc(), F.col("g"))),
        )
        .filter(F.col("rk") <= PROFILE_SIZE)
        .collect()
    )
    profiles: dict[str, dict[str, float]] = {}
    for r in rows:
        profiles.setdefault(r["lang"], {})[r["g"]] = float(r["count"])
    for lang, prof in profiles.items():
        norm = math.sqrt(sum(v * v for v in prof.values()))
        profiles[lang] = {g: v / norm for g, v in prof.items()}
    return profiles


def predict_lang(text: Column, profiles: dict[str, dict[str, float]]) -> Column:
    """Column: argmax-cosine language for each document (pandas UDF;
    the profiles dict is captured by value in the closure — small by
    construction, so no broadcast variable needed)."""
    profs = {k: dict(v) for k, v in sorted(profiles.items())}

    @F.pandas_udf("string")
    def _pred(s):  # type: ignore[no-untyped-def]
        import math as _math
        from collections import Counter

        import pandas as pd

        def one(t: str | None) -> str | None:
            if not t:
                return None
            tl = t.lower()
            counts = Counter(tl[i : i + 3] for i in range(max(len(tl) - 2, 0)))
            norm = _math.sqrt(sum(c * c for c in counts.values()))
            if norm == 0:
                return None
            best_lang, best_score = None, -1.0
            for lang, prof in profs.items():
                score = sum(c * prof.get(g, 0.0) for g, c in counts.items()) / norm
                if score > best_score:
                    best_lang, best_score = lang, score
            return best_lang

        return pd.Series([one(t) for t in s])

    return _pred(text)


def classify(
    df: DataFrame,
    profiles: dict[str, dict[str, float]],
    text_col: str = "text",
    out_col: str = "lang_pred",
) -> DataFrame:
    return df.withColumn(out_col, predict_lang(F.col(text_col), profiles))
