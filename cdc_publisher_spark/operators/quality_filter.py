"""Per-group quantile threshold filtering — "keep the top X% by
quality within each language/source" (the CCNet / Gopher-style quality
gate every pretraining pipeline runs; public method reference:
Wenzek et al. 2019, CCNet).

Two paths with identical semantics at the threshold:

- ``exact=True``: per-group ``percent_rank()`` window. Deterministic
  and oracle-checkable, but partitions by the group key — with a
  handful of languages over 100 TB those partitions are huge and
  skewed, so this is the verification path, not the scale path.
- ``exact=False`` (default): per-group ``percentile_approx`` computes
  the threshold in one tiny aggregation (GK sketch, map-side
  combined), which broadcasts back for a filter join. No global sort,
  no skew — the 100 TB path. Accuracy is the sketch's rank error
  (``accuracy`` parameter), which only shifts docs in the immediate
  neighborhood of the cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def quantile_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    q: float = 0.25,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Rows whose ``score_col`` sits at or above the ``q``-quantile of
    their ``group_col`` group (i.e. drop the bottom ``q`` fraction)."""
    if exact:
        pr = F.percent_rank().over(W.partitionBy(group_col).orderBy(score_col))
        return (
            df.withColumn("_pr", pr)
            .filter(F.col("_pr") >= q)
            .drop("_pr")
        )
    thresholds = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, q, accuracy).alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )
