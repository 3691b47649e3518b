"""Rate-limited malformed-message signal (SURVEY.md §2.1 E1).

The reference logs a malformed payload at most once per 10 minutes
(log-malformed-dml with a rate-limited logger, jms_publisher.clj:17,
84-99,180-186): operators see *that* malformed traffic exists and one
example, without a log line per poison message.

The Spark-native shape of "at most one logged payload per interval" is
a windowed aggregate over the dead-letter branch: per 10-minute window,
the malformed count and a single exemplar payload (``min`` — the
deterministic choice; ``first`` is nondeterministic under retries).
Downstream it feeds a console/log sink or the control topic. Partial
aggregation makes this O(windows) state, not O(messages) — safe at any
scale, unlike per-message logging which melts the driver at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def malformed_rate_monitor(
    dead_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    interval: str = "10 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Dead-letter stream -> one row per ``interval`` window:
    (window_start, window_end, malformed_count, example_payload).

    ``watermark`` bounds streaming state (None for batch use). Works
    identically on a batch DataFrame — the window() aggregate is the
    same GROUP BY date-bin either way, which is how the test oracle
    checks it.
    """
    df = dead_df
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), interval)
    return (
        df.groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("malformed_count"),
            F.min(value_col).alias("example_payload"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "malformed_count",
            "example_payload",
        )
    )


def drift_monitor(
    df: DataFrame,
    cohort_col: str = "event_type",
    ref_cohort: str = "click",
    new_cohort: str = "purchase",
    value_col: str = "value",
    ts_col: str = "ts",
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    interval: str = "7 days",
    watermark: str | None = "1 day",
) -> DataFrame:
    """Per-event-time-window population-stability index between two
    cohorts' value distributions — the streaming twin of q_k38's batch
    drift report.

    Streaming aggregations cannot nest, so the whole computation is ONE
    windowed aggregate: 2×``n_buckets`` conditional counts, then the
    Laplace-smoothed PSI as a closed-form expression over those counts
    (a fixed-order sum of ``n_buckets`` terms, so batch and stream — and
    the DuckDB oracle — produce bit-identical doubles). State is
    O(windows), nothing per-event.
    """
    d = df.filter(F.col(cohort_col).isin(ref_cohort, new_cohort))
    if watermark is not None and d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    bucket = F.least(
        F.floor(F.col(value_col) / bucket_width).cast("int"), F.lit(n_buckets - 1)
    )
    aggs = []
    for b in range(n_buckets):
        for label, cohort in (("ref", ref_cohort), ("new", new_cohort)):
            aggs.append(
                F.sum(
                    F.when(
                        (F.col(cohort_col) == cohort) & (bucket == b), 1
                    ).otherwise(0)
                ).alias(f"n_{label}_{b}")
            )
    win = F.window(F.col(ts_col), interval)
    counted = d.groupBy(win.alias("w")).agg(*aggs)
    t_ref = sum(F.col(f"n_ref_{b}") for b in range(n_buckets))
    t_new = sum(F.col(f"n_new_{b}") for b in range(n_buckets))
    terms = []
    for b in range(n_buckets):
        p = (F.col(f"n_ref_{b}") + 1.0) / (t_ref + float(n_buckets))
        q = (F.col(f"n_new_{b}") + 1.0) / (t_new + float(n_buckets))
        terms.append(F.round((p - q) * F.log(p / q), 8))
    psi = terms[0]
    for t in terms[1:]:  # explicit left-fold: fixed evaluation order
        psi = psi + t
    return counted.select(
        F.unix_timestamp(F.col("w.start")).alias("win_start_s"),
        t_ref.cast("bigint").alias("n_ref"),
        t_new.cast("bigint").alias("n_new"),
        F.round(psi, 6).alias("psi"),
    )
