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
