"""Gaps-and-islands sessionization + per-session analytics (SURVEY.md
§2.2 E; generalizes the event-stream grouping the reference never
needed but every clickstream/telemetry consumer of a CDC feed runs).

Batch twin of Spark's streaming ``session_window`` (q_i3): a session
breaks on a silence longer than ``gap`` per key. Both window levels —
the break-flag lag/cumsum over events AND the idle-gap lag over the
resulting sessions — partition by the same key, so Spark plans ONE
hash exchange for the whole thing (pinned by the q_e9 plan audit).

At 100 TB: shuffle volume is O(events) once on the key, the per-key
sort is the only super-linear term, and no global window exists
anywhere. Hot keys (a bot user with millions of events) concentrate in
single tasks — AQE skew handling does not split window partitions, so
pre-filter pathological keys if the key distribution is adversarial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "us",
    order_col: str | None = None,
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Label every event with its session ordinal per key.

    ``ts_us_col`` must be epoch-micros (bigint); ``order_col`` breaks
    ties between equal timestamps deterministically (defaults to the
    timestamp alone). Adds ``session_num`` (1-based per key).
    """
    order_cols = [ts_us_col] + ([order_col] if order_col else [])
    w = W.partitionBy(key_col).orderBy(*order_cols)
    prev: Column = F.lag(ts_us_col).over(w)
    flagged = df.withColumn(
        "_brk",
        F.when(prev.isNull() | ((F.col(ts_us_col) - prev) > gap_us), 1).otherwise(0),
    )
    return flagged.withColumn(
        "session_num",
        F.sum("_brk").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("bigint"),
    ).drop("_brk")


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "us",
    value_col: str | None = None,
    order_col: str | None = None,
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """One row per session: bounds, duration, event count, optional
    exact value sum, and the idle gap since the key's previous session
    (-1 for the first). The session-level window reuses the event
    window's hash partitioning — no extra exchange."""
    from cdc_publisher_spark.queries.aggregation import dsum

    events = sessionize(df, key_col, ts_us_col, order_col, gap_us)
    aggs = [
        F.min(ts_us_col).alias("start_us"),
        F.max(ts_us_col).alias("end_us"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        aggs.append(dsum(F.col(value_col)).alias("session_value"))
    sessions = events.groupBy(key_col, "session_num").agg(*aggs)
    sw = W.partitionBy(key_col).orderBy("session_num")
    return sessions.select(
        "*",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        F.coalesce(
            F.col("start_us") - F.lag("end_us").over(sw), F.lit(-1).cast("bigint")
        ).alias("idle_us"),
    )


def session_stats_py(
    rows: list[tuple[int, int, float]], gap_us: int = 1_800_000_000
) -> dict[tuple[int, int], tuple[int, int, int, int]]:
    """Pure-Python twin for property tests: rows are (key, ts_us,
    order_tiebreak); returns {(key, session_num): (start, end,
    n_events, idle_us)}. Same tie-break: sort by (ts, order)."""
    from collections import defaultdict

    by_key: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for k, ts, o in rows:
        by_key[k].append((ts, o))
    out: dict[tuple[int, int], tuple[int, int, int, int]] = {}
    for k, evs in by_key.items():
        evs.sort()
        snum = 0
        prev_ts: int | None = None
        cur: list[int] = []
        prev_end: int | None = None

        def close(session: list[int], n: int, prev_end_: int | None) -> int:
            idle = -1 if prev_end_ is None else session[0] - prev_end_
            out[(k, n)] = (session[0], session[-1], len(session), idle)
            return session[-1]

        for ts, _o in evs:
            if prev_ts is None or ts - prev_ts > gap_us:
                if cur:
                    prev_end = close(cur, snum, prev_end)
                snum += 1
                cur = []
            cur.append(ts)
            prev_ts = ts
        if cur:
            close(cur, snum, prev_end)
    return out
