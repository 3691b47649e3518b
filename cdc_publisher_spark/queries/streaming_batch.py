"""Family I, batch-equivalent forms (SURVEY.md §2.2 I, §5.2.2).

Streaming semantics themselves are pytest'd with memory sinks
(tests/test_streaming.py); these are the deterministic batch
equivalents that DuckDB can oracle-check: Spark's ``window()`` /
sessionization expressed over the static events table. The window
bucketing here is byte-identical to what the streaming queries emit,
so the streaming tests assert stream-result == these batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.queries.aggregation import dsum
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_i1_tumbling_hour",
    family="I",
    bench=True,
    doc="Tumbling 1-hour windows over events via window(); oracle is "
    "date_trunc bucketing (identical start instants).",
    oracle="""
        SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY bucket_us, event_type
    """,
)
def q_i1_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "decimal(18,6)").alias("total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("bucket_us", "event_type")
    )


@register(
    "q_i2_sliding_hour",
    family="I",
    doc="Sliding windows (1 h length, 30 min slide): each event lands "
    "in 2 windows. Oracle reproduces the window-start set with a "
    "2-row offset cross join.",
    oracle="""
        SELECT (epoch_us(ts) // 1800000000 - k) * 1800000000 AS win_start_us,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        CROSS JOIN (SELECT CAST(x AS BIGINT) AS k FROM generate_series(0, 1) t(x)) offs
        GROUP BY 1
        ORDER BY win_start_us
    """,
)
def q_i2_sliding_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "n",
            "n_users",
        )
        .orderBy("win_start_us")
    )


@register(
    "q_i3_sessionize",
    family="I",
    doc="Sessionization (30-minute inactivity gap) in pure window "
    "algebra: lag-gap flag -> running session counter -> per-session "
    "aggregate. The streaming twin uses session_window(); "
    "tests/test_streaming.py asserts both agree.",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT *, SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               COUNT(*) AS n_events,
               epoch_us(MIN(ts)) AS session_start_us,
               epoch_us(MAX(ts)) AS session_end_us,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        FROM sessions
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
)
def q_i3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            dsum(F.col("value"), "decimal(18,6)").alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "q_i4_malformed_monitor",
    family="I",
    doc="Rate-limited malformed-message signal (reference "
    "jms_publisher.clj:17,84-99: one logged payload per 10 minutes): "
    "per-10-min-window count + MIN exemplar via "
    "streaming/monitor.malformed_rate_monitor, run in its batch form "
    "over a dead-letter stand-in slice of events. The streaming form "
    "is the same aggregate with a watermark (pytest memory-sink).",
    oracle="""
        SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
               COUNT(*) AS malformed_count,
               MIN(props) AS example_payload
        FROM events
        WHERE event_type = 'error'
        GROUP BY 1
        ORDER BY window_start_us
    """,
)
def q_i4_malformed_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.streaming.monitor import malformed_rate_monitor

    dead = load(spark, sf_dir, "events").filter(F.col("event_type") == "error").select(
        "ts", F.col("props").alias("value")
    )
    mon = malformed_rate_monitor(dead, ts_col="ts", value_col="value")
    return mon.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "malformed_count",
        "example_payload",
    ).orderBy("window_start_us")


def _psi_oracle_sql() -> str:
    """Build the 10-bucket smoothed-PSI oracle with the SAME left-fold
    term order the Spark expression uses (bit-identical doubles)."""
    n_ref = ", ".join(
        f"SUM(CASE WHEN event_type = 'click' AND bucket = {b} THEN 1 ELSE 0 END) AS n_ref_{b}"
        for b in range(10)
    )
    n_new = ", ".join(
        f"SUM(CASE WHEN event_type = 'purchase' AND bucket = {b} THEN 1 ELSE 0 END) AS n_new_{b}"
        for b in range(10)
    )
    t_ref = " + ".join(f"n_ref_{b}" for b in range(10))
    t_new = " + ".join(f"n_new_{b}" for b in range(10))
    terms = " + ".join(
        f"ROUND(((n_ref_{b} + 1.0) / (({t_ref}) + 10.0) - (n_new_{b} + 1.0) / (({t_new}) + 10.0))"
        f" * ln(((n_ref_{b} + 1.0) / (({t_ref}) + 10.0)) / ((n_new_{b} + 1.0) / (({t_new}) + 10.0))), 8)"
        for b in range(10)
    )
    return f"""
        WITH e AS (
            SELECT event_type,
                   LEAST(CAST(FLOOR(value / 50.0) AS INT), 9) AS bucket,
                   (epoch_us(ts) // 604800000000) * 604800 AS win_start_s
            FROM events
            WHERE event_type IN ('click', 'purchase')
        ),
        counted AS (
            SELECT win_start_s, {n_ref}, {n_new}
            FROM e GROUP BY win_start_s
        )
        SELECT win_start_s,
               CAST({t_ref} AS BIGINT) AS n_ref,
               CAST({t_new} AS BIGINT) AS n_new,
               ROUND({terms}, 6) AS psi
        FROM counted
        ORDER BY win_start_s
    """


@register(
    "q_i5_drift_monitor",
    family="I",
    doc="Streaming drift monitor in its batch form: per-7-day-window "
    "PSI between click and purchase value distributions "
    "(streaming/monitor.drift_monitor — ONE windowed aggregate of 20 "
    "conditional counts, PSI as a fixed-order closed-form expression; "
    "streaming aggregations cannot nest, so this shape is what runs "
    "with a watermark in production; stream==batch pinned in "
    "tests/test_streaming.py).",
    oracle=_psi_oracle_sql(),
)
def q_i5_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.streaming.monitor import drift_monitor

    ev = load(spark, sf_dir, "events")
    return drift_monitor(ev).orderBy("win_start_s")


@register(
    "q_i6_interval_join",
    family="I",
    doc="Batch twin of the stream-stream left-outer interval join "
    "(tests/test_streaming.py::test_stream_stream_left_outer_interval_"
    "join_equals_batch asserts the streamed result equals this shape): "
    "each view joined to the same user's clicks in the following hour, "
    "unmatched views kept. At scale the watermark bounds streaming "
    "state to 2 h per side; the batch form is one shuffle on user_id.",
    oracle="""
        SELECT v.user_id,
               v.event_id AS view_id,
               COALESCE(c.event_id, -1) AS click_id,
               COALESCE(epoch_us(c.ts) - epoch_us(v.ts), -1) AS lag_us
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON v.user_id = c.user_id
         AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        ORDER BY v.user_id, view_id, click_id
    """,
)
def q_i6_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        v.join(c, cond, "left")
        .select(
            "user_id",
            "view_id",
            F.coalesce("c_id", F.lit(-1)).alias("click_id"),
            F.coalesce(
                F.unix_micros("c_ts") - F.unix_micros("v_ts"), F.lit(-1)
            ).alias("lag_us"),
        )
        .orderBy("user_id", "view_id", "click_id")
    )


@register(
    "q_i7_stream_dedupe",
    family="I",
    doc="Exactly-once projection of an at-least-once event feed: first "
    "event per (user_id, event_type) with total-order tie-break "
    "(ts, event_id) — the batch twin of Structured Streaming's "
    "dropDuplicatesWithinWatermark path, whose stream-mode semantics "
    "(redeliveries collapse across micro-batches within the "
    "watermark) are pinned in tests/test_streaming.py::"
    "test_drop_duplicates_within_watermark and the stream==batch "
    "test. One min(struct) aggregation — map-side partial combine, "
    "fixed-width shuffle on the dedup key.",
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_type, ts, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_events
            FROM events
        )
        SELECT user_id, event_type,
               epoch_us(ts) AS first_ts_us,
               event_id AS first_event_id,
               CAST(n_events AS BIGINT) AS n_events
        FROM ranked WHERE rn = 1
        ORDER BY user_id, event_type
    """,
)
def q_i7_stream_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.min(F.struct("ts", "event_id")).alias("first"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("first.ts")).alias("first_ts_us"),
            F.col("first.event_id").alias("first_event_id"),
            "n_events",
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "q_i8_session_window",
    family="I",
    doc="Sessionization through Spark's BUILT-IN session_window() "
    "operator (30-minute gap) — the same semantics q_i3 derives from "
    "raw window algebra, but exercising the dedicated "
    "SessionWindowing physical node (also the streaming-native path: "
    "session_window works under readStream where q_i3's unbounded "
    "lag() cannot). Oracle reproduces gap-based sessions with SQL "
    "window functions; session_end in Spark's definition is "
    "last_event + gap, mirrored in the oracle.",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT *, SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        )
        SELECT user_id,
               epoch_us(MIN(ts)) AS session_start_us,
               epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        FROM sessions
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_start_us
    """,
)
def q_i8_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value"), "decimal(18,6)").alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start_us")
    )
