"""Family E — window functions (SURVEY.md §2.2 E).

Generalizes the reference's argmax-by-offset (A1) to the full window
grammar. Every orderBy carries a unique tiebreak column so ranks and
frames are deterministic — a window result that depends on shuffle
order is not hash-checkable (and not reproducible at scale either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_e1_rank_customers",
    family="E",
    doc="row_number / rank / dense_rank per nation by acctbal.",
    oracle="""
        SELECT c_custkey, c_nationkey,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
               rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
               dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
        FROM customer
        ORDER BY c_custkey
    """,
)
def q_e1_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    by_bal = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    unique = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(unique).cast("bigint").alias("rn"),
        F.rank().over(by_bal).cast("bigint").alias("rnk"),
        F.dense_rank().over(by_bal).cast("bigint").alias("drnk"),
    ).orderBy("c_custkey")


@register(
    "q_e2_lag_lead_events",
    family="E",
    doc="lag/lead over the per-user event stream. Neighbor ids are "
    "coalesced to -1: nullable-int columns round-trip differently "
    "through pandas on the two engines.",
    oracle="""
        SELECT event_id, user_id,
               COALESCE(lag(event_id)  OVER w, -1) AS prev_id,
               COALESCE(lead(event_id) OVER w, -1) AS next_id,
               ROUND(value - COALESCE(lag(value) OVER w, 0.0), 4) AS delta_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
)
def q_e2_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(F.lag("event_id").over(w), F.lit(-1)).alias("prev_id"),
        F.coalesce(F.lead("event_id").over(w), F.lit(-1)).alias("next_id"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4).alias("delta_value"),
    ).orderBy("event_id")


@register(
    "q_e3_running_order_total",
    family="E",
    bench=True,
    doc="Running sum of order totals per customer (frame: unbounded "
    "preceding → current). Prefix sums add in frame order on both "
    "engines; rounded anyway.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
        FROM orders
        ORDER BY o_orderkey
    """,
)
def q_e3_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias("running_total"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    ).orderBy("o_orderkey")


@register(
    "q_e4_sliding_avg_value",
    family="E",
    doc="Sliding 3-row mean of event value per user (frame -2..0).",
    oracle="""
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
        FROM events
        ORDER BY event_id
    """,
)
def q_e4_sliding_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg3"),
    ).orderBy("event_id")


@register(
    "q_e5_ntile_quartiles",
    family="E",
    doc="ntile(4) by account balance (unique order).",
    oracle="""
        SELECT c_custkey,
               ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
        FROM customer
        ORDER BY c_custkey
    """,
)
def q_e5_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).cast("bigint").alias("quartile")).orderBy("c_custkey")


@register(
    "q_e6_first_last_value",
    family="E",
    doc="first_value/last_value with an explicit full-partition frame "
    "(the default frame would make last_value = current row).",
    oracle="""
        SELECT c_custkey, c_nationkey,
               first_value(c_custkey) OVER w AS richest_cust,
               last_value(c_custkey)  OVER w AS poorest_cust
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY c_custkey
    """,
)
def q_e6_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.last("c_custkey").over(w).alias("poorest_cust"),
    ).orderBy("c_custkey")


@register(
    "q_e7_range_frame",
    family="E",
    doc="RANGE frame with interval bounds: trailing-30-day order count "
    "and spend per customer (a range frame scans by value, not row "
    "position — the other physical frame kind).",
    oracle="""
        SELECT o_orderkey, o_custkey,
               COUNT(*) OVER w AS n_last_30d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS spend_last_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey
    """,
)
def q_e7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               COUNT(*) OVER w AS n_last_30d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS spend_last_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey
        """
    )


@register(
    "q_e8_funnel_stages",
    family="E",
    doc="Funnel / sequence analytics: per user, first 'view', first "
    "'click' AFTER that view, first 'purchase' AFTER that click — "
    "chained conditional min-windows over ONE user partitioning, so "
    "the whole funnel costs a single shuffle + sort (no self-joins, "
    "no per-stage passes). Timestamps leave as epoch micros.",
    oracle="""
        WITH s1 AS (
            SELECT user_id, ts, event_type,
                   MIN(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id) AS v_ts
            FROM events
        ),
        s2 AS (
            SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
                          OVER (PARTITION BY user_id) AS c_ts
            FROM s1
        ),
        s3 AS (
            SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
                          OVER (PARTITION BY user_id) AS p_ts
            FROM s2
        )
        SELECT DISTINCT user_id,
               epoch_us(v_ts) AS view_us,
               epoch_us(c_ts) AS click_us,
               epoch_us(p_ts) AS purchase_us,
               CAST(CASE WHEN v_ts IS NULL THEN 0
                         WHEN c_ts IS NULL THEN 1
                         WHEN p_ts IS NULL THEN 2
                         ELSE 3 END AS BIGINT) AS funnel_stage
        FROM s3 ORDER BY user_id
    """,
)
def q_e8_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cdc_publisher_spark.tables import load

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "v_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "c_ts",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "p_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")), F.col("ts")
            )
        ).over(w),
    )
    return (
        s3.select(
            "user_id",
            F.unix_micros("v_ts").alias("view_us"),
            F.unix_micros("c_ts").alias("click_us"),
            F.unix_micros("p_ts").alias("purchase_us"),
            F.when(F.col("v_ts").isNull(), 0)
            .when(F.col("c_ts").isNull(), 1)
            .when(F.col("p_ts").isNull(), 2)
            .otherwise(3)
            .cast("bigint")
            .alias("funnel_stage"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "q_e9_session_analytics",
    family="E",
    bench=True,  # heaviest multi-level window over the events table
    doc="Two-level session analytics over the gaps-and-islands "
    "sessionization (q_i3 is the sessionize step; this is what a "
    "product team runs on top): per-session duration, event count, "
    "value, PLUS a second window over the sessions themselves — "
    "inter-session idle gap (lag of previous session's end) and "
    "session ordinal per user. Both window levels partition by "
    "user_id, so the session-level window reuses the aggregation's "
    "hash partitioning — Spark inserts no second exchange.",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us, value
            FROM events
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN us - LAG(us) OVER w > 1800000000 OR
                             LAG(us) OVER w IS NULL
                        THEN 1 ELSE 0 END AS brk
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        numbered AS (
            SELECT *,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
            FROM flagged
        ),
        sessions AS (
            SELECT user_id, session_num,
                   MIN(us) AS start_us,
                   MAX(us) AS end_us,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS session_value
            FROM numbered
            GROUP BY user_id, session_num
        )
        SELECT user_id, session_num, start_us, end_us,
               end_us - start_us AS duration_us,
               n_events, session_value,
               COALESCE(start_us - LAG(end_us) OVER sw, -1) AS idle_us
        FROM sessions
        WINDOW sw AS (PARTITION BY user_id ORDER BY session_num)
        ORDER BY user_id, session_num
    """,
)
def q_e9_session_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.sessionize import session_stats

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    return session_stats(
        e, key_col="user_id", ts_us_col="us", value_col="value", order_col="event_id"
    ).select(
        "user_id",
        "session_num",
        "start_us",
        "end_us",
        "duration_us",
        "n_events",
        "session_value",
        "idle_us",
    ).orderBy("user_id", "session_num")


@register(
    "q_e10_distribution_functions",
    family="E",
    doc="percent_rank / cume_dist / nth_value per nation over supplier "
    "account balances. Unique tiebreak (s_suppkey) makes every rank "
    "deterministic; nth_value gets an explicit full-partition frame so "
    "both engines evaluate it over the whole partition rather than the "
    "default running frame. Missing 2nd element coalesces to -1 "
    "(nullable-int pandas round-trip differs between engines).",
    oracle="""
        SELECT s_suppkey, s_nationkey,
               ROUND(percent_rank() OVER w, 4) AS pr,
               ROUND(cume_dist()    OVER w, 4) AS cd,
               COALESCE(nth_value(s_suppkey, 2) OVER (
                   PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), -1)
                   AS second_suppkey
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        ORDER BY s_suppkey
    """,
)
def q_e10_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
        F.coalesce(F.nth_value("s_suppkey", 2).over(full), F.lit(-1)).alias("second_suppkey"),
    ).orderBy("s_suppkey")
