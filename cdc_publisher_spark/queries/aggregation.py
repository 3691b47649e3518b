"""Family D — aggregation (SURVEY.md §2.2 D).

Generalizes the reference's only aggregations — latest-per-key argmax and
max-offset (kafka_ccd_store.clj:28-42,133) — to full grouped analytics.
Spark executes these as partial+final hash aggregates (map-side combine
before the shuffle), which is exactly the shape that survives 100 TB:
shuffle volume is O(groups), not O(rows).

Float canonicalization: SUMs go through an exact DECIMAL cast so Spark
and DuckDB agree bit-for-bit regardless of summation order; AVG/STDDEV
stay double and are ROUNDed (see registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


def dsum(col, scale_spec: str = "decimal(22,6)"):
    """Exact sum of a double expression: cast each row to DECIMAL, sum
    (Spark widens precision, cannot overflow here), cast back to DOUBLE.
    Bit-stable across engines and summation orders."""
    return F.sum(col.cast(scale_spec)).cast("double")


@register(
    "q_d1_pricing_summary",
    family="D",
    bench=True,
    doc="TPC-H Q1 shape: 8 aggregates + count-distinct over lineitem "
    "grouped by returnflag/linestatus. The engine's flagship batch agg. "
    "The count-distinct runs as a SEPARATE narrow aggregation "
    "(3-column pruned scan) broadcast-joined back on the group keys: "
    "keeping it inline makes Catalyst plan an Expand that duplicates "
    "every row — with all 7 DECIMAL/double agg columns — through the "
    "exchange, ~1.5x the single-node wall clock and ~2x the shuffle "
    "volume at cluster scale. Long-cent sums were measured faster "
    "still but overflow int64 at ~1e12 price rows, so DECIMAL sums "
    "stay (exact, order-independent, overflow-free at 100 TB).",
    oracle="""
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)       AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)  AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
          ROUND(AVG(l_quantity), 4)      AS avg_qty,
          ROUND(AVG(l_extendedprice), 4) AS avg_price,
          ROUND(AVG(l_discount), 4)      AS avg_disc,
          COUNT(*)                       AS count_order,
          COUNT(DISTINCT l_orderkey)     AS n_orders
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def q_d1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    flt = F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    sums = (
        li.filter(flt)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "decimal(18,4)").alias("sum_qty"),
            dsum(F.col("l_extendedprice"), "decimal(18,4)").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
    # Narrow distinct side: the scan prunes to 3 columns, the exchange
    # carries (flag, status, orderkey) only — no Expand over the wide
    # aggregate row.
    n_orders = (
        li.filter(flt)
        .select("l_returnflag", "l_linestatus", "l_orderkey")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    return (
        sums.join(F.broadcast(n_orders), ["l_returnflag", "l_linestatus"])
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_d2_rollup_priority_year",
    family="D",
    doc="ROLLUP over (priority, year). Subtotal rows surface as 'ALL' "
    "markers (string-coalesced) so nullable-int dtype quirks can't "
    "break the oracle hash.",
    oracle="""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(CAST(CAST(year(o_orderdate) AS INT) AS VARCHAR), 'ALL') AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, CAST(year(o_orderdate) AS INT))
        ORDER BY priority, order_year
    """,
)
def q_d2_rollup_priority_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn("order_year_i", F.year("o_orderdate"))
    return (
        o.rollup("o_orderpriority", "order_year_i")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "decimal(18,4)").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("order_year_i").cast("string"), F.lit("ALL")).alias("order_year"),
            "n_orders",
            "total_price",
        )
        .orderBy("priority", "order_year")
    )


@register(
    "q_d2b_cube_status_priority",
    family="D",
    doc="CUBE over (orderstatus, priority): all four grouping sets.",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """,
)
def q_d2b_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "avg_price",
        )
        .orderBy("status", "priority")
    )


@register(
    "q_d3_dispersion_stats",
    family="D",
    doc="min/max/stddev_samp/var_samp per group, rounded for cross-"
    "engine float stability.",
    oracle="""
        SELECT o_orderstatus,
               ROUND(MIN(o_totalprice), 4) AS min_price,
               ROUND(MAX(o_totalprice), 4) AS max_price,
               ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd_price,
               ROUND(VAR_SAMP(o_totalprice), 1) AS var_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def q_d3_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
            F.round(F.var_samp("o_totalprice"), 1).alias("var_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_d4_filtered_agg",
    family="D",
    doc="Filtered aggregation: COUNT(*) FILTER / count_if / sum(CASE).",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
               CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
               CAST(SUM(CAST(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS taxed_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q_d4_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_all"),
            F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).cast("bigint").alias("n_discounted"),
            dsum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0), "decimal(18,4)").alias("taxed_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_d5_approx_distinct",
    family="D",
    doc="approx_count_distinct (HyperLogLog++) per returnflag — the "
    "scale path for COUNT(DISTINCT) at 100 TB (no exact distinct "
    "shuffle). HLL sketches differ across engines, so the registered "
    "form emits the INVARIANT the sketch must satisfy instead of the "
    "raw estimate: the exact counts (SQL-reproducible) plus a "
    "|approx-exact|/exact <= 0.05 boolean per measure, which the "
    "oracle asserts TRUE — if Spark's HLL ever drifts out of "
    "tolerance the hash flips red. The raw-estimate operator is "
    "approx_count_distinct itself; tests/test_aggregation_semantics.py "
    "pins the bound per group.",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS approx_orders_within_5pct,
               TRUE AS approx_parts_within_5pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q_d5_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            # rsd=0.01: ~10x margin under the 5% gate on every group
            # (default 0.05 rsd breached it on the largest group)
            F.approx_count_distinct("l_orderkey", 0.01).alias("_ao"),
            F.approx_count_distinct("l_partkey", 0.01).alias("_ap"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            "exact_parts",
            (
                F.abs(F.col("_ao") - F.col("exact_orders")) / F.col("exact_orders")
                <= 0.05
            ).alias("approx_orders_within_5pct"),
            (
                F.abs(F.col("_ap") - F.col("exact_parts")) / F.col("exact_parts")
                <= 0.05
            ).alias("approx_parts_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_d6_latest_event_per_user",
    family="D",
    doc="Argmax per key — the batch form of the reference's latest-"
    "value-per-key (kafka_ccd_store.clj:28-42): latest event value per "
    "user with (ts, event_id) tiebreak via max_by over a struct.",
    oracle="""
        SELECT user_id, event_id AS last_event_id, event_type AS last_type,
               ROUND(value, 4) AS last_value, epoch_us(ts) AS last_ts_us
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
        ORDER BY user_id
    """,
)
def q_d6_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_id", ordering).alias("last_event_id"),
            F.max_by("event_type", ordering).alias("last_type"),
            F.round(F.max_by("value", ordering), 4).alias("last_value"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
        )
        .orderBy("user_id")
    )


@register(
    "q_d9_percentiles",
    family="D",
    doc="Exact interpolated percentiles (median/p90) per group — "
    "Spark percentile() vs DuckDB quantile_cont(), both exact. The "
    "approximate scale path (percentile_approx, t-digest-style sketch) "
    "is checked by tolerance in tests/test_aggregation_semantics.py.",
    oracle="""
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def q_d9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_d10_cohort_retention",
    family="D",
    doc="Cohort retention: users grouped by first-activity day, distinct "
    "active users per (cohort, day-offset). Two aggregates and one join "
    "keyed on user_id — the cohort map joins on the same key the "
    "activity set is already partitioned by.",
    oracle="""
        WITH fd AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        SELECT strftime(fd.cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', fd.cohort_day, act.d) AS BIGINT) AS day_offset,
               CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_active
        FROM act JOIN fd USING (user_id)
        GROUP BY fd.cohort_day, day_offset ORDER BY 1, 2
    """,
)
def q_d10_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    fd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(fd, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "q_d11_gapfill_daily",
    family="D",
    doc="Time-series gap-fill / resample: per-user daily event counts "
    "DENSIFIED over each user's active span (zero rows for silent "
    "days) — sequence+explode builds the grid, a left join attaches "
    "observed counts. Grid size is O(users x span days), generated, "
    "never shuffled beyond the final count join.",
    oracle="""
        WITH span AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) d0, MAX(CAST(ts AS DATE)) d1
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, CAST(d0 + i * INTERVAL 1 DAY AS DATE) AS day
            FROM span CROSS JOIN generate_series(0, 4096) g(i)
            WHERE d0 + i * INTERVAL 1 DAY <= CAST(d1 AS TIMESTAMP)
        ),
        daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS c
            FROM events GROUP BY 1, 2
        )
        SELECT grid.user_id, strftime(grid.day, '%Y-%m-%d') AS day,
               CAST(COALESCE(daily.c, 0) AS BIGINT) AS n_events
        FROM grid LEFT JOIN daily USING (user_id, day)
        ORDER BY grid.user_id, day
    """,
)
def q_d11_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("c")
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "q_d12_grouping_sets",
    family="D",
    doc="Explicit GROUPING SETS — (status, priority), (status), "
    "(order_year) — a mixed set not expressible as one ROLLUP/CUBE. "
    "Spark expands to a single Expand+HashAggregate (one shuffle for "
    "all three sets).",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(CAST(CAST(year(o_orderdate) AS INT) AS VARCHAR), 'ALL') AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS (
            (o_orderstatus, o_orderpriority),
            (o_orderstatus),
            (CAST(year(o_orderdate) AS INT))
        )
        ORDER BY status, priority, order_year
    """,
)
def q_d12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn("order_year_i", F.year("o_orderdate"))
    return (
        o.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                ["order_year_i"],
            ],
            "o_orderstatus",
            "o_orderpriority",
            "order_year_i",
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "decimal(18,4)").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("order_year_i").cast("string"), F.lit("ALL")).alias("order_year"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority", "order_year")
    )


@register(
    "q_d13_corr_regression",
    family="D",
    doc="Bivariate statistics per group: Pearson corr, sample/population "
    "covariance, OLS slope+intercept (quantity vs extended price). All "
    "moment-based single-pass aggregates — partial+final shape, "
    "O(groups) shuffle.",
    oracle="""
        SELECT l_returnflag,
               ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_price_qty,
               ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS covar_s,
               ROUND(COVAR_POP(l_extendedprice, l_quantity), 2) AS covar_p,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q_d13_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(y, x), 6).alias("corr_price_qty"),
            F.round(F.covar_samp(y, x), 2).alias("covar_s"),
            F.round(F.covar_pop(y, x), 2).alias("covar_p"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_d14_price_histogram",
    family="D",
    doc="Equi-width histogram of order totals (25k buckets): floor-"
    "division bucketing is a plain projection, so the histogram is one "
    "partial+final count agg — the 100 TB shape for distribution "
    "profiling.",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS INT) AS bucket,
               COUNT(*) AS n,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1
        ORDER BY bucket
    """,
)
def q_d14_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            dsum(F.col("o_totalprice"), "decimal(18,4)").alias("total"),
        )
        .orderBy("bucket")
    )


@register(
    "q_d15_unpivot_measures",
    family="D",
    doc="UNPIVOT / melt: wide per-returnflag aggregates into long "
    "(measure, value) form — the inverse of q_d8's pivot. Spark's "
    "native unpivot keeps the melt inside codegen (an Expand node, "
    "no shuffle beyond the aggregation's own); DECIMAL-cast sums "
    "keep the melted doubles bit-equal across engines.",
    oracle="""
        WITH a AS (
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity      AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                   CAST(SUM(CAST(l_discount      AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty'   AS measure, sum_qty   AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_disc'  AS measure, sum_disc  AS value FROM a
        ORDER BY l_returnflag, measure
    """,
)
def q_d15_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity"), "decimal(18,4)").alias("sum_qty"),
        dsum(F.col("l_extendedprice"), "decimal(18,4)").alias("sum_price"),
        dsum(F.col("l_discount"), "decimal(18,4)").alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "value"
    ).orderBy("l_returnflag", "measure")


@register(
    "q_d17_data_profile",
    family="D",
    doc="Deequ-style column-profile audit over orders, the pre-"
    "ingestion sanity gate a pipeline runs before accepting a batch: "
    "per column, row/null/distinct counts plus numeric min/max "
    "(dates as epoch days). ONE scan computes every metric in a "
    "single aggregate row (partial+final hash agg, no per-column "
    "passes), then a codegen-only unpivot melts it long.",
    oracle="""
        WITH a AS (
            SELECT COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nk_null,
                   COUNT(DISTINCT o_orderkey) AS nk_dist,
                   CAST(MIN(o_orderkey) AS DOUBLE) AS nk_min,
                   CAST(MAX(o_orderkey) AS DOUBLE) AS nk_max,
                   SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nc_null,
                   COUNT(DISTINCT o_custkey) AS nc_dist,
                   CAST(MIN(o_custkey) AS DOUBLE) AS nc_min,
                   CAST(MAX(o_custkey) AS DOUBLE) AS nc_max,
                   SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS tp_null,
                   COUNT(DISTINCT o_totalprice) AS tp_dist,
                   CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS tp_min,
                   CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS tp_max,
                   SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS od_null,
                   COUNT(DISTINCT o_orderdate) AS od_dist,
                   CAST(MIN(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS DOUBLE) AS od_min,
                   CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS DOUBLE) AS od_max
            FROM orders
        )
        SELECT col, n_rows, n_nulls, n_distinct, min_val, max_val
        FROM (
            SELECT 'o_orderkey' AS col, n_rows, CAST(nk_null AS BIGINT) AS n_nulls,
                   CAST(nk_dist AS BIGINT) AS n_distinct, nk_min AS min_val, nk_max AS max_val FROM a
            UNION ALL
            SELECT 'o_custkey', n_rows, CAST(nc_null AS BIGINT),
                   CAST(nc_dist AS BIGINT), nc_min, nc_max FROM a
            UNION ALL
            SELECT 'o_totalprice', n_rows, CAST(tp_null AS BIGINT),
                   CAST(tp_dist AS BIGINT), tp_min, tp_max FROM a
            UNION ALL
            SELECT 'o_orderdate', n_rows, CAST(od_null AS BIGINT),
                   CAST(od_dist AS BIGINT), od_min, od_max FROM a
        )
        ORDER BY col
    """,
)
def q_d17_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    epoch = F.lit("1970-01-01").cast("date")
    a = o.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("nk_null"),
        F.countDistinct("o_orderkey").alias("nk_dist"),
        F.min("o_orderkey").cast("double").alias("nk_min"),
        F.max("o_orderkey").cast("double").alias("nk_max"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("nc_null"),
        F.countDistinct("o_custkey").alias("nc_dist"),
        F.min("o_custkey").cast("double").alias("nc_min"),
        F.max("o_custkey").cast("double").alias("nc_max"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias("tp_null"),
        F.countDistinct("o_totalprice").alias("tp_dist"),
        F.round(F.min("o_totalprice"), 2).cast("double").alias("tp_min"),
        F.round(F.max("o_totalprice"), 2).cast("double").alias("tp_max"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("od_null"),
        F.countDistinct("o_orderdate").alias("od_dist"),
        F.min(F.datediff(F.col("o_orderdate").cast("date"), epoch)).cast("double").alias("od_min"),
        F.max(F.datediff(F.col("o_orderdate").cast("date"), epoch)).cast("double").alias("od_max"),
    )
    rows = []
    for col, pre in [
        ("o_orderkey", "nk"),
        ("o_custkey", "nc"),
        ("o_totalprice", "tp"),
        ("o_orderdate", "od"),
    ]:
        rows.append(
            a.select(
                F.lit(col).alias("col"),
                "n_rows",
                F.col(f"{pre}_null").cast("long").alias("n_nulls"),
                F.col(f"{pre}_dist").cast("long").alias("n_distinct"),
                F.col(f"{pre}_min").alias("min_val"),
                F.col(f"{pre}_max").alias("max_val"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("col")


@register(
    "q_d16_median_mode",
    family="D",
    doc="Exact median and deterministic mode of order totals per "
    "priority. Median = interpolated 50th percentile (Spark median == "
    "DuckDB median, both exact at this cardinality). Mode is NOT "
    "cross-engine deterministic as a built-in (tie order is engine-"
    "specific), so it is computed as an explicit argmax: per-(group, "
    "value) counts, then max_by(value, (count, -value)) — highest "
    "count, smallest value on ties — which is a total order both "
    "engines reproduce. Two partial+final aggs, no window, no "
    "shuffle beyond the group keys.",
    oracle="""
        WITH vc AS (
            SELECT o_orderpriority, o_totalprice AS v, COUNT(*) AS c
            FROM orders
            GROUP BY o_orderpriority, o_totalprice
        ),
        m AS (
            SELECT o_orderpriority, v AS mode_val
            FROM (
                SELECT o_orderpriority, v,
                       row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY c DESC, v ASC) AS rn
                FROM vc
            )
            WHERE rn = 1
        )
        SELECT o.o_orderpriority,
               ROUND(median(o.o_totalprice), 4) AS median_price,
               ROUND(ANY_VALUE(m.mode_val), 4) AS mode_price,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o
        JOIN m ON m.o_orderpriority = o.o_orderpriority
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def q_d16_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    vc = orders.groupBy("o_orderpriority", F.col("o_totalprice").alias("v")).agg(
        F.count("*").alias("c")
    )
    mode = vc.groupBy("o_orderpriority").agg(
        F.max_by("v", F.struct(F.col("c"), (-F.col("v")).alias("nv"))).alias("mode_val")
    )
    med = orders.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        med.join(F.broadcast(mode), "o_orderpriority")
        .select(
            "o_orderpriority",
            "median_price",
            F.round("mode_val", 4).alias("mode_price"),
            "n",
        )
        .orderBy("o_orderpriority")
    )
