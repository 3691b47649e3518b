"""Family C — joins (SURVEY.md §2.2 C).

Join strategy at scale (SURVEY.md §4.2): dimension tables (region,
nation, supplier, customer, part) broadcast — Catalyst picks that from
size stats, and `F.broadcast` pins it where the dimension is known-small
by construction. Fact-fact joins (lineitem⋈orders) shuffle on the join
key; AQE handles skew. The non-equi self-join (C5) is banded so the
range condition rides an equi-join; the as-of join (C7) is the
union+carry-forward operator, not a range product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.asof import asof_join
from cdc_publisher_spark.queries.aggregation import dsum
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_c1_revenue_by_customer",
    family="C",
    bench=True,
    doc="TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue per "
    "customer in one segment. customer broadcasts; orders⋈lineitem "
    "shuffles on orderkey.",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate  >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey
    """,
)
def q_c1_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1996-01-01")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_c2_snowflake_revenue",
    family="C",
    bench=True,
    doc="TPC-H Q5 shape: 6-way snowflake with the same-nation "
    "customer/supplier constraint; all dims broadcast, one fact shuffle.",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND s_nationkey = c_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY n_name
    """,
)
def q_c2_snowflake_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("n_name")
    )


@register(
    "q_c3_customers_without_urgent_orders",
    family="C",
    doc="Anti join (reference has no outer joins; this is the "
    "LEFT JOIN ... IS NULL / NOT EXISTS pattern). Spark plans a "
    "broadcast/shuffle anti join from left_anti.",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        )
        ORDER BY c_custkey
    """,
)
def q_c3_customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        cust.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_c4_customers_with_recent_orders",
    family="C",
    doc="Left semi join (EXISTS): customers having a 2001 order.",
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        ORDER BY c_custkey
    """,
)
def q_c4_customers_with_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return (
        cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q_c5_event_pairs_within_hour",
    family="C",
    doc="Theta/range self-join: per-user event pairs within one hour. "
    "The equi key (user_id) carries the join; the range rides as a "
    "post-join filter, so no cross product beyond each user's group.",
    oracle="""
        SELECT a.event_id AS first_id, b.event_id AS second_id, a.user_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 1 HOUR
        ORDER BY first_id, second_id
    """,
)
def q_c5_event_pairs_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("a.event_id").alias("first_id"),
            F.col("b.event_id").alias("second_id"),
            F.col("a.user_id").alias("user_id"),
            (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))).alias("gap_us"),
        )
        .orderBy("first_id", "second_id")
    )


@register(
    "q_c6_region_grid",
    family="C",
    doc="Cross join: region × a 3-row literal table.",
    oracle="""
        SELECT r_name, k, r_name || '-' || CAST(k AS VARCHAR) AS cell
        FROM region
        CROSS JOIN (SELECT CAST(x AS BIGINT) AS k FROM generate_series(1, 3) t(x)) g
        ORDER BY r_name, k
    """,
)
def q_c6_region_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    grid = spark.range(1, 4).withColumnRenamed("id", "k")
    return (
        region.crossJoin(grid)
        .select(
            "r_name",
            "k",
            F.concat(F.col("r_name"), F.lit("-"), F.col("k").cast("string")).alias("cell"),
        )
        .orderBy("r_name", "k")
    )


@register(
    "q_c7_asof_prior_click",
    family="C",
    bench=True,
    doc="As-of join: for each purchase event, the user's most recent "
    "strictly-earlier click. Implemented with the union+carry-forward "
    "operator (operators/asof.py); DuckDB ASOF JOIN is the oracle.",
    oracle="""
        SELECT p.event_id AS purchase_id,
               p.user_id,
               c.event_id  AS prior_click_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts
        ORDER BY purchase_id
    """,
)
def q_c7_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        strict=True,
        right_tiebreak="event_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("event_id_r").alias("prior_click_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))).alias("gap_us"),
    ).orderBy("purchase_id")


@register(
    "q_c10_waiting_supplier",
    family="C",
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS, both correlated on the "
    "same fact table. Spark form: one left-semi and one left-anti "
    "join, each an equi-join on l_orderkey with an extra non-equi "
    "residual — so both compile to hash/sort-merge joins on a uniform "
    "8-byte key, never a nested loop. The supplier dim broadcasts.",
    oracle="""
        SELECT s.s_name, s.s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate
        )
        GROUP BY s.s_name, s.s_suppkey
        ORDER BY numwait DESC, s_suppkey
        LIMIT 20
    """,
)
def q_c10_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    base = (
        l1.join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l1.l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "leftanti",
        )
    )
    return (
        base.join(F.broadcast(supp), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name", "s_suppkey")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(20)
    )


@register(
    "q_c11_asof_next_purchase",
    family="C",
    doc="FORWARD as-of join (pandas merge_asof direction='forward' "
    "parity): each click attaches the same user's next purchase. Same "
    "union+carry rewrite as q_c7 walked in descending time — zero join "
    "nodes in the physical plan, no range cross-product on hot users. "
    "Oracle materializes the pair set and takes rank 1 (fine at sf0.01, "
    "exactly the shape the operator is designed to avoid at scale).",
    oracle="""
        WITH c AS (
            SELECT event_id, user_id, epoch_us(ts) AS us
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT event_id AS peid, user_id, epoch_us(ts) AS pus
            FROM events WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT c.event_id, c.user_id, c.us, p.pus, p.peid,
                   row_number() OVER (
                       PARTITION BY c.event_id
                       ORDER BY p.pus ASC NULLS LAST, p.peid ASC) AS rn
            FROM c LEFT JOIN p
              ON p.user_id = c.user_id AND p.pus > c.us
        )
        SELECT event_id, user_id, us,
               COALESCE(pus, -1) AS next_us,
               COALESCE(peid, -1) AS next_eid
        FROM j WHERE rn = 1
        ORDER BY event_id
    """,
)
def q_c11_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("peid"), "user_id", F.unix_micros("ts").alias("pus")
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="us",
        right_ts="pus",
        right_cols=["peid"],
        strict=True,
        right_tiebreak="peid",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        "us",
        F.coalesce(F.col("pus_r"), F.lit(-1)).cast("bigint").alias("next_us"),
        F.coalesce(F.col("peid_r"), F.lit(-1)).cast("bigint").alias("next_eid"),
    ).orderBy("event_id")


@register(
    "q_c12_salted_skew_join",
    family="C",
    doc="Salt-scattered equi-join (operators/skew.py): the hot-key "
    "defense for broadcast-infeasible dims — big side gets a "
    "deterministic 16-way subkey, small side explodes across all 16, "
    "shuffle key becomes (key, salt). Salting is result-invariant, so "
    "the oracle is the PLAIN join: the driver hash-checks that the "
    "scatter changes the shuffle, never the answer.",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
        ORDER BY segment
    """,
)
def q_c12_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.skew import salted_join
    from cdc_publisher_spark.queries.aggregation import dsum

    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(orders, cust, "c_custkey")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "decimal(18,4)").alias("total_price"),
        )
        .orderBy("segment")
    )


@register(
    "q_c13_nullsafe_join",
    family="C",
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other — the semantic a plain equi-join silently drops. "
    "Keys are NULLified via nullif (the synthetic tables have no NULL "
    "keys), then joined null-safely; the NULL group must survive with "
    "its full count. Still a hash join: Spark plans EqualNullSafe as a "
    "normal shuffle-hash key, no nested loop.",
    oracle="""
        WITH o AS (
            SELECT nullif(o_orderpriority, '1-URGENT') AS pri, o_totalprice
            FROM orders
        ),
        d AS (
            SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS pri,
                   COALESCE(nullif(o_orderpriority, '1-URGENT'), 'was-urgent') AS label
            FROM orders
        )
        SELECT d.label,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM o JOIN d ON o.pri IS NOT DISTINCT FROM d.pri
        GROUP BY d.label
        ORDER BY d.label
    """,
)
def q_c13_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.queries.aggregation import dsum

    orders = load(spark, sf_dir, "orders")
    pri = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    o = orders.select(pri.alias("pri"), "o_totalprice")
    d = (
        orders.select(
            pri.alias("dpri"),
            F.coalesce(pri, F.lit("was-urgent")).alias("label"),
        )
        .distinct()
    )
    return (
        o.join(F.broadcast(d), F.col("pri").eqNullSafe(F.col("dpri")))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("o_totalprice"), "decimal(18,4)").alias("total"),
        )
        .orderBy("label")
    )


#: q_c14 bucket width in microseconds == the interval half-window, so
#: a qualifying neighbor is always in {b-1, b, b+1} (property-pinned in
#: tests/test_llm_select.py against THIS constant).
INTERVAL_BIN_US = 60_000_000


@register(
    "q_c14_binned_interval_join",
    family="C",
    bench=True,  # the keyless-range-join scale path
    doc="Keyless interval join via time-bucket binning: per event, the "
    "count of OTHER events (any user) within +-1 minute. Without an "
    "equi key Spark would plan a BroadcastNestedLoopJoin - O(n^2) "
    "comparisons and a single-threaded build at scale. Binning maps "
    "the range predicate onto an equi key: the probe side keeps its "
    "60-second bucket, the build side explodes into {b-1, b, b+1}, "
    "the join runs as a plain shuffled equi-join on the bucket, and "
    "the exact +-60 s predicate rides as a residual filter. Shuffle "
    "volume is 3x the build side - linear, partitionable, AQE-"
    "skew-splittable - instead of quadratic. The plan is pinned "
    "nested-loop-free in tests/test_plans.py. Result-invariant to "
    "the rewrite: the oracle is the plain theta-join SQL.",
    oracle="""
        SELECT a.event_id, a.user_id,
               CAST(COUNT(b.event_id) AS BIGINT) AS n_concurrent
        FROM events a
        LEFT JOIN events b
          ON b.event_id <> a.event_id
         AND b.ts >= a.ts - INTERVAL 1 MINUTE
         AND b.ts <= a.ts + INTERVAL 1 MINUTE
        GROUP BY a.event_id, a.user_id
        ORDER BY a.event_id
    """,
)
def q_c14_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True (r16 sf1 audit): 0.46 at sf1 (the bucket explode
    # and epoch math run off a single-task scan), 1.11 at sf0.1 —
    # adopted on the scale evidence; the sf0.1 cost is one exchange of
    # a 3 MB table.
    ev = load(spark, sf_dir, "events", spread=True)
    # 60-second buckets over microsecond epochs. b.ts within a.ts +- 60 s
    # implies floor-bucket(b) is in {bucket(a)-1, bucket(a), bucket(a)+1},
    # so exploding the build side into its three candidate buckets makes
    # the bucket an exact equi key for the range predicate.
    bucket = (F.unix_micros(F.col("ts")) / F.lit(INTERVAL_BIN_US)).cast("bigint")
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.unix_micros(F.col("ts")).alias("a_us"),
        bucket.alias("a_bkt"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.unix_micros(F.col("ts")).alias("b_us"),
        F.explode(
            F.array(bucket - F.lit(1), bucket, bucket + F.lit(1))
        ).alias("b_bkt"),
    )
    joined = a.join(
        b,
        (F.col("a_bkt") == F.col("b_bkt"))
        & (F.col("b_id") != F.col("a_id"))
        & (F.col("b_us") >= F.col("a_us") - F.lit(INTERVAL_BIN_US))
        & (F.col("b_us") <= F.col("a_us") + F.lit(INTERVAL_BIN_US)),
        "left",
    )
    return (
        joined.groupBy("a_id", "a_user")
        .agg(F.count("b_id").alias("n_concurrent"))
        .select(
            F.col("a_id").alias("event_id"),
            F.col("a_user").alias("user_id"),
            F.col("n_concurrent"),
        )
        .orderBy("event_id")
    )


@register(
    "q_c15_min_cost_supplier",
    family="C",
    bench=True,  # classic decorrelated-min multi-join shape
    doc="TPC-H Q2 shape over the available join graph: for each part "
    "of a chosen type, the supplier(s) in a chosen region achieving "
    "the MINIMUM discounted price for that part, with the minimum "
    "coming from a correlated aggregate subquery. Catalyst "
    "decorrelates the scalar subquery into an aggregate + equi-join "
    "(no per-row re-execution), the region/nation/supplier snowflake "
    "broadcasts, and only lineitem shuffles — the plan every engine "
    "must find for Q2 to survive at scale.",
    oracle="""
        WITH cost AS (
            SELECT l.l_partkey, l.l_suppkey,
                   MIN(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)) AS supp_cost
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
            GROUP BY l.l_partkey, l.l_suppkey
        ),
        best AS (
            SELECT l_partkey, MIN(supp_cost) AS min_cost
            FROM cost GROUP BY l_partkey
        )
        SELECT p.p_partkey, p.p_type, s.s_name, n.n_name,
               CAST(cost.supp_cost AS DOUBLE) AS supp_cost
        FROM part p
        JOIN cost ON cost.l_partkey = p.p_partkey
        JOIN best ON best.l_partkey = p.p_partkey
                 AND cost.supp_cost = best.min_cost
        JOIN supplier s ON s.s_suppkey = cost.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_type LIKE 'PROMO%'
        ORDER BY p.p_partkey, s.s_name
    """,
)
def q_c15_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    regional_supp = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    cost = (
        li.join(F.broadcast(regional_supp), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("supp_cost")
        )
    )
    best = cost.groupBy("l_partkey").agg(F.min("supp_cost").alias("min_cost"))
    return (
        cost.join(best, ["l_partkey"])
        .filter(F.col("supp_cost") == F.col("min_cost"))
        .join(
            F.broadcast(part.filter(F.col("p_type").like("PROMO%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(regional_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_type",
            "s_name",
            "n_name",
            F.col("supp_cost").cast("double").alias("supp_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


@register(
    "q_c16_small_quantity_revenue",
    family="C",
    doc="TPC-H Q17 shape (small-quantity-order revenue): per brand, "
    "lineitems whose quantity is below 20% of that part's average "
    "quantity — the classic correlated-aggregate decorrelation: the "
    "per-part average becomes ONE hash aggregate joined back on the "
    "part key, never a per-row subquery re-execution. The 20%% "
    "threshold is evaluated in EXACT integer algebra (5*qty*cnt < "
    "sum_qty; l_quantity is integral, so both engines compare the "
    "same integers — no float-boundary row flips), and revenue is "
    "DECIMAL-summed before the final double (q_d1 convention). "
    "reference parity: the engine's other correlated-agg shapes are "
    "c8 (scalar subquery) and c15 (Q2 min); this adds the "
    "threshold-FILTER form at lineitem scale.",
    oracle="""
        WITH pa AS (
            SELECT l_partkey,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_q,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                          / 7.0, 2) AS DOUBLE) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pa ON pa.l_partkey = l.l_partkey
        WHERE CAST(l.l_quantity * 5 AS BIGINT) * pa.cnt < pa.sum_q
        GROUP BY p.p_brand
        ORDER BY p.p_brand
    """,
)
def q_c16_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    pa = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("long").alias("sum_q"),
        F.count("*").cast("long").alias("cnt"),
    )
    return (
        li.join(pa, "l_partkey")
        .filter((F.col("l_quantity") * 5).cast("long") * F.col("cnt") < F.col("sum_q"))
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_small"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


@register(
    "q_c17_idle_rich_customers",
    family="C",
    doc="TPC-H Q22 shape (global-sales-opportunity): customers whose "
    "account balance exceeds the average POSITIVE balance and who "
    "have placed no order since 2001-01-01 (the fixture's trailing "
    "seven months -- Q22's no-orders test against a corpus where "
    "every customer has SOME order history), grouped by nation. "
    "Three decorrelation "
    "moves in one query: the global scalar aggregate broadcasts as a "
    "1-row frame, the NOT EXISTS becomes a left-anti join on the "
    "order key, and the nation rollup runs on the surviving "
    "customer-sized frame. The balance threshold is compared in "
    "EXACT integer cents (bal*100*n_pos > sum_cents, both engines "
    "round identically) so no float-boundary customer flips sides; "
    "the reported balance total is DECIMAL-summed (q_d1 convention).",
    oracle="""
        WITH cents AS (
            SELECT c_custkey, c_nationkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
            FROM customer
        ),
        avg_pos AS (
            SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c,
                   CAST(COUNT(*) AS BIGINT) AS n_pos
            FROM cents WHERE bal_c > 0
        )
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_idle_rich,
               CAST(ROUND(SUM(CAST(c.bal_c AS DECIMAL(18,0))) / 100.0, 2)
                    AS DOUBLE) AS total_balance
        FROM cents c
        CROSS JOIN avg_pos
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE c.bal_c * avg_pos.n_pos > avg_pos.sum_c
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
          )
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
)
def q_c17_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    cents = cust.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    avg_pos = cents.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").cast("long").alias("sum_c"),
        F.count("*").cast("long").alias("n_pos"),
    )
    return (
        cents.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_c"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_idle_rich"),
            F.round(F.sum(F.col("bal_c").cast("decimal(18,0)")) / 100.0, 2)
            .cast("double")
            .alias("total_balance"),
        )
        .orderBy("n_name")
    )
