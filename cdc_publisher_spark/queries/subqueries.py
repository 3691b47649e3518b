"""Families C/D extensions — subquery shapes and pivot.

Catalyst decorrelates these into joins (SURVEY.md §4.2 "subquery
decorrelation"); declaring them verifies the rewrite produces the
same rows as DuckDB's decorrelation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.queries.aggregation import dsum
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load, register_views


@register(
    "q_c8_scalar_subquery",
    family="C",
    doc="Correlated scalar subquery (TPC-H Q17 shape): lineitems below "
    "20% of their part's average quantity. Catalyst decorrelates to an "
    "aggregate + join.",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey
        FROM lineitem l
        WHERE l.l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
        )
        ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def q_c8_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey
        FROM lineitem l
        WHERE l.l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
        )
        ORDER BY l.l_orderkey, l.l_linenumber
        """
    )


@register(
    "q_d7_having",
    family="D",
    doc="GROUP BY ... HAVING over an aggregate (post-aggregation filter).",
    oracle="""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 15
        ORDER BY o_custkey
    """,
)
def q_d7_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "decimal(18,4)").alias("spend"),
        )
        .filter(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


@register(
    "q_d8_pivot",
    family="D",
    doc="Pivot: order counts per (priority x status). Spark .pivot() "
    "with an explicit value list (required for a deterministic plan); "
    "oracle via conditional aggregation.",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS st_f,
               CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS st_o,
               CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS st_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q_d8_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("F").alias("st_f"),
        F.col("O").alias("st_o"),
        F.col("P").alias("st_p"),
    ).orderBy("o_orderpriority")


@register(
    "q_c9_large_volume_customers",
    family="C",
    doc="TPC-H Q18 shape: IN over an aggregated subquery (orders whose "
    "total lineitem quantity exceeds a threshold) joined back to "
    "customer — Catalyst plans the IN as a left-semi join on the "
    "aggregate.",
    oracle="""
        SELECT c_custkey, o_orderkey,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
               ROUND(o_totalprice, 2) AS total_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_orderkey
    """,
)
def q_c9_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big_orders, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), "decimal(18,4)").alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
        .orderBy("o_orderkey")
    )
