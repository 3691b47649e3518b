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
