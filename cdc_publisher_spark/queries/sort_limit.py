"""Family F — sort / limit / top-k (SURVEY.md §2.2 F).

Global ORDER BY + LIMIT plans as TakeOrderedAndProject in Spark —
per-partition top-k then a k-sized merge on the driver, no global sort.
That is the only top-k shape that survives 100 TB; per-group top-k
composes a window rank with a filter (rank pushes into the sort).
Ties are always broken by a unique key so the selected set is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_f1_top_orders",
    family="F",
    doc="Global top-10 orders by totalprice (tiebreak: orderkey).",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def q_f1_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q_f2_top3_customers_per_nation",
    family="F",
    doc="Per-group top-k: 3 richest customers per nation via window "
    "rank + filter.",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal, rn AS pos
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        ) WHERE rn <= 3
        ORDER BY c_nationkey, pos
    """,
)
def q_f2_top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).cast("bigint").alias("pos"))
        .filter(F.col("pos") <= 3)
        .orderBy("c_nationkey", "pos")
    )
