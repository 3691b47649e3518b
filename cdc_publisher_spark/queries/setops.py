"""Family G — set operations (SURVEY.md §2.2 G).

UNION ALL is a zero-shuffle concat; UNION/INTERSECT/EXCEPT hash-
partition on the full row. Column names are aligned on both sides
(Spark set ops resolve by position, the oracle comparator by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


def _seg_keys(spark: SparkSession, sf_dir: str, segment: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == segment)
        .select(F.col("c_custkey").alias("key"))
    )


@register(
    "q_g1_union_all",
    family="G",
    doc="UNION ALL of two segment key-sets (multiset semantics — the "
    "order-insensitive hash still counts duplicates).",
    oracle="""
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'MACHINERY'
        ORDER BY key
    """,
)
def q_g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _seg_keys(spark, sf_dir, "BUILDING")
        .unionAll(_seg_keys(spark, sf_dir, "MACHINERY"))
        .orderBy("key")
    )


@register(
    "q_g2_union_distinct",
    family="G",
    doc="UNION (distinct): customer keys ∪ ordering customer keys.",
    oracle="""
        SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
        ORDER BY key
    """,
)
def q_g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("key"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("key"))
    )
    return a.union(b).distinct().orderBy("key")


@register(
    "q_g3_intersect",
    family="G",
    doc="INTERSECT: high-balance customers who placed large orders.",
    oracle="""
        SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
        ORDER BY key
    """,
)
def q_g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("key"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("key"))
    )
    return a.intersect(b).orderBy("key")


@register(
    "q_g4_except",
    family="G",
    doc="EXCEPT: customer keys that never appear in orders.",
    oracle="""
        SELECT c_custkey AS key FROM customer
        EXCEPT
        SELECT o_custkey AS key FROM orders
        ORDER BY key
    """,
)
def q_g4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    b = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep
    # surviving multiplicities, which EXCEPT does not.
    return a.subtract(b).orderBy("key")


@register(
    "q_g5_intersect_all",
    family="G",
    doc="INTERSECT ALL (multiset intersection — multiplicities kept).",
    oracle="""
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
        INTERSECT ALL
        SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY key
    """,
)
def q_g5_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("key"))
    return a.intersectAll(b).orderBy("key")


@register(
    "q_g6_except_all",
    family="G",
    doc="EXCEPT ALL (multiset difference — surviving multiplicities).",
    oracle="""
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
        EXCEPT ALL
        SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY key
    """,
)
def q_g6_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("key"))
    return a.exceptAll(b).orderBy("key")
