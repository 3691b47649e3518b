"""Family B — projection / filter / predicates (SURVEY.md §2.2 B).

Generalizes the reference's F1 (status filter, jms_publisher.clj:132)
and P1 (queue projection, jms_publisher.clj:207) to the full predicate
grammar. Every predicate here is a Catalyst-pushable expression: at
scale these filters reach the parquet row-group level (PushedFilters in
the plan), so the scan — not the engine — discards the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_b1_range_filter",
    family="B",
    bench=True,
    doc="TPC-H Q6-style selective range filter over lineitem; projection "
    "narrow enough that the parquet scan reads 5 of 11 columns.",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        ORDER BY l_orderkey, l_linenumber
    """,
)
def q_b1_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between("1996-01-01 00:00:00", "1996-12-31 00:00:00")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_b2_string_predicates",
    family="B",
    doc="String predicate grammar: LIKE / NOT LIKE / IN / IS NOT NULL / "
    "boolean combinators over part.",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_type
        FROM part
        WHERE p_type IN ('ECONOMY', 'PROMO')
          AND p_name LIKE '%an%'
          AND p_brand NOT LIKE 'Brand#1%'
          AND (p_size >= 10 OR p_retailprice < 1200.0)
          AND p_name IS NOT NULL
        ORDER BY p_partkey
    """,
)
def q_b2_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").isin("ECONOMY", "PROMO")
            & F.col("p_name").like("%an%")
            & ~F.col("p_brand").like("Brand#1%")
            & ((F.col("p_size") >= 10) | (F.col("p_retailprice") < 1200.0))
            & F.col("p_name").isNotNull()
        )
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")
    )


@register(
    "q_b3_pushdown_mix",
    family="B",
    doc="Every pushable predicate class at once — IN-list, BETWEEN "
    "(range pair), LIKE prefix, IS NOT NULL — plus a 2-column "
    "projection. The plan test pins that ALL of them reach the parquet "
    "scan as PushedFilters and the ReadSchema is exactly the projected "
    "columns: at 100 TB this is the difference between reading two "
    "columns of matching row groups and reading the table.",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 1000 AND 200000
          AND o_orderstatus LIKE 'F%'
          AND o_custkey IS NOT NULL
        ORDER BY o_orderkey
    """,
)
def q_b3_pushdown_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderstatus").startswith("F")
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )
