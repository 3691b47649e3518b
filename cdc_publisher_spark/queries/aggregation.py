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
    "grouped by returnflag/linestatus. The engine's flagship batch agg.",
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
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
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
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
