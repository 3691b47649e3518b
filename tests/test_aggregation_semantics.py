"""Approximate-aggregate accuracy bounds (SURVEY.md §2.2 Q-D5: checked
by tolerance, not hash) and scale-strategy behaviors (salting,
bucketing) that have no DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_publisher_spark.tables import load


def test_approx_count_distinct_tolerance(spark, sf_oracle):
    li = load(spark, sf_oracle, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel_err <= 0.05, f"{r['l_returnflag']}: {rel_err:.3f}"


def test_percentile_approx_tolerance(spark, sf_oracle):
    o = load(spark, sf_oracle, "orders")
    rows = (
        o.agg(
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)).alias("approx"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
        )
        .collect()
    )
    assert abs(rows[0]["approx"] - rows[0]["exact"]) / rows[0]["exact"] <= 0.02


def test_salted_join_matches_plain_join(spark, sf_oracle):
    from cdc_publisher_spark.operators.skew import salted_join

    orders = load(spark, sf_oracle, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = load(spark, sf_oracle, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, "c_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(orders, cust, "c_custkey").groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join with misses keeps unmatched rows exactly once
    some_cust = cust.filter(F.col("c_custkey") < 100)
    left_plain = orders.join(some_cust, "c_custkey", "left")
    left_salted = salted_join(orders, some_cust, "c_custkey", how="left")
    assert left_plain.count() == left_salted.count()
    assert (
        left_plain.filter(F.col("c_mktsegment").isNull()).count()
        == left_salted.filter(F.col("c_mktsegment").isNull()).count()
    )


def test_bucketed_tables_join_without_shuffle(spark, sf_oracle, tmp_path):
    """Bucketing both sides on the join key co-locates partitions: the
    join plan has no Exchange — the 100 TB fact-fact join strategy."""
    from cdc_publisher_spark.plans import plan_string

    # warehouse dir is a static conf, pre-set to a temp dir in conftest
    li = load(spark, sf_oracle, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_oracle, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_b")
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale orders is broadcastable, which bypasses the
        # bucketed path; disable broadcast to exercise the fact-fact
        # (sort-merge) strategy bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = plan_string(joined, "simple")
        assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
