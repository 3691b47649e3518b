"""Source/sink format parity (SURVEY §2.2 A-family): the engine's scans
are format-agnostic DataFrame sources, so a table round-tripped through
ORC or CSV must be row-identical to the parquet original. (JSONL is
covered by sources/corpus.py tests.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_publisher_spark.tables import load


def _fingerprint(df):
    """Order-insensitive whole-table fingerprint: xor of row hashes."""
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    return (
        df.select(F.xxhash64(*cols).alias("h"))
        .agg(F.expr("bit_xor(h)").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )


def test_orc_roundtrip_matches_parquet(spark, sf_smoke, tmp_path):
    src = load(spark, sf_smoke, "supplier")
    path = str(tmp_path / "supplier_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert _fingerprint(back) == _fingerprint(src)


def test_csv_roundtrip_matches_parquet(spark, sf_smoke, tmp_path):
    # CSV has no native timestamp/array types; use an all-scalar table
    # and an explicit schema on read (the A-family contract: schema is
    # declared, never inferred, so the scan plan is stable).
    src = load(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(src.schema).option("header", True).csv(path)
    assert _fingerprint(back) == _fingerprint(src)


def test_orc_scan_prunes_columns(spark, sf_smoke, tmp_path):
    src = load(spark, sf_smoke, "lineitem")
    path = str(tmp_path / "li_orc")
    src.write.mode("overwrite").orc(path)
    plan = (
        spark.read.orc(path)
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "l_extendedprice" not in plan  # pruning reaches the ORC scan
