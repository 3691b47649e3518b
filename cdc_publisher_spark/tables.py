"""Synthetic-table registry (TESTDATA.md / FIXTURES.md §1).

Ten driver-generated parquet tables per scale factor. All engine queries
load through here so scans share one code path (and one place to attach
schema hints / bucketing later).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins.
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown happen at the
    parquet reader via Catalyst; nothing to do here but keep the scan
    declarative (no caching, no collect)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    from cdc_publisher_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives
    # as int64 nanos. Truncate to µs exactly like DuckDB does reading
    # the same file, so oracle comparisons see identical instants.
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if name == "events" and schema.get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view, for the SQL entry points."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame, out_dir: str, partition_cols: list[str], compression: str = "zstd"
) -> None:
    """Partitioned parquet writer — the engine's table-materialization
    path. Hive-style partition directories give partition PRUNING on
    read (PartitionFilters in the scan): a date/tenant filter at 100 TB
    skips whole directories instead of reading row groups. zstd mirrors
    the analytic-table compression choice (the reference uses lz4 on
    its Kafka producer for the wire path)."""
    df.write.mode("overwrite").option("compression", compression).partitionBy(
        *partition_cols
    ).parquet(out_dir)
