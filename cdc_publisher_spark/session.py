"""SparkSession factory.

Pins the configs the whole engine depends on (SURVEY.md §4.2):

- ``spark.sql.session.timeZone=UTC`` — hash-stability against the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- AQE on — runtime shuffle-partition coalescing + skew-join splitting;
  at 100 TB this is what keeps a static ``shuffle.partitions`` choice
  from being fatal.
- Arrow on — every pandas_udf / applyInPandas / mapInPandas path.

Local testing runs one JVM (``local[N]``); on a real cluster the same
builder is used with master/memory supplied by the deployment, so keep
anything cluster-specific out of here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for correctness + portability, not just local speed.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + filter pushdown are defaults,
    # pinned here so a misconfigured deployment can't silently lose them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Timestamps in our parquet are ns; read without rebase surprises.
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # Keep shuffle state small on local mode; AQE coalesces upward jobs.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.ui.enabled": "false",
}


def default_parallelism() -> int:
    """Worker-thread count: $SPARK_GRAFT_CPUS, else all cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_session(
    app_name: str = "cdc_publisher_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``shuffle_partitions`` defaults to the worker-thread count: right for
    local mode; a cluster deployment passes its own (or relies on AQE
    coalescing from a higher initial value).
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    confs = dict(ENGINE_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    confs.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
