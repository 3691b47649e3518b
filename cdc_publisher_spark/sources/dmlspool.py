"""Custom Python streaming data source: the in-engine Oracle-AQ
stand-in (SURVEY.md §2.1 S3 "in-engine: custom DataSourceStreamReader
(Python data source API)").

The reference's queue source is push-based JMS with AUTO_ACKNOWLEDGE
(redelivery on listener throw, jms_publisher.clj:41-69,169-194). The
Spark-native equivalent is a pull source with explicit offsets: this
``dmlspool`` source watches a spool directory of append-only files
(one raw DML JSON per line — what a real AQ bridge would write), and
implements Spark's streaming source contract:

- offset = count of fully-consumed files (files are append-only and
  sorted by name, so the count is a total order over the spool);
- ``read(start)`` returns new rows + the next offset; the engine
  commits the offset to the checkpoint only after the batch lands —
  the reference's commit-on-success dequeue (protocols/queue.clj:16-29);
- ``readBetweenOffsets`` replays any committed range deterministically
  (at-least-once on crash, like the reference's redelivery).

Usage::

    spark.dataSource.register(DmlSpoolDataSource)
    df = spark.readStream.format("dmlspool").option("path", spool_dir).load()

Note: Spark pickles the registered class by reference; executors must
be able to import this package (engine sessions set worker PYTHONPATH,
session.py).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

SPOOL_SCHEMA = StructType([StructField("raw", StringType())])


def _spool_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith(".") and os.path.isfile(os.path.join(path, f))
    )


def _read_lines(files: list[str]):
    # materialized (not a generator): the streaming runtime copy.copy()s
    # the iterator to cache prefetched batches, and generators aren't
    # copyable. Micro-batches are bounded by spool growth per trigger.
    rows: list[tuple[str]] = []
    for fp in files:
        with open(fp, encoding="utf-8") as fh:
            rows.extend((line.rstrip("\n"),) for line in fh)
    return iter(rows)


class DmlSpoolStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dmlspool requires .option('path', <spool dir>)")

    def initialOffset(self) -> dict:
        return {"files_consumed": 0}

    def read(self, start: dict):
        files = _spool_files(self.path)
        n_start = start["files_consumed"]
        new = files[n_start:]
        return _read_lines(new), {"files_consumed": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed range after restart
        files = _spool_files(self.path)
        return _read_lines(files[start["files_consumed"] : end["files_consumed"]])

    def commit(self, end: dict) -> None:
        # nothing to clean: the spool is the retention policy's problem,
        # mirroring Kafka's log-retention model
        pass


class DmlSpoolBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dmlspool requires .option('path', <spool dir>)")

    def read(self, partition):
        return _read_lines(_spool_files(self.path))


class DmlSpoolDataSource(DataSource):
    """format("dmlspool"): batch + streaming reads of a DML spool dir."""

    @classmethod
    def name(cls) -> str:
        return "dmlspool"

    def schema(self) -> StructType:
        return SPOOL_SCHEMA

    def reader(self, schema) -> DmlSpoolBatchReader:
        return DmlSpoolBatchReader(self.options)

    def simpleStreamReader(self, schema) -> DmlSpoolStreamReader:
        return DmlSpoolStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(DmlSpoolDataSource)
