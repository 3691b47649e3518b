"""Custom Python streaming data source: the in-engine Oracle-AQ
stand-in (SURVEY.md §2.1 S3 "in-engine: custom DataSourceStreamReader
(Python data source API)").

The reference's queue source is push-based JMS with AUTO_ACKNOWLEDGE
(redelivery on listener throw, jms_publisher.clj:41-69,169-194). The
Spark-native equivalent is a pull source with explicit offsets: this
``dmlspool`` source watches a spool directory of append-only files
(one raw DML JSON per newline-terminated line — what a real AQ bridge
would write; a line only becomes visible to the stream once its
newline lands, so a writer mid-append is never half-read), and
implements Spark's streaming source contract:

- offset = map of file name -> bytes consumed up to the last complete
  line. Tracking per-file byte positions (not a file count) means
  lines appended to an already-seen file ARE read, and a
  late-arriving file that sorts before consumed names cannot shift
  the consumed slice — each file advances independently;
- ``read(start)`` returns new rows + the next offset; the engine
  commits the offset to the checkpoint only after the batch lands —
  the reference's commit-on-success dequeue (protocols/queue.clj:16-29);
- ``readBetweenOffsets`` replays any committed range deterministically
  as exact per-file byte ranges (at-least-once on crash, like the
  reference's redelivery);
- a file shrinking below its consumed position, or a consumed file
  vanishing before its range is replayed, raises instead of silently
  re-slicing — the spool contract (append-only) was violated.

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


def _spool_sizes(path: str) -> dict[str, int]:
    """Current {file name: byte size} snapshot of the spool dir."""
    if not os.path.isdir(path):
        return {}
    out: dict[str, int] = {}
    for f in os.listdir(path):
        fp = os.path.join(path, f)
        if not f.startswith(".") and os.path.isfile(fp):
            out[f] = os.path.getsize(fp)
    return out


def _read_range(path: str, name: str, start: int, end: int) -> list[tuple[str]]:
    """Lines in byte range [start, end) of one spool file. The range
    always ends at a line boundary (offsets only ever advance to the
    last complete newline), so no partial lines appear."""
    fp = os.path.join(path, name)
    if not os.path.isfile(fp):
        raise RuntimeError(
            f"dmlspool: consumed file {name!r} vanished before replay — "
            "spool retention violated a committed-but-unreplayed range"
        )
    with open(fp, "rb") as fh:
        fh.seek(start)
        data = fh.read(end - start)
    if len(data) < end - start:
        raise RuntimeError(
            f"dmlspool: file {name!r} shrank below a consumed offset "
            f"({start + len(data)} < {end}) — spool files must be append-only"
        )
    if data.endswith(b"\n"):
        data = data[:-1]
    return [(line.decode("utf-8"),) for line in data.split(b"\n")]


class DmlSpoolStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dmlspool requires .option('path', <spool dir>)")

    def initialOffset(self) -> dict:
        return {"files": {}}

    def read(self, start: dict):
        consumed: dict[str, int] = dict(start["files"])
        sizes = _spool_sizes(self.path)
        rows: list[tuple[str]] = []
        end = dict(consumed)  # carry forward files no longer listed
        for name in sorted(sizes):
            pos = consumed.get(name, 0)
            size = sizes[name]
            if size < pos:
                raise RuntimeError(
                    f"dmlspool: file {name!r} shrank ({size} < consumed {pos}) "
                    "— spool files must be append-only"
                )
            if size == pos:
                continue
            # only consume up to the last complete line: a writer may be
            # mid-append, and offsets must land on line boundaries
            with open(os.path.join(self.path, name), "rb") as fh:
                fh.seek(pos)
                data = fh.read(size - pos)
            nl = data.rfind(b"\n")
            if nl < 0:
                continue
            rows.extend((line.decode("utf-8"),) for line in data[:nl].split(b"\n"))
            end[name] = pos + nl + 1
        # materialized list (not a generator): the streaming runtime
        # copy.copy()s the iterator to cache prefetched batches
        return iter(rows), {"files": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed range after restart:
        # exact byte ranges per file, in name order
        s = start["files"]
        rows: list[tuple[str]] = []
        for name in sorted(end["files"]):
            lo, hi = s.get(name, 0), end["files"][name]
            if hi > lo:
                rows.extend(_read_range(self.path, name, lo, hi))
        return iter(rows)

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
        # batch sees finished files: read them whole (a final file may
        # legitimately lack the trailing newline)
        rows: list[tuple[str]] = []
        for name in sorted(_spool_sizes(self.path)):
            with open(os.path.join(self.path, name), encoding="utf-8") as fh:
                rows.extend((line.rstrip("\n"),) for line in fh)
        return iter(rows)


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
