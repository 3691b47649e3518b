"""operators/layout.py — sized parquet output, range clustering,
Z-order interleaving."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from cdc_publisher_spark.operators.layout import (
    sized_file_count,
    write_sized,
    zvalue,
)
from cdc_publisher_spark.tables import load

SF = "/root/testdata/sf0.001"


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def test_sized_file_count_math():
    assert sized_file_count(0, 100.0) == 1
    assert sized_file_count(10, 100.0) == 1
    mb = 1 << 20
    assert sized_file_count(1000, 1024.0, target_file_bytes=mb) == 1
    assert sized_file_count(3000, 1024.0, target_file_bytes=mb) == 3


def test_write_sized_hits_requested_file_count(spark):
    ev = load(spark, SF, "events")
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "ev")
        # force 4 files via explicit stats (no reliance on the estimator)
        n = write_sized(ev, out, target_file_bytes=1, total_rows=4, row_bytes=1.0)
        assert n == 4
        assert len(_parquet_files(out)) == 4
        assert spark.read.parquet(out).count() == ev.count()


def test_clustered_files_have_disjoint_key_ranges(spark):
    ev = load(spark, SF, "events").select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "ev")
        write_sized(
            ev, out, total_rows=1000, row_bytes=1.0, target_file_bytes=250,
            cluster_by=("event_id",),
        )
        per_file = (
            spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(per_file) >= 2
        for a, b in zip(per_file, per_file[1:]):
            assert a["hi"] <= b["lo"]  # disjoint (boundary key may repeat)


def test_partition_by_produces_hive_layout(spark):
    ev = load(spark, SF, "events").select("event_id", "event_type")
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "ev")
        write_sized(ev, out, total_rows=100, row_bytes=1.0, partition_by=("event_type",))
        types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
        subdirs = {
            p.split("event_type=")[1].split("/")[0]
            for p in _parquet_files(out)
            if "event_type=" in p
        }
        assert subdirs == {str(t) for t in types}


def test_zvalue_matches_python_twin(spark):
    def z(x: int, y: int, bits: int = 16) -> int:
        acc = 0
        for i in range(bits):
            acc |= ((x >> i) & 1) << (2 * i + 1)
            acc |= ((y >> i) & 1) << (2 * i)
        return acc

    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 17), (65535, 65535)]
    df = spark.createDataFrame(rows, "x int, y int").select(
        "x", "y", zvalue(F.col("x"), F.col("y")).alias("zv")
    )
    for r in df.collect():
        assert r["zv"] == z(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue_clustering_improves_both_dims_locality(spark):
    # 32x32 grid; cluster into 16 files by zvalue: every file's x-range
    # AND y-range must each span <= half the domain — impossible for a
    # single-column sort (the minor column spans the full domain in
    # every file).
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("int").alias("y")
    )
    clustered = grid.select("x", "y", zvalue(F.col("x"), F.col("y"), 5).alias("zv"))
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "g")
        write_sized(
            clustered, out, total_rows=16, row_bytes=1.0, target_file_bytes=1,
            cluster_by=("zv",),
        )
        spans = (
            spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("x") - F.min("x")).alias("xs"),
                (F.max("y") - F.min("y")).alias("ys"),
            )
            .collect()
        )
        assert len(spans) == 16
        assert all(r["xs"] <= 16 and r["ys"] <= 16 for r in spans)
