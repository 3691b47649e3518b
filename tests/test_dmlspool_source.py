"""The custom Python streaming source (sources/dmlspool.py): offset
progression, checkpoint resume without re-emission, batch read parity,
and composition with the CDC publish pipeline."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_publisher_spark.sources import dmlspool
from cdc_publisher_spark.streaming.pipeline import run_file_to_parquet


def _dml(i: int) -> str:
    return json.dumps(
        {"id": {"pk": i}, "type": "insert", "table": "spooled",
         "data": {"v": i}, "info": {"user": "u", "timestamp": "2024-01-01T00:00:00"}},
        separators=(",", ":"),
    )


def test_spool_stream_offsets_and_resume(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "000.jsonl").write_text("".join(_dml(i) + "\n" for i in range(5)))

    dmlspool.register(spark)
    stream = spark.readStream.format("dmlspool").option("path", str(spool)).load()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_file_to_parquet(stream, out, ckpt)
    q.processAllAvailable()

    (spool / "001.jsonl").write_text("".join(_dml(i) + "\n" for i in range(5, 9)))
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 9
    assert sorted(r["value"] for r in rows) == sorted(_dml(i) for i in range(9))
    assert all(r["topic"] == "spooled" for r in rows)

    # restart on the same checkpoint: offset log prevents re-emission
    stream2 = spark.readStream.format("dmlspool").option("path", str(spool)).load()
    q2 = run_file_to_parquet(stream2, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == 9

    # new spool file after restart is picked up from the stored offset
    (spool / "002.jsonl").write_text(_dml(99) + "\n")
    q3 = run_file_to_parquet(
        spark.readStream.format("dmlspool").option("path", str(spool)).load(), out, ckpt
    )
    q3.processAllAvailable()
    q3.stop()
    assert spark.read.parquet(out).count() == 10


def test_spool_appends_and_partial_lines(spark, tmp_path):
    """Per-file byte offsets: lines appended to an already-consumed file
    are read on the next trigger, and a partial (newline-less) tail is
    invisible until its newline lands."""
    spool = tmp_path / "spool_a"
    spool.mkdir()
    f = spool / "000.jsonl"
    f.write_text(_dml(0) + "\n" + _dml(1) + "\n")

    dmlspool.register(spark)
    out, ckpt = str(tmp_path / "out_a"), str(tmp_path / "ckpt_a")
    q = run_file_to_parquet(
        spark.readStream.format("dmlspool").option("path", str(spool)).load(), out, ckpt
    )
    q.processAllAvailable()
    assert spark.read.parquet(out).count() == 2

    # append to the SAME file: old count-based offsets would never see this
    with f.open("a") as fh:
        fh.write(_dml(2) + "\n")
        fh.write(_dml(3))  # mid-append: no newline yet
    q.processAllAvailable()
    assert spark.read.parquet(out).count() == 3  # record 3 still invisible

    with f.open("a") as fh:
        fh.write("\n")  # newline lands -> record 3 becomes visible
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(out).collect()
    assert sorted(r["value"] for r in rows) == sorted(_dml(i) for i in range(4))


def test_spool_late_arriving_file_sorts_before_consumed(spark, tmp_path):
    """A new file whose name sorts BEFORE already-consumed names must be
    read exactly once (count-based offsets re-emit one old file and skip
    the new one)."""
    spool = tmp_path / "spool_l"
    spool.mkdir()
    (spool / "bbb.jsonl").write_text(_dml(0) + "\n")
    dmlspool.register(spark)
    out, ckpt = str(tmp_path / "out_l"), str(tmp_path / "ckpt_l")
    q = run_file_to_parquet(
        spark.readStream.format("dmlspool").option("path", str(spool)).load(), out, ckpt
    )
    q.processAllAvailable()
    (spool / "aaa.jsonl").write_text(_dml(1) + "\n")  # sorts first, arrives last
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(out).collect()
    assert sorted(r["value"] for r in rows) == sorted(_dml(i) for i in range(2))


def test_spool_shrunk_file_fails_loudly(tmp_path):
    """Truncating a consumed file violates the append-only contract and
    must raise, not silently re-slice."""
    import pytest

    from cdc_publisher_spark.sources.dmlspool import DmlSpoolStreamReader

    spool = tmp_path / "spool_s"
    spool.mkdir()
    f = spool / "000.jsonl"
    f.write_text(_dml(0) + "\n" + _dml(1) + "\n")
    reader = DmlSpoolStreamReader({"path": str(spool)})
    _, end = reader.read(reader.initialOffset())
    f.write_text(_dml(0) + "\n")  # shrink below the consumed offset
    with pytest.raises(RuntimeError, match="append-only"):
        reader.read(end)


def test_spool_batch_read_parity(spark, tmp_path):
    spool = tmp_path / "spool_b"
    spool.mkdir()
    (spool / "a.jsonl").write_text("\n".join(_dml(i) for i in range(3)))
    dmlspool.register(spark)
    df = spark.read.format("dmlspool").option("path", str(spool)).load()
    assert df.schema.simpleString() == "struct<raw:string>"
    assert sorted(r["raw"] for r in df.collect()) == sorted(_dml(i) for i in range(3))
    parsed = df.select(F.get_json_object("raw", "$.id.pk").alias("pk"))
    assert sorted(r["pk"] for r in parsed.collect()) == ["0", "1", "2"]
