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
    (spool / "000.jsonl").write_text("\n".join(_dml(i) for i in range(5)))

    dmlspool.register(spark)
    stream = spark.readStream.format("dmlspool").option("path", str(spool)).load()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_file_to_parquet(stream, out, ckpt)
    q.processAllAvailable()

    (spool / "001.jsonl").write_text("\n".join(_dml(i) for i in range(5, 9)))
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
    (spool / "002.jsonl").write_text(_dml(99))
    q3 = run_file_to_parquet(
        spark.readStream.format("dmlspool").option("path", str(spool)).load(), out, ckpt
    )
    q3.processAllAvailable()
    q3.stop()
    assert spark.read.parquet(out).count() == 10


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
