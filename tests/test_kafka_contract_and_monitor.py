"""Contract tests for the Kafka option wiring (no broker in this
container — the options are built as data and asserted; the same dicts
feed the real DataStreamReader/Writer) and for the rate-limited
malformed-message monitor (reference: jms_publisher.clj:17,84-99 logs a
malformed payload at most once per 10 minutes)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_publisher_spark.sources.kafka import (
    DEFAULT_CONTROL_TOPIC,
    reader_options,
    resume_offsets_json,
    writer_options,
)
from cdc_publisher_spark.streaming.monitor import malformed_rate_monitor


def test_reader_options_wiring():
    opts = reader_options("broker1:9092,broker2:9092", DEFAULT_CONTROL_TOPIC)
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "change-data-capture",
        "startingOffsets": "earliest",
    }
    # resume variant carries the position through
    assert reader_options("b:9092", "t", '{"t":{"0":5}}')["startingOffsets"] == '{"t":{"0":5}}'


def test_resume_offsets_are_exclusive_of_consumed():
    """The reference resumes from (inc offset) — jms_publisher.clj:136.
    startingOffsets JSON is inclusive, so each consumed offset +1."""
    j = json.loads(resume_offsets_json("change-data-capture", {0: 41, 1: 7}))
    assert j == {"change-data-capture": {"0": 42, "1": 8}}


def test_writer_options_wiring():
    opts = writer_options("b:9092", "/ckpt/wire", compression="lz4")
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "kafka.compression.type": "lz4",
        "checkpointLocation": "/ckpt/wire",
    }


def _dead_rows():
    # two 10-minute windows: [00:00,00:10) has 2 malformed, [00:10,00:20) has 1
    return [
        ("2024-01-01T00:01:00", "{bad-b"),
        ("2024-01-01T00:05:00", "{bad-a"),
        ("2024-01-01T00:12:00", "{bad-c"),
    ]


def test_malformed_monitor_batch(spark):
    df = spark.createDataFrame(_dead_rows(), "ts_s string, value string").select(
        F.to_timestamp("ts_s").alias("ts"), "value"
    )
    out = {
        (str(r["window_start"]), r["malformed_count"], r["example_payload"])
        for r in malformed_rate_monitor(df).collect()
    }
    assert out == {
        ("2024-01-01 00:00:00", 2, "{bad-a"),  # min() exemplar: deterministic
        ("2024-01-01 00:10:00", 1, "{bad-c"),
    }


def test_malformed_monitor_stream(spark, tmp_path):
    src = tmp_path / "dead"
    src.mkdir()
    (src / "0.jsonl").write_text(
        "".join(json.dumps({"ts": t, "value": v}) + "\n" for t, v in _dead_rows())
    )
    stream = (
        spark.readStream.schema("ts timestamp, value string").json(str(src))
    )
    mon = malformed_rate_monitor(stream)
    q = (
        mon.writeStream.format("memory")
        .queryName("malformed_mon")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM malformed_mon").collect()
    finally:
        q.stop()
    got = {(str(r["window_start"]), r["malformed_count"], r["example_payload"]) for r in rows}
    assert got == {
        ("2024-01-01 00:00:00", 2, "{bad-a"),
        ("2024-01-01 00:10:00", 1, "{bad-c"),
    }
