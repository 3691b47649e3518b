"""Full-system integration: the reference's complete workflow
(SURVEY.md §3) through the engine, end to end —

control spool (CCD updates) -> stateful latest-state -> active-route
control loop (D1) -> DML publish pipeline (T1/T3/K1 with dead-letter
E1) -> CDC apply (consumer side) -> materialized snapshots.

One test, every seam: if any contract between the pieces drifts, this
breaks.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_publisher_spark.cdc.keying import derive_key
from cdc_publisher_spark.operators.cdc_apply import ParquetSnapshotApplier
from cdc_publisher_spark.sources.files import read_dml_stream
from cdc_publisher_spark.streaming.latest_state_stream import stream_latest_per_key
from cdc_publisher_spark.streaming.pipeline import run_file_to_parquet
from cdc_publisher_spark.streaming.routes import RouteRegistry, route_control_batch


def _ccd(key: int, offset: int, status: str, queue: str) -> str:
    return json.dumps(
        {"key": key, "offset": offset, "status": status, "queue": queue}
    )


def _dml(table: str, pk: int, seq: int, op: str, qty: int) -> str:
    return json.dumps(
        {
            "id": {"pk": pk},
            "type": op,
            "table": table,
            "data": {"qty": str(qty), "seq": str(seq)},
            "info": {"user": "it", "timestamp": "2024-02-01T00:00:00"},
        },
        separators=(",", ":"),
    )


def test_reference_workflow_end_to_end(spark, tmp_path):
    # --- 1. control plane: CCDs activate two queues, error a third ----
    control = tmp_path / "control"
    control.mkdir()
    (control / "0.jsonl").write_text(
        "\n".join(
            [
                _ccd(1, 1, "submitted", "aq.orders"),
                _ccd(1, 2, "active", "aq.orders"),
                _ccd(2, 1, "active", "aq.items"),
                _ccd(3, 1, "active", "aq.legacy"),
                _ccd(3, 2, "error", "aq.legacy"),  # later state wins: no route
            ]
        )
    )
    registry = RouteRegistry(on_add=lambda q: q, on_remove=lambda q, h: None)
    ccd_stream = spark.readStream.schema("key int, offset long, status string, queue string").json(
        str(control)
    )
    latest = stream_latest_per_key(ccd_stream, ["key"], "offset", ["status", "queue"])
    qc = (
        latest.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_control"))
        .foreachBatch(route_control_batch(registry))
        .start()
    )
    qc.processAllAvailable()
    qc.stop()
    assert set(registry.routes()) == {"aq.orders", "aq.items"}
    assert registry.live_count == 2  # the M1 gauge

    # --- 2. data plane: DML for both active tables + one poison row ---
    spool = tmp_path / "dml"
    spool.mkdir()
    (spool / "0.jsonl").write_text(
        "\n".join(
            [
                _dml("orders", 1, 1, "insert", 10),
                _dml("orders", 2, 2, "insert", 20),
                _dml("items", 7, 3, "insert", 70),
                "NOT JSON AT ALL",
                _dml("orders", 1, 4, "update", 11),
                _dml("items", 7, 5, "delete", 0),
                _dml("items", 8, 6, "insert", 80),
            ]
        )
    )
    wire_dir, ck = str(tmp_path / "wire"), str(tmp_path / "ck_dml")
    qp = run_file_to_parquet(read_dml_stream(spark, str(spool)), wire_dir, ck)
    qp.processAllAvailable()
    qp.stop()

    wire = spark.read.parquet(wire_dir)
    # routing: topic == table; poison row dead-lettered, stream alive
    assert set(r["topic"] for r in wire.select("topic").distinct().collect()) == {
        "orders", "items", "cdc-dead-letter",
    }
    assert wire.filter(F.col("topic") == "cdc-dead-letter").count() == 1
    # keys are the reference derivation; values byte-verbatim
    for r in wire.filter(F.col("topic") == "orders").collect():
        doc = json.loads(r["value"])
        assert r["key"] == derive_key(doc["id"])

    # --- 3. consumer side: apply each topic's changes to a snapshot ---
    changes = (
        wire.filter(F.col("topic") != "cdc-dead-letter")
        .select(
            F.col("topic"),
            F.get_json_object("value", "$.id.pk").cast("long").alias("pk"),
            F.get_json_object("value", "$.data.seq").cast("long").alias("seq"),
            F.get_json_object("value", "$.type").alias("op"),
            F.get_json_object("value", "$.data.qty").cast("long").alias("qty"),
        )
    )
    snapshots = {}
    for topic in ("orders", "items"):
        applier = ParquetSnapshotApplier(
            spark, str(tmp_path / f"snap_{topic}"), ["pk"], "seq", "pk long, qty long"
        )
        applier(changes.filter(F.col("topic") == topic).drop("topic"), epoch_id=0)
        snapshots[topic] = {
            r["pk"]: r["qty"] for r in applier.read_snapshot().collect()
        }
    assert snapshots["orders"] == {1: 11, 2: 20}  # update won over insert
    assert snapshots["items"] == {8: 80}          # 7 inserted then deleted
