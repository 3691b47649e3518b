"""CDC apply operator: batch semantics (insert/update/delete, latest-
wins within a batch), streaming snapshot maintenance, replay idempotence."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.cdc_apply import ParquetSnapshotApplier, apply_changes

SNAP_DDL = "pk long, name string, qty long"
CHG_DDL = "pk long, seq long, op string, name string, qty long"


def test_apply_changes_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], SNAP_DDL
    )
    changes = spark.createDataFrame(
        [
            (2, 100, "update", "b2", 21),
            (2, 101, "update", "b3", 22),   # latest wins within batch
            (3, 102, "delete", None, None),
            (4, 103, "insert", "d", 40),
            (5, 104, "insert", "e", 50),
            (5, 105, "delete", None, None),  # insert then delete -> gone
        ],
        CHG_DDL,
    )
    out = {r["pk"]: (r["name"], r["qty"]) for r in apply_changes(snap, changes, ["pk"], "seq").collect()}
    assert out == {1: ("a", 10), 2: ("b3", 22), 4: ("d", 40)}


def test_apply_changes_idempotent(spark):
    snap = spark.createDataFrame([(1, "a", 10)], SNAP_DDL)
    changes = spark.createDataFrame([(1, 5, "update", "a2", 11), (2, 6, "insert", "b", 20)], CHG_DDL)
    once = apply_changes(snap, changes, ["pk"], "seq")
    twice = apply_changes(once, changes, ["pk"], "seq")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_streaming_snapshot_maintenance(spark, tmp_path):
    src = tmp_path / "chg"
    src.mkdir()

    def batch_file(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    batch_file(
        "b1.jsonl",
        [
            {"pk": 1, "seq": 1, "op": "insert", "name": "a", "qty": 1},
            {"pk": 2, "seq": 2, "op": "insert", "name": "b", "qty": 2},
        ],
    )
    applier = ParquetSnapshotApplier(
        spark, str(tmp_path / "snap"), ["pk"], "seq", SNAP_DDL
    )
    stream = spark.readStream.schema(CHG_DDL).json(str(src))
    q = (
        stream.writeStream.foreachBatch(applier)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    snap1 = {r["pk"]: r["qty"] for r in applier.read_snapshot().collect()}
    assert snap1 == {1: 1, 2: 2}

    batch_file(
        "b2.jsonl",
        [
            {"pk": 1, "seq": 3, "op": "delete", "name": None, "qty": None},
            {"pk": 2, "seq": 4, "op": "update", "name": "b2", "qty": 22},
            {"pk": 3, "seq": 5, "op": "insert", "name": "c", "qty": 3},
        ],
    )
    q.processAllAvailable()
    q.stop()
    snap2 = {r["pk"]: (r["name"], r["qty"]) for r in applier.read_snapshot().collect()}
    assert snap2 == {2: ("b2", 22), 3: ("c", 3)}

    # restart same checkpoint: no reapplication, snapshot unchanged
    q2 = (
        spark.readStream.schema(CHG_DDL).json(str(src))
        .writeStream.foreachBatch(applier)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    snap3 = {r["pk"]: (r["name"], r["qty"]) for r in applier.read_snapshot().collect()}
    assert snap3 == snap2


def test_applier_crash_recovery_paths(spark, tmp_path):
    """ADVICE r01: no crash window may leave zero live snapshots.
    Manifest flip is atomic; a lost manifest recovers to the newest
    snap dir; a replayed already-published epoch is a no-op."""
    import os

    base = str(tmp_path / "snap")
    applier = ParquetSnapshotApplier(spark, base, ["pk"], "seq", SNAP_DDL)
    b1 = spark.createDataFrame(
        [(1, 1, "insert", "a", 1), (2, 2, "insert", "b", 2)], CHG_DDL
    )
    applier(b1, 0)
    assert {r["pk"] for r in applier.read_snapshot().collect()} == {1, 2}

    # crash scenario 1: staging written, crash AT the manifest flip —
    # the previous snapshot stays live and re-applying the epoch
    # converges
    b2 = spark.createDataFrame([(3, 3, "insert", "c", 3)], CHG_DDL)

    def crash(name):
        raise RuntimeError("simulated crash before manifest flip")

    real_publish = applier._publish
    applier._publish = crash
    with pytest.raises(RuntimeError, match="simulated crash"):
        applier(b2, 1)
    applier._publish = real_publish
    assert {r["pk"] for r in applier.read_snapshot().collect()} == {1, 2}
    applier(b2, 1)
    assert {r["pk"] for r in applier.read_snapshot().collect()} == {1, 2, 3}

    # crash scenario 2: manifest file lost entirely -> newest snap wins
    os.remove(applier.manifest_path)
    assert {r["pk"] for r in applier.read_snapshot().collect()} == {1, 2, 3}

    # replay of the published epoch: no-op, snapshot dir untouched
    applier._publish("snap-1")
    before = applier.current_path
    applier(b2, 1)
    assert applier.current_path == before
    assert {r["pk"] for r in applier.read_snapshot().collect()} == {1, 2, 3}


def test_scd2_current_equals_type1_apply(spark, sf_oracle):
    """Cross-operator invariant: SCD2's open versions == the type-1
    latest-state apply of the same change log onto an empty snapshot;
    and per key, version intervals are contiguous and non-overlapping."""
    from cdc_publisher_spark.operators.scd2 import scd2_history
    from cdc_publisher_spark.tables import load

    ev = load(spark, sf_oracle, "events")
    changes = ev.select(
        F.col("user_id").alias("pk"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
        .alias("op"),
        F.col("event_type").alias("segment"),
        F.round("value", 4).alias("bal"),
    )
    hist = scd2_history(changes, ["pk"], "seq")

    empty = spark.createDataFrame([], "pk BIGINT, segment STRING, bal DOUBLE")
    final = apply_changes(empty, changes, ["pk"], "seq")
    current = {
        r["pk"]: (r["segment"], r["bal"]) for r in hist.filter("is_current").collect()
    }
    applied = {r["pk"]: (r["segment"], r["bal"]) for r in final.collect()}
    assert current == applied and len(current) > 0

    by_key: dict[int, list] = {}
    for r in hist.collect():
        by_key.setdefault(r["pk"], []).append((r["valid_from"], r["valid_to"]))
    for pk, spans in by_key.items():
        spans.sort()
        assert sum(1 for _, vt in spans if vt is None) <= 1  # at most one open
        for (f1, t1), (f2, _) in zip(spans, spans[1:]):
            assert t1 is not None and f1 < t1 <= f2, (pk, spans)


MT_CHG_DDL = "table string, pk long, seq long, op string, name string, qty long"


def _mt_applier(spark, tmp_path):
    from cdc_publisher_spark.operators.cdc_apply import MultiTableSnapshotApplier

    spec = {"key_cols": ["pk"], "seq_col": "seq", "schema_ddl": SNAP_DDL}
    return MultiTableSnapshotApplier(
        spark, str(tmp_path / "mt"), {"orders": dict(spec), "items": dict(spec)}
    )


def test_multi_table_applier_end_to_end(spark, tmp_path):
    """Mixed two-table change stream: both tables converge to their
    batch-apply expectation, untouched tables carry forward, replaying
    a completed epoch is a no-op."""
    src = tmp_path / "chg"
    src.mkdir()
    applier = _mt_applier(spark, tmp_path)
    (src / "b1.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"table": "orders", "pk": 1, "seq": 1, "op": "insert", "name": "a", "qty": 1},
                {"table": "items", "pk": 7, "seq": 2, "op": "insert", "name": "x", "qty": 70},
                {"table": "orders", "pk": 2, "seq": 3, "op": "insert", "name": "b", "qty": 2},
            ]
        )
    )
    stream = spark.readStream.schema(MT_CHG_DDL).json(str(src))
    q = (
        stream.writeStream.foreachBatch(applier)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    # epoch 2 touches ONLY orders; items must carry forward
    (src / "b2.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"table": "orders", "pk": 1, "seq": 4, "op": "delete", "name": None, "qty": None},
                {"table": "orders", "pk": 3, "seq": 5, "op": "insert", "name": "c", "qty": 3},
            ]
        )
    )
    q.processAllAvailable()
    q.stop()
    orders = {r["pk"]: r["qty"] for r in applier.read_snapshot("orders").collect()}
    items = {r["pk"]: r["qty"] for r in applier.read_snapshot("items").collect()}
    assert orders == {2: 2, 3: 3}
    assert items == {7: 70}

    # completed-epoch replay: snapshots bit-stable
    m_before = applier._manifest()
    batch = spark.read.schema(MT_CHG_DDL).json(str(src / "b2.jsonl"))
    applier(batch, m_before["epoch"])
    assert applier._manifest() == m_before


def test_multi_table_applier_crash_consistency(spark, tmp_path):
    """Torn-state scenarios: a lost CURRENT pointer and a half-written
    next epoch must both recover to the newest COMPLETE manifest —
    never a mixed-epoch cross-table view."""
    import os

    applier = _mt_applier(spark, tmp_path)
    base = applier.base
    rows1 = [
        ("orders", 1, 1, "insert", "a", 1),
        ("items", 7, 2, "insert", "x", 70),
    ]
    rows2 = [
        ("orders", 1, 3, "update", "a2", 11),
        ("items", 7, 4, "update", "x2", 77),
    ]
    mk = lambda rows: spark.createDataFrame(rows, MT_CHG_DDL)
    applier(mk(rows1), 0)
    applier(mk(rows2), 1)
    expect = lambda: (
        {r["pk"]: r["qty"] for r in applier.read_snapshot("orders").collect()},
        {r["pk"]: r["qty"] for r in applier.read_snapshot("items").collect()},
    )
    assert expect() == ({1: 11}, {7: 77})

    # crash case 1: CURRENT pointer lost
    os.remove(applier.current_pointer)
    assert expect() == ({1: 11}, {7: 77})

    # crash case 2: epoch 2 died after writing ONE table's snapshot dir
    # and no manifest — recovery must still show epoch 1 for BOTH
    os.makedirs(os.path.join(base, "orders-snap-2"), exist_ok=True)
    assert expect() == ({1: 11}, {7: 77})
    assert applier._manifest()["epoch"] == 1
