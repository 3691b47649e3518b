"""CDC apply — materialize a change stream into a table snapshot.

The reference publishes DML envelopes; the consuming side of that
contract turns them back into tables. This operator is that consumer:
MERGE-style apply without a lakehouse format (SURVEY.md pyspark guide:
"CDC / SCD2 -> emulate with anti-join + union + window").

Semantics per batch of envelopes (type ∈ insert|update|delete, keyed
by the T3 id):

1. reduce the batch to the LATEST change per key (seq order) — A1
   again, as a plain max_by;
2. snapshot rows whose key appears in the batch are dropped
   (left_anti);
3. surviving latest inserts/updates are unioned in (upsert);
   deletes contribute nothing.

Batch form is a pure DataFrame transform; the streaming form applies
each micro-batch in ``foreachBatch`` against a parquet snapshot
directory with an atomic swap (write new snapshot -> rename), giving
idempotent at-least-once application: replaying a batch converges to
the same snapshot.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.cdc.latest_state import latest_per_key


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    type_col: str = "op",
) -> DataFrame:
    """One apply step: (snapshot ⟵ changes) -> new snapshot.

    ``changes`` columns = key_cols + [seq_col, type_col] + payload
    (payload columns must match the snapshot's non-key columns).
    """
    latest = latest_per_key(changes, key_cols, seq_col)
    payload_cols = [c for c in snapshot.columns if c not in key_cols]
    survivors = snapshot.join(latest.select(*key_cols), key_cols, "left_anti")
    upserts = latest.filter(F.col(type_col).isin("insert", "update")).select(
        *key_cols, *payload_cols
    )
    return survivors.unionByName(upserts)


class ParquetSnapshotApplier:
    """foreachBatch body maintaining a parquet snapshot under ``base``.

    Layout: immutable snapshot dirs ``base/snap-<epoch>`` plus a
    ``base/CURRENT`` manifest naming the live one. The manifest is
    updated with a single atomic ``os.replace`` — there is no window
    in which no snapshot is current (a crash mid-publish leaves the
    previous manifest intact, never an empty state). Replay-safe:
    applying the same batch twice yields the same snapshot (apply is
    idempotent on its input set), which is exactly the guarantee
    at-least-once micro-batches need.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key_cols: list[str],
        seq_col: str,
        schema_ddl: str,
        type_col: str = "op",
    ) -> None:
        self.spark = spark
        self.base = base
        self.key_cols = key_cols
        self.seq_col = seq_col
        self.type_col = type_col
        self.schema_ddl = schema_ddl
        os.makedirs(base, exist_ok=True)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.base, "CURRENT")

    @property
    def current_path(self) -> str | None:
        """Directory of the live snapshot, or None before the first batch."""
        if os.path.isfile(self.manifest_path):
            with open(self.manifest_path) as fh:
                name = fh.read().strip()
            if name:
                path = os.path.join(self.base, name)
                if os.path.isdir(path):
                    return path
        # Manifest lost (e.g. crash before the very first publish but
        # after a snapshot dir landed): recover the newest snapshot dir
        # rather than silently restarting from empty state.
        snaps = sorted(
            (d for d in os.listdir(self.base) if d.startswith("snap-")),
            key=lambda d: int(d.split("-", 1)[1]),
        )
        return os.path.join(self.base, snaps[-1]) if snaps else None

    def read_snapshot(self) -> DataFrame:
        path = self.current_path
        if path is not None:
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], self.schema_ddl)

    def _publish(self, name: str) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(name)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.manifest_path)  # single atomic pointer flip

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        old_path = self.current_path
        if old_path is not None and os.path.basename(old_path) == f"snap-{epoch_id}":
            # Replay of an epoch whose publish already completed: the
            # batch is fully applied; re-applying would overwrite the
            # directory we are reading from.
            return
        new_snapshot = apply_changes(
            self.read_snapshot(), batch_df, self.key_cols, self.seq_col, self.type_col
        )
        staging = os.path.join(self.base, f"snap-{epoch_id}")
        new_snapshot.write.mode("overwrite").parquet(staging)
        self._publish(f"snap-{epoch_id}")
        if old_path is not None and os.path.abspath(old_path) != os.path.abspath(staging):
            shutil.rmtree(old_path, ignore_errors=True)


class MultiTableSnapshotApplier:
    """foreachBatch body applying a MIXED change stream (envelopes
    carrying a ``table`` column, the reference's dynamic fan-out D1
    shape) into one parquet snapshot per table, with CROSS-TABLE
    crash consistency.

    Why the single-table applier isn't enough: a micro-batch holding
    changes for both ``orders`` and ``lineitem`` applied through two
    independent appliers has a crash window where table A shows the
    batch and table B doesn't — a torn cross-table state no reader can
    detect. Here every epoch publishes ONE immutable manifest
    (``manifest-<epoch>.json`` naming each table's snapshot dir,
    fsynced before use) and a single atomic ``os.replace`` of the
    ``CURRENT`` pointer flips all tables at once:

    - crash while writing snapshot dirs: CURRENT still names the old
      manifest; old dirs are only deleted after the flip — readers see
      the previous consistent state;
    - crash after manifest write, before the flip: same — the new
      manifest is unreferenced and the epoch replays idempotently;
    - CURRENT lost entirely: recovery scans for the NEWEST manifest
      whose directories all exist — never a mixed-epoch view.

    Tables absent from a batch keep their previous snapshot dir (the
    manifest carries the old name forward), so untouched tables cost
    nothing per epoch.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        tables: dict[str, dict],
        table_col: str = "table",
    ) -> None:
        """``tables`` maps table name -> {key_cols, seq_col, schema_ddl,
        type_col (optional)}."""
        self.spark = spark
        self.base = base
        self.tables = tables
        self.table_col = table_col
        os.makedirs(base, exist_ok=True)

    @property
    def current_pointer(self) -> str:
        return os.path.join(self.base, "CURRENT")

    def _manifest(self) -> dict | None:
        import json as _json

        name = None
        if os.path.isfile(self.current_pointer):
            with open(self.current_pointer) as fh:
                name = fh.read().strip() or None
        if name and os.path.isfile(os.path.join(self.base, name)):
            with open(os.path.join(self.base, name)) as fh:
                return _json.load(fh)
        # pointer lost: newest manifest whose snapshot dirs ALL exist
        cands = sorted(
            (f for f in os.listdir(self.base) if f.startswith("manifest-")),
            key=lambda f: int(f.split("-", 1)[1].split(".")[0]),
            reverse=True,
        )
        for f in cands:
            with open(os.path.join(self.base, f)) as fh:
                m = _json.load(fh)
            if all(
                os.path.isdir(os.path.join(self.base, d)) for d in m["tables"].values()
            ):
                return m
        return None

    def read_snapshot(self, table: str) -> DataFrame:
        m = self._manifest()
        if m is not None and table in m["tables"]:
            return self.spark.read.parquet(os.path.join(self.base, m["tables"][table]))
        return self.spark.createDataFrame([], self.tables[table]["schema_ddl"])

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        import json as _json

        prev = self._manifest()
        if prev is not None and prev["epoch"] == epoch_id:
            return  # completed-epoch replay: already fully applied
        if batch_df.isEmpty():
            return
        new_tables: dict[str, str] = dict(prev["tables"]) if prev else {}
        touched: list[str] = []
        for name, spec in self.tables.items():
            subset = batch_df.filter(F.col(self.table_col) == name).drop(self.table_col)
            if subset.isEmpty():
                continue
            new_snap = apply_changes(
                self.read_snapshot(name),
                subset,
                spec["key_cols"],
                spec["seq_col"],
                spec.get("type_col", "op"),
            )
            dirname = f"{name}-snap-{epoch_id}"
            new_snap.write.mode("overwrite").parquet(os.path.join(self.base, dirname))
            new_tables[name] = dirname
            touched.append(name)
        if not touched:
            return
        mname = f"manifest-{epoch_id}.json"
        tmp = os.path.join(self.base, mname + ".tmp")
        with open(tmp, "w") as fh:
            _json.dump({"epoch": epoch_id, "tables": new_tables}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self.base, mname))
        ptr_tmp = self.current_pointer + ".tmp"
        with open(ptr_tmp, "w") as fh:
            fh.write(mname)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(ptr_tmp, self.current_pointer)  # all tables flip together
        # cleanup: snapshot dirs superseded this epoch + manifests two behind
        if prev is not None:
            for name in touched:
                old = prev["tables"].get(name)
                if old and old != new_tables[name]:
                    shutil.rmtree(os.path.join(self.base, old), ignore_errors=True)
            for f in os.listdir(self.base):
                if (
                    f.startswith("manifest-")
                    and not f.endswith(".tmp")
                    and f not in (mname, f"manifest-{prev['epoch']}.json")
                ):
                    os.remove(os.path.join(self.base, f))
