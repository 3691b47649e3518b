"""One-command maintenance over every batch-addressed state layout.

A real deployment runs state compaction as ONE scheduled job, not four
hand-assembled invocations (VERDICT r8 ask #6) — this module walks a
state root, recognizes every batch-addressed state dir under it, and
compacts each with the merge operator its layout calls for. The CLI
surface is ``python -m cdc_publisher_spark maintain --state-root D
[--upto-batch N] [--vacuum [--grace N]] [--dry-run]``.

Layout recognition is by SCHEMA, not by path name, because every state
dir in this engine is self-describing (streaming/state.py): the
columns a dir's parquet carries determine its merge algebra, and the
merge algebra is all compaction needs to know:

- ``cnt`` column            → sum-merge (count-min cells: group… r b
                              cnt; rare-gram exposure: sh source cnt).
                              SUM over the remaining key columns is the
                              state's own merge, lossless.
- ``label p s n``           → DECIMAL sum-merge of ``s`` and ``n`` per
                              (label, p) (centroid-drift partials,
                              streaming/drift_monitor.py).
- ``wh`` + ``fb``           → min-merge of the first-seen batch per
                              word type (vocabulary monitor,
                              streaming/vocab_monitor.py).
- ``bucket`` + ``M``        → max-merge (HLL registers) — max per
                              (group…, bucket).
- ``word`` + ``mask``       → bit_or-merge (the dedup guard's id
                              Bloom filter deltas).
- ``dh`` partition          → row state, re-partitioned by ``dh``
                              (dedup corpus).
- ``band`` + ``bhm``        → row state, re-partitioned by
                              (band, bhm) (dedup LSH index).
- anything else             → row state, no inner partitioning
                              (dedup pairs, future row layouts).

So the four shipped layouts (dedup quad, HLL, count-min, exposure)
and any future dir that follows the layer's conventions are all
covered by one walk. Discovery never descends into ``batch=N`` or
``_compact`` dirs; a dir qualifies as state iff it has ``batch=``
children or a compaction manifest.

The watermark contract mirrors the in-stream rule
(state.in_stream_watermark): compaction must only fold COMMITTED
batches. Offline — the normal maintenance window, streams stopped —
every batch dir on disk is committed, so ``upto_batch=None`` defaults
to each dir's own max batch id. Against a LIVE stream, pass an
explicit ``--upto-batch`` at or below the stream's last committed
batch and leave ``--vacuum`` off (or use ``--grace``); see
state.vacuum_state's concurrency contract.

``dry_run=True`` computes the identical plan — dir, layout, current →
target watermark, live/superseded dir counts — and writes nothing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.streaming.state import (
    batch_dirs,
    compact_state,
    compacted_upto,
    hadoop_fs,
    read_state,
    vacuum_state,
)

#: Directory names never descended into during discovery.
_SKIP_PREFIXES = ("batch=", "_")


@dataclass
class MaintenancePlan:
    """What ``maintain`` would do to one state dir."""

    path: str
    kind: str  # sum | hll | bloom | rows
    partition_cols: tuple[str, ...]
    current_upto: int | None
    target_upto: int | None  # None == nothing to do
    live_batches: int  # batch dirs above the current watermark
    superseded: int  # batch dirs a vacuum could reclaim AFTER compaction

    @property
    def action(self) -> str:
        return "compact" if self.target_upto is not None else "skip"


def classify_state_dir(
    columns: list[str],
) -> tuple[str, tuple[str, ...], object | None]:
    """(kind, partition_cols, merge_fn) for a state dir's schema.

    ``merge_fn`` is the ``compact_state``-shaped callable folding the
    read rows with the layout's own merge operator, or None for row
    state. The ``batch`` pin on merged rows follows the compaction
    watermark, applied by the caller (it knows the target)."""
    cols = set(columns)
    keys = tuple(c for c in columns if c != "batch")

    if "cnt" in cols:  # count-min cells / exposure gram counts
        gcols = tuple(c for c in keys if c != "cnt")

        def merge_sum(df: DataFrame) -> DataFrame:
            return df.groupBy(*gcols).agg(F.sum("cnt").cast("long").alias("cnt"))

        return "sum", (), merge_sum
    if {"label", "p", "s", "n"} <= cols:  # centroid-drift partial sums

        def merge_sn(df: DataFrame) -> DataFrame:
            return df.groupBy("label", "p").agg(
                F.sum("s").cast("decimal(30,8)").alias("s"),
                F.sum("n").cast("long").alias("n"),
            )

        return "sum", (), merge_sn
    if {"bucket", "M"} <= cols:  # HLL registers
        gcols = tuple(c for c in keys if c != "M")

        def merge_max(df: DataFrame) -> DataFrame:
            return df.groupBy(*gcols).agg(F.max("M").alias("M"))

        return "hll", (), merge_max
    if {"word", "mask"} <= cols:  # id Bloom deltas

        def merge_or(df: DataFrame) -> DataFrame:
            return df.groupBy("word").agg(F.bit_or("mask").alias("mask"))

        return "bloom", (), merge_or
    if {"wh", "fb"} <= cols:  # first-seen vocabulary (min-merge)
        gcols = tuple(c for c in keys if c != "fb")

        def merge_min(df: DataFrame) -> DataFrame:
            return df.groupBy(*gcols).agg(F.min("fb").alias("fb"))

        return "min", (), merge_min
    if "dh" in cols:  # dedup corpus (row state, dh-pruned reads)
        return "rows", ("dh",), None
    if {"band", "bhm"} <= cols:  # dedup LSH index
        return "rows", ("band", "bhm"), None
    return "rows", (), None


def discover_state_dirs(
    spark: SparkSession, state_root: str, max_depth: int = 3
) -> list[str]:
    """Every batch-addressed state dir at or under ``state_root``:
    has ``batch=N`` children or a compaction manifest. Never descends
    into batch/underscore dirs; depth-bounded so a mispointed root
    can't turn into a filesystem crawl."""
    fs, jroot = hadoop_fs(spark, state_root)
    if not fs.exists(jroot):
        return []
    found: list[str] = []

    def is_state(path: str) -> bool:
        return bool(batch_dirs(spark, path)) or compacted_upto(spark, path) is not None

    def walk(jpath, depth: int) -> None:
        path = jpath.toString()
        if is_state(path):
            found.append(path)
            return  # state dirs don't nest
        if depth >= max_depth:
            return
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if st.isDirectory() and not name.startswith(_SKIP_PREFIXES):
                walk(st.getPath(), depth + 1)

    walk(jroot, 0)
    return sorted(found)


def plan_maintenance(
    spark: SparkSession, state_root: str, upto_batch: int | None = None
) -> list[MaintenancePlan]:
    """The per-dir compaction plan ``run_maintenance`` will execute —
    the dry-run output. ``upto_batch=None`` targets each dir's own max
    batch id (offline semantics: everything on disk is committed)."""
    plans: list[MaintenancePlan] = []
    for d in discover_state_dirs(spark, state_root):
        cols = read_state(spark, d).columns
        kind, pcols, _ = classify_state_dir(cols)
        prev = compacted_upto(spark, d)
        dirs = [k for k, _ in batch_dirs(spark, d)]
        own_max = max(dirs) if dirs else prev
        target = own_max if upto_batch is None else upto_batch
        if target is None or (prev is not None and prev >= target):
            target = None  # already covered — idempotent skip
        live = [k for k in dirs if prev is None or k > prev]
        superseded = [k for k in dirs if target is not None and k <= target] + [
            k for k in dirs if target is None and prev is not None and k <= prev
        ]
        plans.append(
            MaintenancePlan(
                path=d,
                kind=kind,
                partition_cols=pcols,
                current_upto=prev,
                target_upto=target,
                live_batches=len(live),
                superseded=len(set(superseded)),
            )
        )
    return plans


def run_maintenance(
    spark: SparkSession,
    state_root: str,
    upto_batch: int | None = None,
    vacuum: bool = False,
    grace_batches: int = 0,
    dry_run: bool = False,
) -> list[MaintenancePlan]:
    """Execute (or with ``dry_run`` just return) the maintenance plan:
    compact every discovered state dir to its target watermark with
    its layout's merge operator, optionally vacuuming superseded dirs
    with a ``grace_batches`` margin. Idempotent: re-running at the
    same watermark is a per-dir no-op, and a crash mid-walk leaves
    already-flipped dirs compacted and the rest untouched (each dir's
    manifest flip is independently crash-safe)."""
    plans = plan_maintenance(spark, state_root, upto_batch)
    if dry_run:
        return plans
    for p in plans:
        if p.target_upto is None:
            continue
        _, _, merge_fn = classify_state_dir(read_state(spark, p.path).columns)
        merge = None
        if merge_fn is not None:
            target = p.target_upto

            def merge(df, _fn=merge_fn, _t=target):  # noqa: E731 — compact_state shape
                return _fn(df).withColumn("batch", F.lit(_t))

        compact_state(
            spark,
            p.path,
            p.target_upto,
            partition_cols=p.partition_cols,
            merge=merge,
        )
        if vacuum:
            vacuum_state(spark, p.path, grace_batches=grace_batches)
    return plans


__all__ = [
    "MaintenancePlan",
    "classify_state_dir",
    "discover_state_dirs",
    "plan_maintenance",
    "run_maintenance",
]
