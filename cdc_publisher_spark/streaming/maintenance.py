"""One-command maintenance over every batch-addressed state layout.

A real deployment runs state compaction as ONE scheduled job, not four
hand-assembled invocations (VERDICT r8 ask #6) — this module walks a
state root, recognizes every batch-addressed state dir under it, and
compacts each with the merge operator its layout calls for. The CLI
surface is ``python -m cdc_publisher_spark maintain --state-root D
[--upto-batch N | --checkpoint C | --assume-all-committed]
[--vacuum [--grace N]] [--dry-run]``.

Layout recognition (ADVICE r9, low)
-----------------------------------
Every writer DECLARES its dir's merge algebra with an explicit
``_layout.<name>`` marker file (state.write_layout_marker), and
``maintain`` trusts the declaration — never a column-name guess, so a
future row-state layout that happens to carry a ``cnt`` column cannot
be silently sum-merged. The declared layouts:

- ``sum-cnt``        → SUM ``cnt`` per remaining columns (count-min
                       cells; rare-gram exposure counts). Lossless:
                       sum is the state's own merge.
- ``sum-sn``         → DECIMAL-sum ``s`` + long-sum ``n`` per
                       (label, p) (centroid-drift partials).
- ``max-M``          → max ``M`` per remaining columns (HLL
                       registers).
- ``bitor-mask``     → bit_or ``mask`` per ``word`` (the dedup
                       guard's id-Bloom deltas).
- ``min-fb``         → min ``fb`` per remaining columns (first-seen
                       vocabulary).
- ``sum-ctx``        → column-wise long-sum of every metric column
                       per ``budget`` (context-length economics
                       partial sums, ctx_monitor).
- ``rows``           → row state, rewritten verbatim (dedup pairs).
- ``rows-dh``        → row state partitioned by ``dh`` (dedup corpus).
- ``rows-ebm`` / ``rows-vh``
                     → embedding near-dup monitor: signature index
                       cells / vector store (embed_monitor).
- ``rows-bhm``       → row state partitioned by ``bhm`` (dedup LSH
                       index since r11 — band dirs never pruned).
- ``rows-band-bhm``  → row state partitioned by (band, bhm) (legacy
                       pre-r11 dedup LSH index dirs).
- ``rows-fm-1024`` / ``rows-fm``
                     → audio-dup fpk state partitioned by ``fm``
                       (r12 1024-way fan / legacy r11 64-way fan —
                       the marker name carries the modulus).

A dir with NO marker (state written by a pre-marker version) falls
back to full-signature schema matching — each aggregate algebra
requires its layout's complete column fingerprint, not one column —
and anything unrecognized is SKIPPED with a note in the plan rather
than guessed at. Discovery never descends into ``batch=N`` or
underscore dirs; a dir qualifies as state iff it has ``batch=``
children or a compaction manifest.

The watermark contract (ADVICE r9, medium)
------------------------------------------
Compaction must fold COMMITTED batches only — and the filesystem
alone cannot prove the newest ``batch=N`` dir committed: a crash
between a foreachBatch write and its checkpoint commit leaves that
dir on disk UNcommitted, and merge-style compaction pins merged rows
(notably the dedup id-Bloom history) to the watermark batch id, so
folding it would let the restarted stream's replayed trigger
(``exclude_batch=N``) drop the entire merged history. Hence:

- default (``upto_batch=None``): each dir folds to its OWN max batch
  id MINUS ONE — the newest on-disk batch is treated as potentially
  uncommitted and stays live until a later batch lands above it;
- ``checkpoint_dir=...``: the committed watermark is read from the
  stream checkpoint's ``commits/`` log (Spark's own resume source of
  truth, state.checkpoint_committed_upto) and capped at each dir's
  own max — the exact answer when all dirs belong to one stream;
- ``assume_all_committed=True``: fold to each dir's own max — ONLY
  for streams known to have stopped cleanly (stop() returned /
  processAllAvailable completed), where the last write's commit is
  on disk by definition.

Against a LIVE stream, pass an explicit ``--upto-batch`` at or below
the stream's last committed batch and mind ``--vacuum``'s concurrency
contract (state.vacuum_state); ``--grace`` leaves a margin.

``dry_run=True`` computes the identical plan — dir, layout, current →
target watermark, live/superseded dir counts — and writes nothing.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.streaming.state import (
    batch_dirs,
    checkpoint_committed_upto,
    compact_state,
    compacted_upto,
    hadoop_fs,
    read_layout_marker,
    read_state,
    vacuum_state,
)

#: Directory names never descended into during discovery.
_SKIP_PREFIXES = ("batch=", "_")


@dataclass(frozen=True)
class LayoutSpec:
    """One declared merge algebra: how ``maintain`` compacts a dir."""

    name: str
    kind: str  # display family: sum | hll | bloom | min | rows
    partition_cols: tuple[str, ...]
    required: frozenset  # columns the layout cannot exist without
    # merge_builder(columns) -> compact_state-shaped fold, or None for
    # row state (rewrite verbatim, keep inner partitioning)
    merge_builder: Callable[[list[str]], Callable[[DataFrame], DataFrame]] | None


def _sum_cnt(columns: list[str]) -> Callable[[DataFrame], DataFrame]:
    gcols = [c for c in columns if c not in ("cnt", "batch")]

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(*gcols).agg(F.sum("cnt").cast("long").alias("cnt"))

    return merge


def _sum_sn(_: list[str]) -> Callable[[DataFrame], DataFrame]:
    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy("label", "p").agg(
            F.sum("s").cast("decimal(30,8)").alias("s"),
            F.sum("n").cast("long").alias("n"),
        )

    return merge


def _max_m(columns: list[str]) -> Callable[[DataFrame], DataFrame]:
    gcols = [c for c in columns if c not in ("M", "batch")]

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(*gcols).agg(F.max("M").alias("M"))

    return merge


def _bitor_mask(_: list[str]) -> Callable[[DataFrame], DataFrame]:
    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy("word").agg(F.bit_or("mask").alias("mask"))

    return merge


def _min_fb(columns: list[str]) -> Callable[[DataFrame], DataFrame]:
    gcols = [c for c in columns if c not in ("fb", "batch")]

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(*gcols).agg(F.min("fb").alias("fb"))

    return merge


def _sum_ctx(columns: list[str]) -> Callable[[DataFrame], DataFrame]:
    mcols = [c for c in columns if c not in ("budget", "batch")]

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy("budget").agg(
            *[F.sum(c).cast("long").alias(c) for c in mcols]
        )

    return merge


#: Name → spec for every layout a writer may declare. Writers pass
#: these exact names to state.write_layout_marker.
LAYOUTS: dict[str, LayoutSpec] = {
    s.name: s
    for s in (
        LayoutSpec("sum-cnt", "sum", (), frozenset({"cnt"}), _sum_cnt),
        LayoutSpec("sum-sn", "sum", (), frozenset({"label", "p", "s", "n"}), _sum_sn),
        LayoutSpec("max-M", "hll", (), frozenset({"M"}), _max_m),
        LayoutSpec("bitor-mask", "bloom", (), frozenset({"word", "mask"}), _bitor_mask),
        LayoutSpec("min-fb", "min", (), frozenset({"fb"}), _min_fb),
        LayoutSpec(
            "sum-ctx",
            "sum",
            (),
            frozenset(
                {
                    "budget",
                    "n_docs",
                    "total_tokens",
                    "n_trunc_docs",
                    "trunc_lost_tokens",
                    "n_chunks",
                    "pad_tokens",
                }
            ),
            _sum_ctx,
        ),
        LayoutSpec("rows", "rows", (), frozenset(), None),
        LayoutSpec("rows-dh", "rows", ("dh",), frozenset({"dh"}), None),
        # embedding near-dup monitor (streaming/embed_monitor): the
        # signature index's (band, bh)-cell fan and the vector store's
        # id-hash fan
        LayoutSpec("rows-ebm", "rows", ("ebm",), frozenset({"ebm"}), None),
        LayoutSpec("rows-vh", "rows", ("vh",), frozenset({"vh"}), None),
        # the dedup LSH index since r11: bhm-only dirs (band never
        # pruned anything — every doc populates every band)
        LayoutSpec("rows-bhm", "rows", ("bhm",), frozenset({"bhm"}), None),
        # audio-dup monitor fingerprint keys (streaming/audio_monitor):
        # the r12 1024-way fan carries the modulus in the marker name;
        # the legacy unversioned marker is the r11 64-way fan. Both
        # compact identically (verbatim rewrite keeping fm dirs — fm
        # values were assigned under the dir's own modulus)
        LayoutSpec("rows-fm-1024", "rows", ("fm",), frozenset({"fm"}), None),
        LayoutSpec("rows-fm", "rows", ("fm",), frozenset({"fm"}), None),
        # legacy pre-r11 index dirs; compacting one folds it into the
        # same (band,bhm)-dir shape it was written with
        LayoutSpec(
            "rows-band-bhm", "rows", ("band", "bhm"), frozenset({"band", "bhm"}), None
        ),
    )
}


@dataclass
class MaintenancePlan:
    """What ``maintain`` would do to one state dir."""

    path: str
    kind: str  # sum | hll | bloom | min | rows | unrecognized
    partition_cols: tuple[str, ...]
    current_upto: int | None
    target_upto: int | None  # None == nothing to do
    live_batches: int  # batch dirs above the current watermark
    superseded: int  # batch dirs a vacuum could reclaim AFTER compaction
    note: str = field(default="")

    @property
    def action(self) -> str:
        if self.kind == "unrecognized":
            return "skip"
        return "compact" if self.target_upto is not None else "skip"


def _fallback_layout(columns: list[str]) -> LayoutSpec | None:
    """Full-signature schema matching for dirs that predate layout
    markers. Aggregate algebras require their layout's complete column
    fingerprint (ADVICE r9: single-column presence misclassified
    future layouts); unknown schemas return None → skip-with-note,
    never a guessed merge."""
    cols = set(columns)
    if cols == {"label", "p", "s", "n", "batch"}:
        return LAYOUTS["sum-sn"]
    if cols == {"word", "mask", "batch"}:
        return LAYOUTS["bitor-mask"]
    if {"bucket", "M", "batch"} <= cols and cols <= {"source", "group", "g",
                                                     "bucket", "M", "batch"}:
        return LAYOUTS["max-M"]
    if {"wh", "fb", "batch"} <= cols and cols <= {"source", "wh", "fb", "batch"}:
        return LAYOUTS["min-fb"]
    if {
        "budget",
        "n_docs",
        "total_tokens",
        "n_trunc_docs",
        "trunc_lost_tokens",
        "n_chunks",
        "pad_tokens",
        "batch",
    } == cols:  # ctx economics: exact wide-sum signature
        return LAYOUTS["sum-ctx"]
    if {"r", "b", "cnt", "batch"} <= cols:  # count-min: variable group cols
        return LAYOUTS["sum-cnt"]
    if cols == {"sh", "source", "cnt", "batch"}:  # exposure, exact
        return LAYOUTS["sum-cnt"]
    if "dh" in cols:
        return LAYOUTS["rows-dh"]
    if "fm" in cols:
        return LAYOUTS["rows-fm"]
    if "ebm" in cols:
        return LAYOUTS["rows-ebm"]
    if "vh" in cols:
        return LAYOUTS["rows-vh"]
    if "bhm" in cols:
        # marker-less index dirs (legacy Hive band=/bhm= and r11
        # bhm-only read back with the same column set); fold to the
        # r11 bhm-only layout — a correct rewrite of either
        return LAYOUTS["rows-bhm"]
    return None


def classify_state_dir(
    columns: list[str], layout: str | None = None
) -> tuple[str, tuple[str, ...], Callable[[DataFrame], DataFrame] | None] | None:
    """(kind, partition_cols, merge_fn) for a state dir, or None when
    the dir cannot be classified safely (skip-with-note).

    ``layout`` is the dir's declared ``_layout.`` marker name — the
    authoritative path. A declared layout whose required columns are
    absent from the actual schema is treated as unrecognized (a marker
    pasted onto the wrong dir must not trigger the wrong merge). With
    no marker, full-signature schema fallback applies.

    Scheme-versioned embed-index markers (``rows-ebm-<bands>x<bits>``,
    written by ``embed_monitor.migrate_embed_layout`` — the rows-fm-1024
    precedent with an open-ended scheme instead of a fixed modulus)
    all compact identically to ``rows-ebm``: a verbatim rewrite
    keeping the ``ebm=`` dirs, whose values were assigned under the
    dir's own scheme."""
    if layout is not None and re.fullmatch(r"rows-ebm-\d+x\d+", layout):
        layout = "rows-ebm"
    spec = LAYOUTS.get(layout) if layout is not None else None
    if layout is not None and (spec is None or not spec.required <= set(columns)):
        return None
    if spec is None:
        spec = _fallback_layout(columns)
    if spec is None:
        return None
    merge_fn = spec.merge_builder(columns) if spec.merge_builder else None
    return spec.kind, spec.partition_cols, merge_fn


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


def _resolve_target(
    own_max: int | None,
    prev: int | None,
    upto_batch: int | None,
    committed: int | None,
    assume_all_committed: bool,
) -> tuple[int | None, str]:
    """(target watermark or None, note) for one dir. The committed-only
    rule (module docstring): never fold a batch the caller can't prove
    committed."""
    if own_max is None:
        return None, ""
    if upto_batch is not None:
        target, note = min(upto_batch, own_max), ""
    elif committed is not None:
        target, note = min(committed, own_max), "watermark from checkpoint commits log"
    elif assume_all_committed:
        target, note = own_max, ""
    else:
        target, note = own_max - 1, "newest on-disk batch held back as uncommitted"
    if target < 0 or (prev is not None and prev >= target):
        return None, ""
    return target, note


def plan_maintenance(
    spark: SparkSession,
    state_root: str,
    upto_batch: int | None = None,
    checkpoint_dir: str | None = None,
    assume_all_committed: bool = False,
) -> list[MaintenancePlan]:
    """The per-dir compaction plan ``run_maintenance`` will execute —
    the dry-run output. Watermark resolution per the module docstring:
    explicit ``upto_batch`` > checkpoint commits log > own max − 1
    (or own max with ``assume_all_committed``)."""
    committed = (
        checkpoint_committed_upto(spark, checkpoint_dir) if checkpoint_dir else None
    )
    plans: list[MaintenancePlan] = []
    for d in discover_state_dirs(spark, state_root):
        conflict = None
        try:
            # a dir caught mid-upgrade (two markers, or mixed inner
            # partition structures Spark refuses to union-read) must
            # become a skip-with-note, not crash the whole walk —
            # maintenance is the scheduled job that has to keep running
            # for every OTHER dir while the bad one awaits migration
            cols = read_state(spark, d).columns
            classified = classify_state_dir(cols, read_layout_marker(spark, d))
        except Exception as e:  # conflicting markers / partition schemes
            classified, conflict = None, str(e).splitlines()[0][:160]
        prev = compacted_upto(spark, d)
        dirs = [k for k, _ in batch_dirs(spark, d)]
        own_max = max(dirs) if dirs else prev
        target, note = _resolve_target(
            own_max, prev, upto_batch, committed, assume_all_committed
        )
        if classified is None:
            kind, pcols = "unrecognized", ()
            target = None
            note = conflict or (
                "no layout marker and no full-signature schema match; skipped"
            )
        else:
            kind, pcols, _ = classified
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
                note=note,
            )
        )
    return plans


def run_maintenance(
    spark: SparkSession,
    state_root: str,
    upto_batch: int | None = None,
    checkpoint_dir: str | None = None,
    assume_all_committed: bool = False,
    vacuum: bool = False,
    grace_batches: int = 0,
    dry_run: bool = False,
) -> list[MaintenancePlan]:
    """Execute (or with ``dry_run`` just return) the maintenance plan:
    compact every discovered state dir to its target watermark with
    its layout's declared merge operator, optionally vacuuming
    superseded dirs with a ``grace_batches`` margin. With ``vacuum``,
    EVERY dir carrying a manifest is vacuumed — including dirs whose
    watermark was already current this run (ADVICE r9: a crash between
    a previous compact and its vacuum leaves reclaimable dirs that a
    compact-gated vacuum would never touch). Idempotent: re-running at
    the same watermark is a per-dir no-op, and a crash mid-walk leaves
    already-flipped dirs compacted and the rest untouched (each dir's
    manifest flip is independently crash-safe)."""
    plans = plan_maintenance(
        spark, state_root, upto_batch, checkpoint_dir, assume_all_committed
    )
    if dry_run:
        return plans
    for p in plans:
        if p.kind != "unrecognized" and p.target_upto is not None:
            merge_fn = classify_state_dir(
                read_state(spark, p.path).columns, read_layout_marker(spark, p.path)
            )[2]
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
        if vacuum and compacted_upto(spark, p.path) is not None:
            vacuum_state(spark, p.path, grace_batches=grace_batches)
    return plans


__all__ = [
    "LAYOUTS",
    "LayoutSpec",
    "MaintenancePlan",
    "classify_state_dir",
    "discover_state_dirs",
    "plan_maintenance",
    "run_maintenance",
]
