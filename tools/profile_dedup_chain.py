#!/usr/bin/env python
"""Phase-level profiler for the monitor-suite dedup_lsh chain (r16).

MONITORS.md shows the chain at 14.8 s/trigger at 500 rows vs 20.2 s at
20k rows — per-trigger FIXED work dominates, not row work. This script
drives ``dedup_micro_batch`` standalone over a history + one new batch
(the steady-state trigger shape) with wall-clock timestamps around each
internal phase, by running the same calls the body makes, in the same
order, against real on-disk state. Measurement-only tooling: never
imported by the engine or the bench.

Usage:
    python tools/profile_dedup_chain.py [--rows 8000] [--sf .localdata/sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8000)
    ap.add_argument("--sf", default=os.path.join(REPO, ".localdata", "sf1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sequential", action="store_true",
                    help="overlap_writes=False (the pre-r16 body)")
    args = ap.parse_args()

    import json
    import urllib.request

    from pyspark.sql import functions as F

    from cdc_publisher_spark.session import get_session
    from cdc_publisher_spark.streaming.incremental_dedup import dedup_micro_batch
    from cdc_publisher_spark.tables import load

    spark = get_session(
        app_name="profile_dedup_chain",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4056"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def jobs_timeline():
        """Per-job wall + inter-job driver gaps from the REST API."""
        ui = spark.sparkContext.uiWebUrl
        if not ui:
            return []
        with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10) as r:
            app_id = json.loads(r.read())[0]["id"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded", timeout=10
        ) as r:
            return json.loads(r.read())

    docs = load(spark, args.sf, "documents").select("doc_id", "text")
    n = docs.count()
    rows = min(args.rows, n // 2)
    hist = docs.orderBy("doc_id").limit(n - rows)
    batch = docs.orderBy(F.desc("doc_id")).limit(rows)

    wd = tempfile.mkdtemp(prefix="dedup_prof_")
    try:
        dirs = {k: os.path.join(wd, k) for k in ("corpus", "idx", "pairs", "bloom")}

        def run(df, bid, tag):
            t0 = time.perf_counter()
            dedup_micro_batch(
                df, bid, dirs["corpus"], dirs["idx"], dirs["pairs"],
                bloom_dir=dirs["bloom"],
                overlap_writes=not args.sequential,
            )
            w = time.perf_counter() - t0
            print(f"{tag}: {w:.2f}s", flush=True)
            return w

        run(hist, 0, f"trigger 0 (history build, {n - rows} rows)")
        # steady-state trigger: REPLAY the same batch id each rep — the
        # probe excludes batch=1's own dirs, so every rep runs the
        # byte-identical trigger against the same history (the stream's
        # own replay semantics, reused as a measurement harness)
        walls = []
        for r in range(args.reps):
            before = {j["jobId"] for j in jobs_timeline()}
            walls.append(run(batch, 1, f"trigger 1 replay {r+1} ({rows} rows)"))
            if r == args.reps - 1:
                from datetime import datetime

                def ts(s):
                    return datetime.strptime(
                        s[:23], "%Y-%m-%dT%H:%M:%S.%f"
                    ).timestamp()

                js = sorted(
                    (j for j in jobs_timeline() if j["jobId"] not in before),
                    key=lambda j: j["jobId"],
                )
                prev_end = None
                print("\njob timeline of the last replay (gaps = driver-side):")
                for j in js:
                    t0, t1 = ts(j["submissionTime"]), ts(j["completionTime"])
                    gap = f" gap_before={t0 - prev_end:5.2f}s" if prev_end else ""
                    print(
                        f"  job {j['jobId']:>4} {t1 - t0:5.2f}s "
                        f"stages={len(j['stageIds'])} tasks={j['numTasks']}"
                        f"{gap}  {j.get('name', '')[:70]}"
                    )
                    prev_end = t1
        walls.sort()
        print(f"steady-state median: {walls[len(walls)//2]:.2f}s over {args.reps}")
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
