#!/usr/bin/env python
"""Per-query runtime profiler (optimization round 15, guide §1).

Runs registered queries through the noop sink in a UI-enabled session
and scrapes the Spark REST API for what the committed pre-AQE plans
cannot show: the FINAL adaptive plan shape (ReusedExchange /
AQEShuffleRead nodes), per-stage executor time, shuffle bytes, and
task counts. Usage:

    python tools/profile_query.py q_k47_naive_bayes_langid [more...] \
        [--sf /root/testdata/sf0.1] [--runs 2] [--dump-dir /tmp/prof]

Prints one digest block per query; dumps raw REST JSON per query when
--dump-dir is given. Measurement-only tooling: never imported by the
engine, never run by the bench/driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--dump-dir", default=None)
    args = ap.parse_args()

    from cdc_publisher_spark.registry import all_specs, release_persisted
    from cdc_publisher_spark.session import get_session

    spark = get_session(
        app_name="profile_query",
        extra_confs={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4055",
            "spark.sql.ui.retainedExecutions": "200",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # read the ACTUAL bound UI address — if 4055 was taken Spark retries
    # onto 4056+ and a hardcoded URL would scrape a different app
    # (ADVICE r15)
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI not enabled — cannot profile")
    base = f"{ui}/api/v1"
    app_id = _get(f"{base}/applications")[0]["id"]

    specs = all_specs()
    unknown = [n for n in args.names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    for name in args.names:
        spec = specs[name]
        release_persisted()
        jobs_before = {j["jobId"] for j in _get(f"{base}/applications/{app_id}/jobs")}
        sqls_before = {s["id"] for s in _get(f"{base}/applications/{app_id}/sql?length=1000")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        for i in range(args.runs):
            release_persisted()
            df = spec.spark(spark, args.sf)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)

        jobs = [j for j in _get(f"{base}/applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before]
        stage_ids = sorted({sid for j in jobs for sid in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _get(f"{base}/applications/{app_id}/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        sqls = [s for s in _get(f"{base}/applications/{app_id}/sql?length=1000&details=true")
                if s["id"] not in sqls_before]

        n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        exec_ms = sum(s.get("executorRunTime", 0) for s in stages)
        sh_write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        inp = sum(s.get("inputBytes", 0) for s in stages)
        print(f"\n===== {name} =====")
        print(f"wall per run: {[round(t, 3) for t in times]}  (runs={args.runs})")
        print(f"jobs={len(jobs)} stages={len(stages)} tasks={n_tasks} "
              f"executorRunTime={exec_ms/1000.0:.2f}s "
              f"input={inp/1e6:.1f}MB shuffleWrite={sh_write/1e6:.2f}MB")
        top = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:8]
        for s in top:
            nm = s.get("description") or s.get("name", "")
            print(f"  stage {s['stageId']}: {s.get('executorRunTime',0)/1000.0:6.2f}s "
                  f"tasks={s.get('numCompleteTasks',0)} "
                  f"in={s.get('inputBytes',0)/1e6:8.2f}MB "
                  f"sw={s.get('shuffleWriteBytes',0)/1e6:6.2f}MB "
                  f"sr={s.get('shuffleReadBytes',0)/1e6:6.2f}MB  {nm[:80]}")
        # final-plan node census from the SQL tab (AQE-final)
        from collections import Counter
        census: Counter = Counter()
        for s in sqls:
            for nd in s.get("nodes", []):
                nm = nd["nodeName"].strip()
                census[nm] += 1
        interesting = {k: v for k, v in sorted(census.items()) if any(
            t in k for t in ("Exchange", "Reused", "AQEShuffleRead", "Python",
                             "Arrow", "Scan", "Generate", "Window", "Sort",
                             "Join", "Subquery", "InMemory"))}
        print(f"final-plan node census (over {len(sqls)} executions x {args.runs if sqls else 0} runs):")
        for k, v in interesting.items():
            print(f"  {v:4d}  {k}")
        if args.dump_dir:
            os.makedirs(args.dump_dir, exist_ok=True)
            with open(os.path.join(args.dump_dir, f"{name}.json"), "w") as fh:
                json.dump({"times": times, "jobs": jobs, "stages": stages,
                           "sql": sqls}, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
