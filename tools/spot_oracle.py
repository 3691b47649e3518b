#!/usr/bin/env python
"""Spot-oracle pass over queries the driver has NEVER sampled
(r12 VERDICT ask #7 — one leg of the judge's evidence chain).

The driver's correctness sample (CORRECTNESS_r*.json) has not rotated
since round 10, so queries registered after that have no driver row;
the mitigation the judge audits is an independent Spark-vs-DuckDB pass
over names OUTSIDE every recorded sample. This script is that pass as
one command:

    python tools/spot_oracle.py --n 12 [--sf /root/testdata/sf0.01]

Selection is DETERMINISTIC but round-varying: candidates (registered
queries with an oracle that appear in no CORRECTNESS_r*.json at the
repo root) are ordered by md5("<salt>:<name>") with the salt
defaulting to CURRENT round (highest recorded round + 1) so it
rotates every round, and names already covered by the VERIFIED.md
ledger sort LAST — coverage of the never-driver-sampled names
ACCUMULATES across rounds instead of resampling (r13 VERDICT ask #4).
``--names a,b,c`` overrides. Exit 0 = all selected queries hash-match
the oracle.

Every run appends its results to the committed ``VERIFIED.md`` ledger
(one row per name: round, source, salt, result — ``--no-ledger`` for
a read-only pass, ``--source judge-spot`` to label an independent
reproduction). ``--seed-ledger`` backfills the ledger from every
CORRECTNESS_r*.json at the repo root (source=driver).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sampled_names() -> tuple[set[str], int]:
    names: set[str] = set()
    latest = 0
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            with open(p) as fh:
                names |= set(json.load(fh))
            num = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
            latest = max(latest, num)
        except Exception:
            continue
    return names, latest


LEDGER = os.path.join(REPO, "VERIFIED.md")

LEDGER_HEADER = """# VERIFIED — cumulative per-query verification ledger

One row per verification EVENT (r13 VERDICT ask #4): which query was
checked against the DuckDB oracle, in which round, by which source
(`driver` = the driver's CORRECTNESS_r*.json sample; `builder-spot` /
`judge-spot` = independent fresh-process passes via
`tools/spot_oracle.py`, whose per-round salt rotation prefers names
the ledger does not cover yet, so coverage of the never-driver-sampled
names accumulates instead of resampling). Append-only — rows are
evidence, never edited. The full-suite oracle sweep
(tests/test_oracle_queries.py) additionally checks ALL registered
queries every run; this ledger tracks the independent
fresh-process/driver legs only.

| query | round | source | detail | result |
|---|---|---|---|---|
"""


def ledger_names(path: str = LEDGER) -> set[str]:
    """Names with at least one recorded verification event."""
    names: set[str] = set()
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                if line.startswith("| q_"):
                    names.add(line.split("|")[1].strip())
    return names


def ledger_append(rows: list[tuple[str, str, str, str, str]], path: str = LEDGER) -> None:
    if not os.path.exists(path):
        with open(path, "w") as fh:
            fh.write(LEDGER_HEADER)
    with open(path, "a") as fh:
        for name, rnd, source, detail, result in rows:
            fh.write(f"| {name} | {rnd} | {source} | {detail} | {result} |\n")


def seed_ledger(path: str = LEDGER) -> int:
    """Backfill from every CORRECTNESS_r*.json (driver rows)."""
    rows = []
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(p)[len("CORRECTNESS_"):-len(".json")]
        try:
            with open(p) as fh:
                data = json.load(fh)
        except Exception:
            continue
        for name, rec in sorted(data.items()):
            ok = bool(rec.get("hash_match")) if isinstance(rec, dict) else False
            rows.append(
                (name, rnd, "driver", "sf0.01 sample", "PASS" if ok else "FAIL")
            )
    ledger_append(rows, path)
    return len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None,
                    help="comma-separated override of the selection")
    ap.add_argument("--salt", default=None,
                    help="selection salt (default: current round = "
                         "latest recorded round + 1)")
    ap.add_argument("--no-ledger", action="store_true",
                    help="read-only pass: do not append to VERIFIED.md")
    ap.add_argument("--source", default="builder-spot",
                    help="ledger source label (e.g. judge-spot)")
    ap.add_argument("--seed-ledger", action="store_true",
                    help="backfill VERIFIED.md from CORRECTNESS_r*.json "
                         "and exit")
    args = ap.parse_args()

    if args.seed_ledger:
        n = seed_ledger()
        print(f"seeded {n} driver rows into {LEDGER}")
        return 0

    from cdc_publisher_spark.oracle import run_compare
    from cdc_publisher_spark.registry import all_specs
    from cdc_publisher_spark.session import get_session

    specs = all_specs()
    sampled, latest = sampled_names()
    covered = ledger_names()
    salt = args.salt if args.salt is not None else str(latest + 1)
    if args.names:
        chosen = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        never = sorted(
            n for n, s in specs.items()
            if s.oracle is not None and n not in sampled
        )
        # accumulate: unledgered names first, then the rotating hash
        never.sort(
            key=lambda n: (
                n in covered,
                hashlib.md5(f"{salt}:{n}".encode()).hexdigest(),
            )
        )
        chosen = never[: args.n]
        fresh = sum(1 for n in chosen if n not in covered)
        print(
            f"{len(never)} never-driver-sampled oracle queries "
            f"(salt={salt}, {len(covered)} ledgered); checking "
            f"{len(chosen)} ({fresh} new to the ledger)"
        )

    spark = get_session(app_name="cdc_publisher_spark_spot_oracle")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    events = []
    rnd = f"r{latest + 1}"
    for name in chosen:
        res = run_compare(spark, args.sf, name)
        status = "PASS" if res.match else f"FAIL ({res.detail})"
        print(f"  {name}: {status} "
              f"(spark={res.spark_rows}, oracle={res.oracle_rows})")
        if not res.match:
            failures.append(name)
        events.append(
            (name, rnd, args.source, f"salt={salt} sf={args.sf}",
             "PASS" if res.match else "FAIL")
        )
    if not args.no_ledger and events:
        ledger_append(events)
        now = ledger_names()
        never_all = {
            n for n, s in specs.items()
            if s.oracle is not None and n not in sampled
        }
        print(
            f"ledger: +{len(events)} events -> {len(now)} distinct names "
            f"covered ({len(now & never_all)}/{len(never_all)} of the "
            "never-driver-sampled set)"
        )
    print(f"spot oracle: {len(chosen) - len(failures)}/{len(chosen)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
