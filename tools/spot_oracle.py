#!/usr/bin/env python
"""Spot-oracle pass over queries the driver has NEVER sampled
(r12 VERDICT ask #7 — one leg of the judge's evidence chain).

The driver's correctness sample (CORRECTNESS_r*.json) has not rotated
since round 10, so queries registered after that have no driver row;
the mitigation the judge audits is an independent Spark-vs-DuckDB pass
over names OUTSIDE every recorded sample. This script is that pass as
one command:

    python tools/spot_oracle.py --n 12 [--sf /root/testdata/sf0.01]

Selection is DETERMINISTIC but round-varying: candidates (all
registered queries with an oracle) are ordered by
md5("<salt>:<name>") with the salt defaulting to CURRENT round
(highest recorded round + 1) so it rotates every round, and names
already COVERED sort LAST so coverage ACCUMULATES across rounds
instead of resampling (r13 VERDICT ask #4). "Covered" means *has at
least one PASS event in the VERIFIED.md ledger at the sf this run
targets* (r14 VERDICT ask #1: a FAIL row is a record of a failed
check, never coverage — six r01/r02 ``no_oracle``-era FAIL rows had
permanently masked their names from rotation under the old
appears-in-any-CORRECTNESS predicate; and r14 ask #2: driver/ledger
rows are sf-tagged, so an sf0.1 run rotates over names unverified at
sf0.1 even when every name has an sf0.01 PASS). ``--names a,b,c``
overrides. Exit 0 = all selected queries hash-match the oracle.

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
    """Union of names appearing in any driver artifact, plus latest round.

    NOTE (r14 VERDICT ask #1): appearing in a CORRECTNESS file is NOT
    coverage — a FAIL row is evidence of a failed check. Selection in
    main() uses PASS events from the VERIFIED.md ledger instead; this
    helper survives for the latest-round computation and diagnostics.
    """
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
    """Names with at least one recorded verification event (any result)."""
    names: set[str] = set()
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                if line.startswith("| q_"):
                    names.add(line.split("|")[1].strip())
    return names


def _detail_sf(detail: str) -> str | None:
    """Normalize the sf tag out of a ledger detail cell.

    Driver rows read ``sf0.01 sample``; spot rows read
    ``salt=14 sf=/root/testdata/sf0.01`` (pre-r15) or
    ``salt=15 sf=sf0.1`` (r15+). All normalize to the basename tag
    (``sf0.01``).
    """
    for tok in detail.split():
        if tok.startswith("sf="):
            return os.path.basename(tok[len("sf="):].rstrip("/")) or None
        if tok.startswith("sf0") or tok.startswith("sf1"):
            return tok
    return None


def ledger_passed_names(path: str = LEDGER, sf: str | None = None) -> set[str]:
    """Names with at least one PASS event — optionally at a given sf tag.

    This is the coverage predicate (r14 VERDICT ask #1): a FAIL row
    never counts as coverage, and (ask #2) coverage is per-sf so an
    sf0.1 pass rotates independently of the sf0.01 evidence.
    """
    names: set[str] = set()
    if not os.path.exists(path):
        return names
    with open(path) as fh:
        for line in fh:
            if not line.startswith("| q_"):
                continue
            parts = [c.strip() for c in line.split("|")]
            # ['', name, round, source, detail, result, '']
            if len(parts) < 7 or parts[5] != "PASS":
                continue
            if sf is not None and _detail_sf(parts[4]) != sf:
                continue
            names.add(parts[1])
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
    _, latest = sampled_names()
    sf_tag = os.path.basename(args.sf.rstrip("/"))
    covered = ledger_passed_names(sf=sf_tag)
    salt = args.salt if args.salt is not None else str(latest + 1)
    if args.names:
        chosen = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        pool = sorted(n for n, s in specs.items() if s.oracle is not None)
        # accumulate: names with no PASS at this sf first, then the
        # rotating hash (FAIL rows never count as coverage)
        pool.sort(
            key=lambda n: (
                n in covered,
                hashlib.md5(f"{salt}:{n}".encode()).hexdigest(),
            )
        )
        chosen = pool[: args.n]
        fresh = sum(1 for n in chosen if n not in covered)
        print(
            f"{len(pool)} oracle queries (salt={salt}, "
            f"{len(covered)} with a PASS at {sf_tag}); checking "
            f"{len(chosen)} ({fresh} without a {sf_tag} PASS)"
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
            (name, rnd, args.source, f"salt={salt} sf={sf_tag}",
             "PASS" if res.match else "FAIL")
        )
    if not args.no_ledger and events:
        ledger_append(events)
        now = ledger_passed_names(sf=sf_tag)
        oracle_all = {n for n, s in specs.items() if s.oracle is not None}
        print(
            f"ledger: +{len(events)} events -> {len(now & oracle_all)}/"
            f"{len(oracle_all)} oracle queries with a PASS at {sf_tag}"
        )
    print(f"spot oracle: {len(chosen) - len(failures)}/{len(chosen)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
