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
defaulting to the highest recorded round number — reproducible within
a round, different names each round. ``--names a,b,c`` overrides.
Exit 0 = all selected queries hash-match the oracle.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None,
                    help="comma-separated override of the selection")
    ap.add_argument("--salt", default=None,
                    help="selection salt (default: latest recorded round)")
    args = ap.parse_args()

    from cdc_publisher_spark.oracle import run_compare
    from cdc_publisher_spark.registry import all_specs
    from cdc_publisher_spark.session import get_session

    specs = all_specs()
    sampled, latest = sampled_names()
    if args.names:
        chosen = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        never = sorted(
            n for n, s in specs.items()
            if s.oracle is not None and n not in sampled
        )
        salt = args.salt if args.salt is not None else str(latest)
        never.sort(
            key=lambda n: hashlib.md5(f"{salt}:{n}".encode()).hexdigest()
        )
        chosen = never[: args.n]
        print(
            f"{len(never)} never-driver-sampled oracle queries "
            f"(salt={salt}); checking {len(chosen)}"
        )

    spark = get_session(app_name="cdc_publisher_spark_spot_oracle")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name in chosen:
        res = run_compare(spark, args.sf, name)
        status = "PASS" if res.match else f"FAIL ({res.detail})"
        print(f"  {name}: {status} "
              f"(spark={res.spark_rows}, oracle={res.oracle_rows})")
        if not res.match:
            failures.append(name)
    print(f"spot oracle: {len(chosen) - len(failures)}/{len(chosen)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
