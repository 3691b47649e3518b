#!/usr/bin/env python
"""Import-diff the query registry between a git ref and the working
tree (r12 VERDICT ask #7 — one leg of the judge's evidence chain).

The registry's cross-round contract is STRICTLY ADDITIVE: names,
semantics and oracle text never change or disappear, so the driver's
non-rotating correctness sample keeps accumulating against stable
targets. The judge verifies this by importing ``registry.all_specs()``
in both trees and diffing; this script is that check as one command:

    python tools/registry_diff.py r12

Checks out the ref into a temporary ``git worktree`` (read-only use),
imports each tree's registry in its OWN subprocess (two versions of
the package cannot coexist in one interpreter), and reports additions,
removals, and oracle-text edits. Exit 0 = additive (additions only,
plus oracle edits listed in ADJUDICATED_ORACLE_EDITS below — each a
judge-ADVICE-mandated fix, named visibly here per the allowlist
convention so the exemption survives code review); exit 1 = any
removal or unadjudicated oracle edit.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Oracle-text edits mandated by a judge ADVICE item — the one
#: sanctioned exception to strict additivity. Each entry names the
#: query, the reason, AND the md5 of the exact post-edit oracle text
#: (r14 ADVICE: a name-only allowlist would permanently exempt the
#: query's oracle, letting any future unrelated edit pass as
#: adjudicated — pinning the hash makes a mismatch an unadjudicated
#: edit again). An edit NOT listed here, or whose HEAD oracle text
#: does not hash to the pinned value, fails the check. Semantics on
#: any non-degenerate corpus are unchanged (verified: hash-exact at
#: sf0.001/0.01/0.1 before and after each guard; each edit only pins
#: a 0/0 / x/0 ratio to NULL in both engines).
ADJUDICATED_ORACLE_EDITS: dict[str, dict[str, str]] = {
    "q_k120_intrinsic_dimension": {
        "oracle_md5": "f2cd0451aca36e83a851b8ebc802ceaa",
        "reason": "r13 ADVICE (low): guard SUM(ok)=0 / SUM(lt)=0 — "
        "Spark's 0/0 is NULL, DuckDB's IEEE division is NaN/inf, so a "
        "fully-degenerate label made the engines disagree; both now "
        "pin id_estimate to NULL (r14, both-engine pytest pins in "
        "tests/test_r14_fixes.py)",
    },
    "q_k122_quantization_fidelity": {
        "oracle_md5": "3d4fec71a07df6ef6d968c5a4a95ba89",
        "reason": "r14 ADVICE (low): same 0/0 class as q_k120 — a "
        "fully-degenerate label has COUNT(cos8)=0, DuckDB's IEEE 0/0 "
        "is NaN while Spark's NULL-sum/0 is NULL; both engines now "
        "pin frac_degraded to NULL via CASE WHEN COUNT(cos8)>0 / "
        "F.when(F.count('cos8')>0, ...) (r15, both-engine pytest "
        "pins in tests/test_r15_fixes.py)",
    },
}

DUMP = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from cdc_publisher_spark.registry import all_specs
print(json.dumps({
    n: {"family": s.family, "oracle": s.oracle}
    for n, s in all_specs().items()
}))
"""


def registry_of(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", DUMP, tree],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "r12"
    head = registry_of(REPO)
    with tempfile.TemporaryDirectory(prefix="registry_diff_") as td:
        wt = os.path.join(td, "prev")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ref],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            prev = registry_of(wt)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, check=False, capture_output=True,
            )
    added = sorted(set(head) - set(prev))
    removed = sorted(set(prev) - set(head))
    edited_all = sorted(
        n for n in set(head) & set(prev)
        if head[n]["oracle"] != prev[n]["oracle"]
    )
    def is_adjudicated(n: str) -> bool:
        entry = ADJUDICATED_ORACLE_EDITS.get(n)
        if entry is None:
            return False
        import hashlib

        head_md5 = hashlib.md5((head[n]["oracle"] or "").encode()).hexdigest()
        return head_md5 == entry["oracle_md5"]

    edited = [n for n in edited_all if not is_adjudicated(n)]
    adjudicated = [n for n in edited_all if is_adjudicated(n)]
    print(
        f"registry {ref}: {len(prev)} -> HEAD: {len(head)} | "
        f"added {len(added)}, removed {len(removed)}, "
        f"oracle-edited {len(edited)} (+{len(adjudicated)} adjudicated)"
    )
    for label, names in (("+", added), ("-", removed), ("~", edited)):
        for n in names:
            print(f"  {label} {n}")
    for n in adjudicated:
        print(f"  ~ {n} [ADJUDICATED: {ADJUDICATED_ORACLE_EDITS[n]['reason']}]")
    ok = not removed and not edited
    print("ADDITIVE: OK" if ok else "ADDITIVE: VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
