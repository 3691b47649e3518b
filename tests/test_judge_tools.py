"""The judge-reproduction tooling itself (r12 VERDICT ask #7):
spot-oracle selection must be deterministic and never-driver-sampled;
registry_diff must report HEAD's registry without touching git state
when diffing a tree against itself."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spot_oracle_selection_is_deterministic_and_unsampled():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import spot_oracle

    sampled, latest = spot_oracle.sampled_names()
    assert latest >= 12
    from cdc_publisher_spark.registry import all_specs

    specs = all_specs()
    never = sorted(
        n for n, s in specs.items() if s.oracle is not None and n not in sampled
    )
    assert never, "selection pool empty — every query driver-sampled?"
    # the salted order is a pure function of (salt, name)
    import hashlib

    def pick(salt, k=12):
        return sorted(
            never, key=lambda n: hashlib.md5(f"{salt}:{n}".encode()).hexdigest()
        )[:k]

    assert pick(str(latest)) == pick(str(latest))
    assert pick("other") != pick(str(latest))
    # sampled names really are the union of the driver artifacts
    for p in os.listdir(REPO):
        if p.startswith("CORRECTNESS_r") and p.endswith(".json"):
            with open(os.path.join(REPO, p)) as fh:
                assert set(json.load(fh)) <= sampled


def test_registry_diff_self_is_additive_noop():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "registry_diff.py"), "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "added 0, removed 0, oracle-edited 0" in out.stdout
    assert "ADDITIVE: OK" in out.stdout
