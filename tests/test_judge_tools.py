"""The judge-reproduction tooling itself (r12 VERDICT ask #7):
spot-oracle selection must be deterministic, its coverage predicate
must count only PASS events (r14 VERDICT ask #1) and be sf-aware
(r14 ask #2); registry_diff must report HEAD's registry without
touching git state when diffing a tree against itself."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_spot_oracle_selection_is_deterministic_and_accumulating():
    import spot_oracle

    _, latest = spot_oracle.sampled_names()
    assert latest >= 12
    from cdc_publisher_spark.registry import all_specs

    specs = all_specs()
    pool = sorted(n for n, s in specs.items() if s.oracle is not None)
    assert pool, "selection pool empty — no oracle queries?"
    covered = spot_oracle.ledger_passed_names(sf="sf0.01")

    # the salted order is a pure function of (salt, name, coverage)
    def pick(salt, k=12):
        return sorted(
            pool,
            key=lambda n: (
                n in covered,
                hashlib.md5(f"{salt}:{n}".encode()).hexdigest(),
            ),
        )[:k]

    assert pick(str(latest)) == pick(str(latest))
    # names without a PASS at this sf always sort before covered ones
    uncovered = [n for n in pool if n not in covered]
    if uncovered:
        first = pick(str(latest), k=len(uncovered))
        assert set(first) == set(uncovered)


def test_ledger_coverage_predicate_ignores_fail_rows(tmp_path):
    """r14 VERDICT ask #1: a FAIL row is a record of a failed check,
    never coverage — six r01/r02 no_oracle-era FAIL rows had
    permanently masked their names from the rotation."""
    import spot_oracle

    ledger = tmp_path / "VERIFIED.md"
    ledger.write_text(
        spot_oracle.LEDGER_HEADER
        + "| q_fail_only | r01 | driver | sf0.01 sample | FAIL |\n"
        + "| q_fixed | r01 | driver | sf0.01 sample | FAIL |\n"
        + "| q_fixed | r15 | builder-spot | salt=15 sf=sf0.01 | PASS |\n"
        + "| q_pass | r02 | driver | sf0.01 sample | PASS |\n"
    )
    passed = spot_oracle.ledger_passed_names(str(ledger))
    assert passed == {"q_fixed", "q_pass"}
    assert "q_fail_only" not in passed
    # any-event coverage (diagnostic only) still sees all three
    assert spot_oracle.ledger_names(str(ledger)) == {
        "q_fail_only", "q_fixed", "q_pass",
    }


def test_ledger_coverage_predicate_is_sf_aware(tmp_path):
    """r14 VERDICT ask #2: an sf0.01 PASS does not cover sf0.1 — the
    sf0.1 rotation must see such names as uncovered."""
    import spot_oracle

    ledger = tmp_path / "VERIFIED.md"
    ledger.write_text(
        spot_oracle.LEDGER_HEADER
        + "| q_small_only | r02 | driver | sf0.01 sample | PASS |\n"
        + "| q_old_style | r14 | builder-spot | salt=14 sf=/root/testdata/sf0.01 | PASS |\n"
        + "| q_both | r15 | builder-spot | salt=15 sf=sf0.01 | PASS |\n"
        + "| q_both | r15 | builder-spot | salt=15 sf=sf0.1 | PASS |\n"
    )
    assert spot_oracle.ledger_passed_names(str(ledger), sf="sf0.01") == {
        "q_small_only", "q_old_style", "q_both",
    }
    assert spot_oracle.ledger_passed_names(str(ledger), sf="sf0.1") == {"q_both"}
    # sf=None means "a PASS at any sf"
    assert spot_oracle.ledger_passed_names(str(ledger)) == {
        "q_small_only", "q_old_style", "q_both",
    }


def test_detail_sf_normalization():
    import spot_oracle

    assert spot_oracle._detail_sf("sf0.01 sample") == "sf0.01"
    assert spot_oracle._detail_sf("salt=14 sf=/root/testdata/sf0.01") == "sf0.01"
    assert spot_oracle._detail_sf("salt=15 sf=sf0.1") == "sf0.1"
    assert spot_oracle._detail_sf("salt=15 sf=/data/sf1/") == "sf1"
    assert spot_oracle._detail_sf("no scale here") is None


def test_committed_ledger_has_full_sf001_pass_coverage():
    """Every registered oracle query has at least one PASS event at
    sf0.01 in the committed VERIFIED.md (the r14 'complete coverage'
    claim, now under the PASS-only predicate)."""
    import spot_oracle
    from cdc_publisher_spark.registry import all_specs

    oracle_all = {n for n, s in all_specs().items() if s.oracle is not None}
    passed = spot_oracle.ledger_passed_names(sf="sf0.01")
    missing = sorted(oracle_all - passed)
    assert not missing, f"no sf0.01 PASS event for: {missing}"


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
