"""Pure-function pins for bench.py's query selection (no Spark).

``SPARK_GRAFT_BENCH_ONLY`` powers targeted same-host A/Bs (the
round-8 sf1 spot check in SCALING.md): any registered query — not
just the headline set — can be benched by name, and a typo'd name
must fail loudly rather than silently benching nothing.
"""

from types import SimpleNamespace

import pytest

import bench


def _specs():
    return {
        "q_a": SimpleNamespace(bench=True),
        "q_b": SimpleNamespace(bench=False),
        "q_c": SimpleNamespace(bench=True),
    }


def test_default_is_headline_set():
    out = bench._select_specs(_specs(), None)
    assert sorted(out) == ["q_a", "q_c"]
    assert bench._select_specs(_specs(), "") == out


def test_only_selects_named_queries_from_all_specs():
    # q_b is NOT a headline query but is still selectable by name
    out = bench._select_specs(_specs(), "q_b, q_a")
    assert list(out) == ["q_b", "q_a"]


def test_only_rejects_unknown_names():
    with pytest.raises(SystemExit, match="q_typo"):
        bench._select_specs(_specs(), "q_a,q_typo")


# --- resolve_round_ref: --ab rN must survive tag loss (VERDICT r9 #3) ---
#
# Round tags vanished once already (driver snapshot cycle keeps commits,
# not tags); the fallback resolves rN to the driver's own immutable
# "round N: verdict/..." commit so `bench.py --ab r9` stays one command.

def test_resolve_round_ref_passthrough_non_round_refs():
    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert bench.resolve_round_ref(here, "HEAD") == "HEAD"
    assert bench.resolve_round_ref(here, "deadbeef") == "deadbeef"
    assert bench.resolve_round_ref(here, "release-r2") == "release-r2"


def test_resolve_round_ref_falls_back_to_verdict_commit():
    import os
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # r1 has a verdict commit but (by convention) no tag was ever cut
    tagged = subprocess.run(
        ["git", "-C", here, "rev-parse", "--verify", "--quiet", "r1^{commit}"],
        capture_output=True, text=True,
    ).returncode == 0
    got = bench.resolve_round_ref(here, "r1")
    if tagged:
        assert got == "r1"
    else:
        subject = subprocess.run(
            ["git", "-C", here, "log", "-1", "--format=%s", got],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        assert subject.startswith("round 1: verdict")


def test_resolve_round_ref_unknown_round_raises():
    import os
    import pytest as _pytest
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with _pytest.raises(SystemExit, match="r9999"):
        bench.resolve_round_ref(here, "r9999")


def test_resolve_round_ref_ignores_side_branch_commits(tmp_path):
    """r10 ADVICE: the fallback must scan first-parent history from
    HEAD, not ``--all`` — a stale experimental branch carrying a
    same-named 'round N: verdict' commit (newer, so first in a
    reverse-chronological --all scan) must NOT hijack the baseline."""
    import subprocess

    repo = str(tmp_path / "r")

    def git(*a):
        subprocess.run(
            ["git", *a], cwd=repo, check=True, capture_output=True,
            env={
                "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                "PATH": os.environ["PATH"],
                "GIT_CONFIG_GLOBAL": "/dev/null",
                "GIT_CONFIG_SYSTEM": "/dev/null",
            },
        )

    import os
    os.makedirs(repo)
    git("init", "-b", "main")
    (tmp_path / "r" / "f").write_text("1")
    git("add", "f")
    git("commit", "-m", "round 7: verdict/advice/correctness/bench")
    main_sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=repo, capture_output=True,
        text=True, check=True,
    ).stdout.strip()
    # a side branch with a NEWER same-named commit and a different tree
    git("checkout", "-b", "stale")
    (tmp_path / "r" / "f").write_text("2")
    git("commit", "-am", "round 7: verdict/advice/correctness/bench")
    git("checkout", "main")
    (tmp_path / "r" / "f").write_text("3")
    git("commit", "-am", "later work on main")

    assert bench.resolve_round_ref(repo, "r7") == main_sha
