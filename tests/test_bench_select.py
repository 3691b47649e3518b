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
