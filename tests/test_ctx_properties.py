"""Hypothesis pins for the k99/ctx-monitor integer algebra — pure
Python reimplementation checked against itself plus the additivity
property the streaming monitor's sum-merge state depends on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_publisher_spark.streaming.ctx_monitor import CTX_BUDGETS


def _economics(ns, b):
    """Per-budget closed forms, straight from the q_k99 definition."""
    chunks = [(n + b - 1) // b for n in ns]
    return {
        "n_docs": len(ns),
        "total_tokens": sum(ns),
        "n_trunc_docs": sum(1 for n in ns if n > b),
        "trunc_lost_tokens": sum(n - b for n in ns if n > b),
        "n_chunks": sum(chunks),
        "pad_tokens": sum(c * b - n for c, n in zip(chunks, ns)),
    }


@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=1))
@settings(max_examples=200, deadline=None)
def test_identities_hold_per_budget(ns):
    for b in CTX_BUDGETS:
        e = _economics(ns, b)
        # chunk-and-pad conservation: chunks*B == tokens + padding
        assert e["n_chunks"] * b == e["total_tokens"] + e["pad_tokens"]
        # truncation loses exactly the over-budget tails
        assert e["trunc_lost_tokens"] == sum(max(n - b, 0) for n in ns)
        # padding is bounded by one partial chunk per doc
        assert 0 <= e["pad_tokens"] < len(ns) * b
        # a doc never truncates at a budget it fits in
        assert e["n_trunc_docs"] == sum(1 for n in ns if n > b)


@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=100, deadline=None)
def test_partial_sums_merge_losslessly(ns, k):
    """The streaming monitor's whole correctness argument: economics of
    a union == column-wise sum of per-slice economics, for ANY
    slicing — so per-trigger partial sums merged by sum() equal the
    batch q_k99 regardless of how the stream chopped the corpus."""
    slices = [ns[i::k] for i in range(k)]
    for b in CTX_BUDGETS:
        whole = _economics(ns, b)
        parts = [_economics(s, b) for s in slices if s]
        merged = {
            key: sum(p[key] for p in parts) for key in whole
        }
        assert merged == whole
