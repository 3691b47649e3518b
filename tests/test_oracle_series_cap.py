"""The oracle-side generate_series position cap must exceed every
fixture's longest document — loudly (r10 ADVICE on q_k100).

Convention across the K-family oracles (q_k100 and ~35 siblings): DuckDB
builds per-token n-gram / block positions via ``CROSS JOIN
generate_series(1, 100000)`` + a ``<= len(ws)`` filter, because DuckDB
lacks Spark's ``transform`` over an unbounded token array. A document
longer than 100,000 whitespace tokens would make those oracles silently
undercount positions while the Spark side (array ``transform`` /
``sequence``) stays unbounded — a hash divergence with no obvious cause.

This test turns the silent cap into a loud one: for every fixture dir an
oracle can run against (the driver's read-only sfs plus any locally
generated decades under .localdata/), the longest document must sit well
under the cap, with 10x headroom so fixture growth trips THIS assertion
rounds before it could graze the oracle bound.
"""

from __future__ import annotations

import glob
import os

import duckdb

#: the literal bound used by every series-building oracle in queries/
SERIES_CAP = 100_000
#: fail while there is still an order of magnitude of headroom
HEADROOM = 10


def _fixture_dirs() -> list[str]:
    dirs = [d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d)]
    local = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
    )
    dirs += [d for d in glob.glob(os.path.join(local, "sf*")) if os.path.isdir(d)]
    return sorted(dirs)


def test_series_cap_exceeds_max_doc_tokens_everywhere():
    checked = 0
    for d in _fixture_dirs():
        doc = os.path.join(d, "documents.parquet")
        if not os.path.exists(doc):
            continue
        mx = duckdb.sql(
            f"SELECT COALESCE(MAX(len(string_split(text, ' '))), 0) "
            f"FROM '{doc}'"
        ).fetchone()[0]
        assert mx * HEADROOM <= SERIES_CAP, (
            f"{doc}: longest document is {mx} tokens — within {HEADROOM}x of "
            f"the oracle generate_series cap ({SERIES_CAP}). Raise the cap "
            f"in every series-building oracle (grep 'generate_series(' under "
            f"cdc_publisher_spark/queries/) before fixtures reach it, or the "
            f"DuckDB side will silently truncate n-gram positions."
        )
        checked += 1
    assert checked >= 3, f"expected >=3 documents fixtures, saw {checked}"
