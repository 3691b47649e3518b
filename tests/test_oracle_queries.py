"""t2-style gate: every registered query with an oracle hash-matches
DuckDB on the same parquet (SURVEY.md §5.2.2).

Two sweeps since r16 (VERDICT r15 ask #1 — the driver's default pytest
run must finish inside its time budget):

- the DEFAULT sweep runs every registered query at sf0.001 — full
  per-query coverage, small data, fits the fast run;
- the sf0.01 sweep (the driver's correctness scale) is marked ``slow``
  and runs under ``SPARK_GRAFT_FULL_TESTS=1`` — the builder executes it
  at least once per round (ROUNDNOTES.md records each run).
"""

from __future__ import annotations

import pytest

from cdc_publisher_spark.oracle import run_compare
from cdc_publisher_spark.registry import all_specs


def _names() -> list[str]:
    return sorted(all_specs())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_smoke(spark, sf_smoke, name):
    res = run_compare(spark, sf_smoke, name)
    assert res.match, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"
    assert res.spark_rows >= 0


@pytest.mark.slow
@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_oracle, name):
    res = run_compare(spark, sf_oracle, name)
    assert res.match, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"
    assert res.spark_rows >= 0
