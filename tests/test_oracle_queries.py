"""t2-style gate: every registered query with an oracle hash-matches
DuckDB on the same parquet (SURVEY.md §5.2.2). Runs at sf0.01 by default
(the driver's correctness scale)."""

from __future__ import annotations

import pytest

from cdc_publisher_spark.oracle import run_compare
from cdc_publisher_spark.registry import all_specs


def _names() -> list[str]:
    return sorted(all_specs())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_oracle, name):
    res = run_compare(spark, sf_oracle, name)
    assert res.match, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"
    assert res.spark_rows >= 0
