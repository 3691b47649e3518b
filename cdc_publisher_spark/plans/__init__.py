"""Plan inspection (SURVEY.md §4.2 — verify Catalyst did its part).

Used by tests and bench to assert the physical properties that matter
at 100 TB: filters reached the parquet scan, small dims broadcast,
expressions stayed inside whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters fragments of the formatted plan."""
    return "\n".join(
        line.strip() for line in plan_string(df).splitlines() if "PushedFilters" in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple")


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_string(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the FINAL plan. Under AQE
    the final physical plan only exists after execution, so this runs
    the query through the noop sink first (cheap at test scale)."""
    import re

    df.collect()  # a write would execute a different QueryExecution
    plan = plan_string(df, "simple")
    # codegen spans render as "*(N)" stage markers in simple mode
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema fragments — check column pruning reached the scan."""
    return "\n".join(
        line.strip() for line in plan_string(df).splitlines() if "ReadSchema" in line
    )
