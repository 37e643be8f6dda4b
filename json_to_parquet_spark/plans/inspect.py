"""Physical-plan inspection helpers.

The engine's performance contract ("filters reach the scan", "dims
broadcast", "no row-at-a-time Python") is asserted against these, both in
tests and interactively while tuning (`.explain("formatted")` companion).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (possibly adaptive, pre-execution) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of hash/range exchanges in the plan — the scale currency."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (hash|range)partitioning", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan node."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def has_python_eval(df: DataFrame) -> bool:
    """True if any row-at-a-time Python UDF stage exists (forbidden in
    registered queries; Arrow-batched mapInPandas stages don't count)."""
    return "BatchEvalPython" in executed_plan(df)
