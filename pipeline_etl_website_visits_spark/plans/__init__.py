"""Physical-plan introspection helpers.

`.explain()` is the feedback loop for scale work (SURVEY §4): these helpers
turn "I eyeballed the plan" into assertions that tests can lock in —
filters reaching the parquet scan, projections pruning columns, dim joins
broadcasting, codegen covering the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan reports a pushed filter containing fragment."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(part.split(":")[0].strip() for part in m.group(1).split(",") if part.strip())
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    import re

    plan = formatted_plan(df)
    ids = {m.group(1) for m in re.finditer(r"\[codegen id : (\d+)\]", plan)}
    ids |= {m.group(1) for m in re.finditer(r"WholeStageCodegen \((\d+)\)", plan)}
    return len(ids)
