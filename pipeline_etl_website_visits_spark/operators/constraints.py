"""Declarative data-quality constraint audit (Deequ/dbt-test shape).

A warehouse needs machine-checkable quality gates on its tables —
completeness, key uniqueness, accepted value sets, ranges (the reference
only has row-level validity regexes, F1/F2; table-level contracts are
north-star scope). The audit evaluates a whole constraint suite in ONE
pass over the table: every row-level predicate folds into the same
partial aggregate (SUM of violation flags — map-side combined), and key
uniqueness rides the same aggregate as ``COUNT(*) − COUNT(DISTINCT key)``.
The result is one row per constraint — a bounded gate summary, never a
row-level materialization (violating ROWS are a different query; the gate
needs counts).

At 100 TB the shape matters: N constraints cost one table scan total
(not N scans), the aggregate state is O(N) numbers, and the only shuffle
is the global-aggregate reduce (+ Spark's distinct expand when a
uniqueness constraint is present).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def not_null(col: str) -> tuple[str, str, Column]:
    """Completeness: ``col`` must never be NULL."""
    return (f"not_null({col})", "row", F.col(col).isNull())


def accepted_values(col: str, values: Sequence) -> tuple[str, str, Column]:
    """Domain: non-NULL ``col`` must be one of ``values``."""
    vals = ",".join(str(v) for v in values)
    return (
        f"accepted_values({col}:{vals})",
        "row",
        F.col(col).isNotNull() & ~F.col(col).isin(*values),
    )


def between(col: str, lo, hi) -> tuple[str, str, Column]:
    """Range: non-NULL ``col`` must satisfy lo <= col <= hi."""
    return (
        f"between({col}:{lo}..{hi})",
        "row",
        F.col(col).isNotNull() & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))),
    )


def matches(col: str, pattern: str) -> tuple[str, str, Column]:
    """Format: non-NULL ``col`` must match ``pattern`` (rlike)."""
    return (
        f"matches({col})",
        "row",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def unique(col: str) -> tuple[str, str, Column]:
    """Key uniqueness: violations = COUNT(*) − COUNT(DISTINCT col)
    (each extra copy of a key counts as one violation; NULLs are ignored
    by the distinct, matching SQL COUNT semantics)."""
    return (f"unique({col})", "unique", F.col(col))


def audit(df: DataFrame, constraints: Sequence[tuple[str, str, Column]]) -> DataFrame:
    """Evaluate the suite in one scan: (check_name, n_rows, n_violations,
    passed), ordered by check_name."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, (name, kind, expr) in enumerate(constraints):
        if kind == "row":
            # coalesce: SUM over an EMPTY table is NULL — an empty table
            # violates nothing, and `passed` must be a real boolean there
            aggs.append(
                F.coalesce(F.sum(F.when(expr, 1).otherwise(0)), F.lit(0))
                .cast("long")
                .alias(f"__v{i}")
            )
        elif kind == "unique":
            aggs.append(
                (F.count(expr) - F.countDistinct(expr)).cast("long").alias(f"__v{i}")
            )
        else:  # pragma: no cover - constraint constructors above are the API
            raise ValueError(f"unknown constraint kind {kind!r}")
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"__v{i}").alias("n_violations"),
            )
            for i, (name, _, _) in enumerate(constraints)
        ]
    )
    return (
        one.select(F.col("__n").alias("n_rows"), F.explode(rows).alias("c"))
        .select(
            F.col("c.check_name").alias("check_name"),
            F.col("n_rows"),
            F.col("c.n_violations").alias("n_violations"),
            (F.col("c.n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )
