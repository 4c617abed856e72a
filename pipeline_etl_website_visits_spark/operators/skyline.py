"""Skyline (Pareto frontier) — 2-D maximize/minimize dominance queries.

A row survives iff no other row is at least as good on both criteria and
strictly better on one ("largest part for the least money"). The naive
formulation is a quadratic self-theta-join (the oracle's NOT EXISTS); the
distributed shape is the classic two-phase skyline:

1. **Local pass** — each Arrow batch computes its own skyline with a
   vectorized sort + group-min + cummin sweep (O(n log n), no pairwise
   work). Dominance is transitive, so removing locally-dominated rows can
   never remove a global skyline point: the union of local skylines is a
   small provable superset of the answer.
2. **Global pass** — the survivors (skylines are tiny relative to their
   inputs) collapse to one partition and the same sweep runs once over
   the whole candidate set, which must fit a single batch — guarded, not
   assumed.

Nothing quadratic, nothing driver-side; the only shuffle is the survivor
collapse.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# The global pass concatenates the local-skyline union into one pandas
# frame on an executor. Skylines of real 2-D data are O(log n)-ish; this
# guard turns a pathological input (e.g. a perfectly anti-correlated
# unique frontier) into a loud error instead of an executor OOM.
MAX_GLOBAL_CANDIDATES = 5_000_000


def _sweep(pdf, x: str, y: str):
    """Vectorized 2-D skyline of one pandas frame: maximize x, minimize y.

    Kept iff y == min(y | x' >= x) and y < min(y | x' > x): no point with
    strictly larger x is as cheap, and no point with x at least as large
    is strictly cheaper.
    """
    if len(pdf) == 0:
        return pdf
    per_x = pdf.groupby(x)[y].min().sort_index(ascending=False)
    cm_incl = per_x.cummin()
    cm_strict = cm_incl.shift(1)
    incl = pdf[x].map(cm_incl)
    strict = pdf[x].map(cm_strict)
    keep = (pdf[y] == incl) & (strict.isna() | (pdf[y] < strict))
    return pdf[keep]


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Exact Pareto frontier maximizing ``x_col`` while minimizing
    ``y_col``. Ties (identical (x, y) points) are all returned — neither
    strictly dominates the other. Output keeps all input columns.
    """
    import pandas as pd

    schema = df.schema

    def local(batches):
        for pdf in batches:
            yield _sweep(pdf, x_col, y_col)

    def global_pass(batches):
        frames = list(batches)
        if not frames:  # empty input: no batches at all
            return
        pdf = pd.concat(frames, ignore_index=True)
        if len(pdf) > MAX_GLOBAL_CANDIDATES:
            raise RuntimeError(
                f"skyline candidate set {len(pdf)} exceeds MAX_GLOBAL_CANDIDATES "
                f"({MAX_GLOBAL_CANDIDATES}); the frontier itself is too large "
                "for a single-node global pass"
            )
        yield _sweep(pdf, x_col, y_col)

    local_winners = df.mapInPandas(local, schema)
    return local_winners.repartition(1).mapInPandas(global_pass, schema)
