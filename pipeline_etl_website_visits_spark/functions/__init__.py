"""Scalar expression helpers shared across operators.

Everything here compiles to built-in Catalyst expressions (no UDFs) and is
designed for cross-engine determinism against a SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def ratio_round(num: Column, den: Column, decimals: int) -> Column:
    """Half-up-rounded num/den via exact integer arithmetic (num, den ≥ 0).

    ``(num*2*10^d + den) div (2*den) / 10^d`` — engine-agnostic: no
    round-of-double anywhere, so Spark and any SQL oracle agree bit-for-bit.
    (Floating ``round()`` of a quotient is NOT portable: Spark rounds the
    shortest decimal repr half-up, DuckDB rounds the binary value.)

    The quotient uses Spark's IntegralDivide (the SQL ``div`` operator),
    NOT ``floor(a / b)``: ``/`` on longs is double division, which silently
    rounds once ``num*2*10^d`` exceeds 2^53 — at real corpus scale (e.g.
    shingle-intersection counts) that diverges from an integer ``//`` oracle.
    """
    scale = 10**decimals
    den_safe = F.greatest(den.cast("long"), F.lit(1))
    q = F.call_function("div", num.cast("long") * (2 * scale) + den_safe, den_safe * 2)
    return (q / F.lit(float(scale))).cast("double")
