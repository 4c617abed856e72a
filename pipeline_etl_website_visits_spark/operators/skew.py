"""Skew-mitigation operators: salting for hot keys (SURVEY §4.3).

AQE's skew-join handles most runtime skew; salting is the explicit lever
when a key's fan-in exceeds what one task can hold (e.g. a viral visitor
email with 10⁸ events, or a stop-shingle in the dedup join).

Both operators are deterministic: the salt derives from hashing a secondary
column (any column with per-row variety), not from ``rand()`` — results are
reproducible and retries are safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _salt(col: Column, buckets: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def salted_count(df: DataFrame, key: str, salt_col: str, buckets: int = 32) -> DataFrame:
    """Two-stage count per key: (key, salt) partial → key final.

    The first shuffle spreads a hot key over ``buckets`` partitions; the
    second aggregates ``buckets`` partial rows per key — O(keys·buckets)
    instead of one task swallowing the hot key. Identical result to
    ``df.groupBy(key).count()``.
    """
    partial = (
        df.withColumn("__salt", _salt(F.col(salt_col), buckets))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").cast("long").alias("count"))


def salted_join(
    large: DataFrame, small: DataFrame, key: str, salt_col: str, buckets: int = 8
) -> DataFrame:
    """Equi-join where the large side's hot keys are spread over ``buckets``.

    The large side gets a deterministic salt; the small side is replicated
    ``buckets``× (explode of a literal range) so every (key, salt) pair
    finds its match. Output equals ``large.join(small, key)``; cost trades a
    ``buckets``× blowup of the SMALL side for even distribution of the
    LARGE side — the right trade exactly when the small side is broadcast-
    scale but the key histogram is pathological.
    """
    salted_large = large.withColumn("__salt", _salt(F.col(salt_col), buckets))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )
    out = salted_large.join(replicated_small, [key, "__salt"], "inner").drop("__salt")
    return out
