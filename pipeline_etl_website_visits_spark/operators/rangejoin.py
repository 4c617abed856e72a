"""Range join and as-of join — temporal operators Spark lacks as built-ins
(SURVEY §2.10 gap map: "no range/as-of/interval joins in the reference",
and none native in Spark SQL either).

Both are implemented as compositions of equi-joins/windows so they scale:

- :func:`time_range_join_pairs` — "pairs of rows with the same key within
  Δt of each other". The naive form is a theta join (O(n·m) nested loop);
  here each row is assigned a time bucket of width Δt and the earlier row of
  every candidate pair is replicated into its own and the next bucket — an
  ordinary equi-join on (key, bucket) finds every qualifying pair exactly
  once, then an exact Δt filter removes bucket-edge false positives.
  Cost: 2× one side's rows, one hash shuffle — no cross product.
- :func:`asof_join` — "each left event matched to the latest right event at
  or before it". One shuffle: union-tag both streams, sort within key by
  (ts, side, id) with right before left at equal timestamps, carry the last
  right-event struct forward with a window frame ending at the previous row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def time_range_join_pairs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Unordered pairs (a_id < b_id) with equal key and |ts_a - ts_b| ≤ gap.

    Equivalent to the theta join
    ``a.key = b.key AND abs(a.ts - b.ts) <= gap AND a.id < b.id``
    but executed as a bucketed equi-join (see module docstring).
    """
    gap_us = max_gap_seconds * 1_000_000
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id"),
        # .cast("timestamp") is a no-op on TIMESTAMP and normalizes
        # TIMESTAMP_NTZ inputs (unix_micros rejects NTZ).
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    bucket = F.floor(F.col("us") / gap_us).cast("long")
    # earlier side: replicated into its own and the following bucket
    early = base.select(
        "k", F.col("id").alias("a_id"), F.col("us").alias("a_us"),
        F.explode(F.array(bucket, bucket + 1)).alias("b_bucket"),
    )
    late = base.select(
        "k", F.col("id").alias("b_id"), F.col("us").alias("b_us"), bucket.alias("b_bucket")
    )
    strictly_after = (F.col("a_us") < F.col("b_us")) | (
        (F.col("a_us") == F.col("b_us")) & (F.col("a_id") < F.col("b_id"))
    )
    pairs = (
        early.join(late, ["k", "b_bucket"])
        .filter(strictly_after & ((F.col("b_us") - F.col("a_us")) <= gap_us))
    )
    return pairs.select(
        F.least("a_id", "b_id").alias("a_id"),
        F.greatest("a_id", "b_id").alias("b_id"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Each left row joined to the latest right row AT OR BEFORE it. NULL
    when no such right row exists.

    Tie rule (deterministic, documented): the window sorts by
    ``(ts, side, id)`` with right rows ordered BEFORE left rows at equal
    timestamps, so a right event at exactly the left event's timestamp
    matches ("at or before"); among right rows tied on ts, the one with the
    greatest id wins. The two id domains are never compared to each other —
    ordering between the sides is decided purely by the side tag, so rows
    with identical (ts, id) on both sides still sort deterministically.

    Output: left id + matched right id/ts. One shuffle on the key; the
    window frame (unbounded preceding → previous row) carries the most
    recent right-side struct forward — no join explosion at any skew.
    """
    lt = left.select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("ts"), F.col(id_col).alias("id"), F.lit(1).alias("side")
    )
    rt = right.select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("ts"), F.col(id_col).alias("id"), F.lit(0).alias("side")
    )
    tagged = lt.unionByName(rt)
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "side", "id")  # 0 = right first: at-or-before
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_right = F.last(
        F.when(F.col("side") == 0, F.struct(F.col("ts").alias("r_ts"), F.col("id").alias("r_id"))),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.withColumn("__lr", last_right)
        .filter(F.col("side") == 1)
        .select(
            F.col("id").alias("left_id"),
            F.col("__lr.r_id").alias("right_id"),
            F.col("__lr.r_ts").alias("right_ts"),
        )
    )


def interval_overlap_pairs(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Unordered pairs (a_id < b_id) of same-key intervals that OVERLAP:
    ``a.start <= b.end AND b.start <= a.end``.

    The theta join is executed as a bucketed equi-join: each interval is
    replicated into every ``bucket_seconds``-wide bucket it touches
    (bounded: intervals longer than the bucket width replicate
    len/width + 1 times — pick the width near the median interval length),
    overlapping intervals necessarily share a bucket, and the exact overlap
    predicate filters bucket-edge false positives. ``distinct`` collapses
    pairs that share several buckets. One hash shuffle on (key, bucket),
    no cross product — the interval-join sibling of
    :func:`time_range_join_pairs` (gap pairs) and :func:`asof_join`.
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id"),
        F.unix_micros(F.col(start_col).cast("timestamp")).alias("s"),
        F.unix_micros(F.col(end_col).cast("timestamp")).alias("e"),
    )
    width = bucket_seconds * 1_000_000
    buckets = F.sequence(
        F.floor(F.col("s") / width).cast("long"), F.floor(F.col("e") / width).cast("long")
    )
    tagged = base.select("k", "id", "s", "e", F.explode(buckets).alias("b"))
    a = tagged.select("k", "b", F.col("id").alias("a_id"), F.col("s").alias("a_s"), F.col("e").alias("a_e"))
    bb = tagged.select("k", "b", F.col("id").alias("b_id"), F.col("s").alias("b_s"), F.col("e").alias("b_e"))
    return (
        a.join(bb, ["k", "b"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
        )
        .select("a_id", "b_id")
        .distinct()
    )
