"""Data-layout operators: multi-dimensional clustering for scan locality.

Z-order (Morton) interleaving maps N dimensions onto one integer whose
prefix buckets are small hyper-rectangles in dimension space. Writing a
table clustered by the z-value makes per-file min/max zone maps selective
on EVERY interleaved dimension at once — the standard lakehouse layout
trick for multi-column data skipping (a single-column sort gives skipping
on that column only).

Everything here is whole-stage-codegen bit arithmetic (shiftright / AND /
sum of shifted bits) — zero Python, zero shuffles for the key itself; the
only shuffle a caller pays is the clustering repartition/sort they were
already paying to lay data out.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_value(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton interleave of two non-negative ints (``bits`` bits each):
    bit *i* of ``a`` lands at position *2i*, bit *i* of ``b`` at *2i+1*.

    Pure integer expression — identical results in any engine with shift
    semantics (the SQL-oracle twin uses ``>> & <<`` directly).
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x + y, terms).cast("long")


def zorder_zone_map(
    df: DataFrame,
    a: Column,
    b: Column,
    bits: int = 6,
    prefix_shift: int = 6,
) -> DataFrame:
    """Zone-map statistics of a z-clustered layout: bucket rows by the
    z-value prefix (``z >> prefix_shift`` — the "file" a z-sorted writer
    would place them in) and report each bucket's row count and per-
    dimension min/max.

    At 100 TB this is the *planning* side of data skipping: the narrow
    per-bucket [min,max] envelopes on BOTH dimensions are exactly what a
    reader prunes files with. One partial-agg shuffle on the bucket id —
    the z-value itself is map-side bit math.
    """
    z = zorder_value(a, b, bits=bits)
    return (
        df.select(
            F.shiftright(z, prefix_shift).alias("zone"),
            a.alias("__a"),
            b.alias("__b"),
        )
        .groupBy("zone")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("__a").cast("int").alias("a_min"),
            F.max("__a").cast("int").alias("a_max"),
            F.min("__b").cast("int").alias("b_min"),
            F.max("__b").cast("int").alias("b_max"),
        )
        .orderBy("zone")
    )
