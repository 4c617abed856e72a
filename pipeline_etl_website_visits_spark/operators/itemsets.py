"""Frequent-itemset / co-occurrence mining primitives.

Market-basket analytics over the order fact: which items appear
together. The naive relational form is the basket self-join
(O(Σ per-basket lines²) rows SHUFFLED twice — the join builds the pair
relation by matching every line against every line of the same order).
The scale form used here exploits the bounded basket: collect each
basket's distinct items once (TPC-H baskets are ≤ 7 lines; real carts
are dozens — both trivially fit a row), then expand the C(n,2)
canonical pairs with array HOFs so pair generation is MAP-SIDE work on
the already-grouped row and only the (a, b) pair keys shuffle into the
final count. One basket shuffle + one pair-count shuffle, no self-join
of the fact against itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def co_occurrence_pairs(
    lines: DataFrame,
    *,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    top_k: int | None = None,
) -> DataFrame:
    """Canonical (a < b) item-pair co-occurrence counts across baskets.

    ``sort_array(collect_set(item))`` gives each basket's distinct
    items in a deterministic order; the nested ``transform`` +
    ``slice`` HOF expands exactly the a < b pairs (each pair counted
    once per basket regardless of line multiplicity). Output ordered
    by support desc then pair — a total order, so ``top_k`` is
    deterministic.
    """
    # repartition the narrow projection first: single-file test inputs scan
    # as ONE task, and the basket agg + pair explode below are the heavy
    # stages; the groupBy reuses this exchange (subset partitioning), so
    # the plan still has exactly two shuffles (baskets, pair counts)
    baskets = (
        lines.select(F.col(basket_col).alias("basket"), F.col(item_col).alias("item"))
        .repartition(F.col("basket"))
        .groupBy("basket")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
        .where(F.size("items") >= 2)
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (a, i) ->"
                " transform(slice(items, i + 2, size(items)), b -> struct(a AS a, b AS b))))"
            )
        ).alias("p")
    )
    counts = (
        pairs.select(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_baskets"))
        .orderBy(F.col("n_baskets").desc(), "item_a", "item_b")
    )
    if top_k is not None:
        counts = counts.limit(top_k)
    return counts
