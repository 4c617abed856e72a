"""Query registry — the contract consumed by ``__spark_entry__.py``.

Each entry pairs a Spark DataFrame implementation (the engine under test)
with an equivalent ANSI-SQL oracle string runnable by DuckDB on the same
parquet tables. The driver hash-compares the two at sf=0.01.

Dialect rules baked into every query (SURVEY.md §2.12 "dialect traps"):
- every output column explicitly aliased, identically on both sides;
- doubles produced by arithmetic are aggregated in DECIMAL(18,2) where money
  determinism matters, then ``ROUND(CAST(x AS DOUBLE), 2)``;
- ``CAST(FLOOR(x) AS INT)`` instead of ``CAST(x AS INT)`` (DuckDB rounds,
  Spark truncates);
- counts/sums cast to BIGINT (DuckDB SUM(int) yields HUGEINT);
- LIMIT always preceded by ORDER BY over a unique key (the driver's compare
  is order-insensitive but the *set* must be deterministic);
- timestamps only ever surfaced as DATE casts or formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    certifies: str = ""  # SURVEY §2 operator row(s) this query certifies
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, certifies: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, certifies=certifies, tags=tuple(tags))
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# in dict order; with 211 registered queries we rotate so every query's
# latest driver row postdates its last code change (history in
# docs/COVERAGE.md).
#
# Round-13 pinning rule (VERDICT r12 item 1 — close the rotation tail):
# HEAD = (a) the TWO new queries (x181 MinHash estimator-error audit,
# x182 Matryoshka truncation recall — never driver-checked); then
# (b) the SIXTEEN queries whose executed code changed this round — the
# token family now served through the stored tokenized-corpus /
# vocabulary-count artifacts (x38/x55/x58/x59/x83/x92/x97/x130/x139/
# x155/x156), the shingles split-count-gated spread consumers
# (x23/x24/x69/x85), and x179 (precollected-query sharing); then (c) the
# TWENTY-THREE remaining round-8-latest names (the full r13 tail the r12
# verdict enumerated, minus x83/x85/x97 which sit in (b)); then (d) NINE
# round-9-latest names alphabetically (q10, q42-q49). 2+16+23+9 = 50.
# After this round no name's latest driver row predates round 9; the
# remaining round-9-latest names rotate next.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a) new this round --
    "x181_minhash_error_audit",
    "x182_matryoshka_recall",
    # -- (b) code changed this round --
    "x38_top_bigrams",
    "x55_doc_frequency",
    "x58_tfidf_top_terms",
    "x59_bigram_rarity",
    "x83_ngram_novelty",
    "x92_heavy_hitters",
    "x97_cms_token_counts",
    "x130_zipf_slope",
    "x139_token_entropy",
    "x155_gram_diversity",
    "x156_boilerplate_prefixes",
    "x23_dedup_minhash_lsh",
    "x24_dedup_simhash",
    "x69_adjacent_doc_jaccard",
    "x85_incremental_dedup",
    "x179_ann_recall_eval",
    # -- (c) the remaining round-8-latest names (the r13 tail) --
    "q20_text_ops",
    "q40_left_outer_join",
    "q41_cross_join",
    "x78_bpe_merges",
    "x80_product_profit",
    "x81_market_share",
    "x82_embed_pq_codes",
    "x87_correlated_exists",
    "x88_lateral_topk",
    "x89_fuzzy_adjacent_names",
    "x90_bpe_token_counts",
    "x91_hll_union_rollup",
    "x93_zorder_zone_map",
    "x94_incremental_mv",
    "x95_skyline_pareto",
    "x99_custdist",
    "x100_weighted_sample",
    "x101_semantic_decontam",
    "x103_cohort_retention",
    "x104_session_window_native",
    "x105_token_budget_mixture",
    "x140_market_basket_pairs",
    "x147_sequence_packing",
    # -- (d) round-9-latest fill, alphabetical --
    "q10_merge_upsert",
    "q42_except",
    "q43_intersect",
    "q44_union_distinct",
    "q45_cube",
    "q46_window_rank_lag",
    "q47_window_frame_running_sum",
    "q48_having",
    "q49_conditional_agg",
)


def _ordered_names() -> list[str]:
    prioritized = [n for n in DRIVER_ORDER if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in DRIVER_ORDER]
    return prioritized + rest


def spark_queries() -> dict[str, SparkQuery]:
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
