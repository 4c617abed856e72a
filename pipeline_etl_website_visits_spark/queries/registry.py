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
# in dict order; with 177 registered queries we rotate so every query's
# latest driver row postdates its last code change (history in
# docs/COVERAGE.md).
#
# Round-7 pinning rule: HEAD = the eight queries whose implementation
# changed in round 7 (x123 eager cache-scoped materialization; x146 UDTF
# empty-text oracle parity; x140 packed pair keys + conditional
# repartition; x84/x82 via the pq_code_batch qerr take-along; x143 via
# the mad_outliers approx knob; x117/x122 via the stored-index writer
# lease + snapshot/delta compaction), then the stalest rows — 42 of the
# 43 round-3-latest names (each green twice, implementation unchanged
# since round 3, displaced across rounds 5-6 by never-checked heads):
# 8 + 42 = exactly 50. The alphabetical tail (x78) plus every
# round-4/5/6-latest row spills to round 8; all stay covered by the
# local full-suite check_oracle runs.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a) round-8 rotation head: the NEW query first (never driver-
    #    checked), then the one remaining round-3-latest
    #    name (x78 — the r7 alphabetical spill), then the queries whose
    #    implementation changed this round (pack_pairs guard; ledger
    #    seam + family pointer under the stored indexes; x82 encode) --
    "x147_sequence_packing",
    "x148_greedy_doc_packing",
    "x78_bpe_merges",
    "x140_market_basket_pairs",
    "x82_embed_pq_codes",
    "x117_stored_index_search",
    "x122_stored_gram_dedup",
    # -- (b) ALL 39 round-4-latest names: after this round no query's
    #    latest driver row predates round 5 (VERDICT r7 item 3) --
    "q02_regex_filter",
    "q03_null_or_pattern",
    "q04_bool_split",
    "q06_nullif_trim",
    "q07_casts",
    "q08_visits_agg",
    "q09_scalar_counts",
    "q11_anti_join",
    "q12_inner_join",
    "q13_semi_join",
    "q14_window_dedup",
    "q15_topk",
    "q16_union",
    "q17_count_distinct",
    "q18_rollup",
    "q19_extract_ym",
    "q20_text_ops",
    "x100_weighted_sample",
    "x101_semantic_decontam",
    "x103_cohort_retention",
    "x104_session_window_native",
    "x105_token_budget_mixture",
    "x56_dedup_containment",
    "x80_product_profit",
    "x81_market_share",
    "x83_ngram_novelty",
    "x85_incremental_dedup",
    "x86_dedup_pipeline",
    "x87_correlated_exists",
    "x88_lateral_topk",
    "x89_fuzzy_adjacent_names",
    "x90_bpe_token_counts",
    "x91_hll_union_rollup",
    "x93_zorder_zone_map",
    "x94_incremental_mv",
    "x95_skyline_pareto",
    "x96_semantic_dedup",
    "x97_cms_token_counts",
    "x99_custdist",
    # -- (c) oldest round-5-latest names fill the remaining slots
    #    (q10 also exercises the lease changes under merge) --
    "q00_flagship_visitantes",
    "q10_merge_upsert",
    "q40_left_outer_join",
    "q41_cross_join",
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
