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
# in dict order.  With 110 registered queries a single round can never cover
# them all, so we rotate (rotation history in docs/COVERAGE.md; union of
# rounds 1+2+3 = all 110 queries — zero never-checked names).
#
# Round-4 pinning rule (VERDICT r3 item 4): every query whose latest driver
# row predates its last code/testdata change goes at the HEAD —
#   (a0) queries NEW in round 4 (x80–x91) — never driver-checked;
#   (a) queries whose implementation changed THIS round (x56 containment
#       prefilter, x79 recursive-CTE pre-filtered view, q00/q10 via the
#       bucketed incremental merge path), making their r3 rows stale;
#   (b) the 32 queries whose latest driver row is ROUND 1 (stalest — they
#       predate the round-3 timestamp-normalization loader rework, fd214e6);
#   (b) fills the remaining slots with round-1-latest rows (stalest);
#       the rest of (b) and all round-2-latest rows spill to round 5.
# ONLY the first 50 names below are checked this round; the tail past slot
# 50 is deliberate next-round spillover (stalest-first head for round 5) —
# it is NOT checked in round 4.  See docs/COVERAGE.md.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a0) new in round 4 — never driver-checked (12 early + 12 late) --
    "x92_heavy_hitters",
    "x99_custdist",
    "x100_weighted_sample",
    "x101_semantic_decontam",
    "x102_variant_extract",
    "x103_cohort_retention",
    "x104_session_window_native",
    "x105_token_budget_mixture",
    "x106_label_centroids",
    "x107_scd2_dimension",
    "x108_scd2_asof_lookup",
    "x97_cms_token_counts",
    "x98_doc_pagerank",
    "x93_zorder_zone_map",
    "x94_incremental_mv",
    "x95_skyline_pareto",
    "x96_semantic_dedup",
    "x80_product_profit",
    "x81_market_share",
    "x82_embed_pq_codes",
    "x83_ngram_novelty",
    "x84_embed_pq_adc_topk",
    "x85_incremental_dedup",
    "x86_dedup_pipeline",
    "x87_correlated_exists",
    "x88_lateral_topk",
    "x89_fuzzy_adjacent_names",
    "x90_bpe_token_counts",
    "x91_hll_union_rollup",
    # -- (a) code changed in round 4 → r3 rows stale (4) --
    "x56_dedup_containment",
    "x79_recursive_cte",
    "q00_flagship_visitantes",
    "q10_merge_upsert",
    # -- (b) latest driver row is round 1 — stalest (32) --
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
    # ---- slot 50 boundary: everything below is round-5 spillover ----
    "x28_text_quality",
    "x29_text_token_count",
    "x30_text_fingerprint",
    "x31_doc_stats_by_lang",
    "x34_events_user_daily",
    "x35_distinct",
    "x38_top_bigrams",
    "q40_left_outer_join",
    "q41_cross_join",
    "q42_except",
    "q43_intersect",
    "q44_union_distinct",
    "q45_cube",
    "q46_window_rank_lag",
    "q47_window_frame_running_sum",
    # -- latest driver row is round 2 (spillover continues) --
    "q48_having",
    "q49_conditional_agg",
    "q50_scalar_subquery",
    "q51_in_subquery",
    "q52_string_funcs",
    "q53_math_funcs",
    "q54_date_funcs",
    "q55_json_extract",
    "q57_inline_lookup_join",
    "q58_star_join",
    "q59_sql_identical_text",
    "q61_pivot",
    "q62_variance_manual",
    "x36_approx_count_distinct",
    "x37_approx_percentile",
    "q63_shipping_priority",
    "q64_regional_volume",
    "q65_median_manual",
    "q66_regexp_extract",
    "x44_hash_split",
    "x45_snapshot_cdc",
    "x46_len_quantiles_by_lang",
    "q69_grouping_sets",
    "q67_event_funnel",
    "x49_sequence_packing",
    "x50_shuffled_sample",
    "x51_mixture_sampling",
    "q60_pricing_summary",
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
