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
# in dict order; with 153 registered queries we rotate so every query's
# latest driver row postdates its last code change (history in
# docs/COVERAGE.md).
#
# Round-5 pinning rule (VERDICT r4 item 2): HEAD = the 14 never-checked
# names (x109-x116 from round 4's late registrations, x117-x122 new in
# round 5), then the one red r4 row (x106, output format fixed this
# round) and every query whose implementation changed in round 5 (x92
# heavy-hitter eager rework, x107/x108 scd2 insert branch, x98 pagerank
# cache scope, x79 bounded-inline twin, x84 fused collects, x58/x59
# single-exchange folds, q00/q10 unified bucketed merge), then the
# stalest rows: all 15 round-1-latest, then round-2-latest up to slot 50.
# The 19 remaining round-2-latest names spill past slot 50 to round 6
# (every one has 2 green driver rows and an unchanged implementation
# since round 2).
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a0) registered late in round 4 -- never driver-checked (8) --
    "x109_waiting_supplier",
    "x110_dormant_customers",
    "x111_bulk_suppliers",
    "x112_dup_span_scrub",
    "x113_constraint_audit",
    "x114_neardup_triangles",
    "x115_repetition_scrub",
    "x116_cheapest_supplier",
    # -- (a0b) NEW in round 5 -- never driver-checked (6) --
    "x117_stored_index_search",
    "x118_promo_revenue",
    "x119_disjunctive_revenue",
    "x120_top_supplier",
    "x121_nation_volume",
    "x122_stored_gram_dedup",
    # -- (a) red in r4 (x106) or implementation changed in round 5 (12) --
    "x82_embed_pq_codes",
    "x59_bigram_rarity",
    "x106_label_centroids",
    "x92_heavy_hitters",
    "x107_scd2_dimension",
    "x108_scd2_asof_lookup",
    "x98_doc_pagerank",
    "x79_recursive_cte",
    "x84_embed_pq_adc_topk",
    "x58_tfidf_top_terms",
    "q00_flagship_visitantes",
    "q10_merge_upsert",
    # -- (b) latest driver row is round 1 -- stalest (15) --
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
    # -- (c) latest driver row is round 2, first 9 fill to slot 50 --
    "q48_having",
    "q49_conditional_agg",
    "q50_scalar_subquery",
    "q51_in_subquery",
    "q52_string_funcs",
    "q53_math_funcs",
    "q54_date_funcs",
    "q55_json_extract",
    "q57_inline_lookup_join",
    # ---- slot 50 boundary: everything below is round-6 spillover ----
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
