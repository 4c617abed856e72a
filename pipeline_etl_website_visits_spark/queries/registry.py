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
# Round-6 pinning rule: HEAD = the twenty-four never-checked names (x123
# native recursion, the six TPC-H shapes x124-x129, x130 Zipf slope,
# x131 source-overlap matrix, x132 schema evolution, x133 bag set-ops,
# x134/x135 TPC-H Q11/Q16, x136 distribution windows, x137 null
# ordering, x138 substring decontam, x139 token entropy, x140 market
# basket, x141 transitions, x142 gap fill, x143 MAD outliers, x144 ORC,
# x145 k-anonymity, x146 UDTF chunks — all new this round),
# then every query whose
# implementation changed in round 6 (x117/x122 fingerprinted+atomic
# scratch builds; x58/x59 via the compact_first default flip — they opt
# into the fused form explicitly; x70/x102 fan_out on the JSON parse;),
# then the documented round-5 spillover (the 19 round-2-latest names —
# committed last round to head this prefix): 24 + 7 + 19 = exactly 50.
# The thirty-six round-3-latest names all spill past slot 50 to round 7
# (each has two green driver rows and an implementation unchanged since
# round 3); all round-4/5-latest rows are fresher than everything
# listed and stay covered by the local full-suite check_oracle runs.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a0) NEW in round 6 -- never driver-checked (11) --
    "x123_native_recursion",
    "x124_priority_late_orders",
    "x125_priority_class_lines",
    "x126_small_quantity_revenue",
    "x127_large_volume_orders",
    "x128_returned_item_customers",
    "x129_forecast_revenue",
    "x130_zipf_slope",
    "x131_source_overlap_matrix",
    "x132_schema_evolution",
    "x133_bag_set_ops",
    "x134_important_parts",
    "x135_supplier_part_counts",
    "x136_window_distribution_family",
    "x137_null_ordering",
    "x138_substring_decontam",
    "x139_token_entropy",
    "x140_market_basket_pairs",
    "x141_event_transitions",
    "x142_gap_fill_forward",
    "x143_mad_outliers",
    "x144_orc_roundtrip",
    "x145_k_anonymity",
    "x146_chunk_udtf",
    # -- (a) implementation changed in round 6 (7) --
    "x92_heavy_hitters",
    "x117_stored_index_search",
    "x122_stored_gram_dedup",
    "x59_bigram_rarity",
    "x58_tfidf_top_terms",
    "x70_json_struct_agg",
    "x102_variant_extract",
    # -- (b) round-5 spillover: latest driver row is round 2 (19) --
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
    # ---- slot 50 boundary: everything below is round-7 spillover ----
    # -- (c) latest driver row is round 3 (displaced late round 6 by the
    #    seven newest never-checked queries x140-x146) --
    "q01_scan_project_rename",
    "q05_error_explode",
    "x21_dedup_exact",
    "x22_dedup_ngram_jaccard",
    "x23_dedup_minhash_lsh",
    "x24_dedup_simhash",
    "x25_embed_cosine_topk",
    "x26_embed_ann_lsh",
    "x27_text_lang_id",
    "x39_time_range_join",
    "x40_asof_join",
    "x41_embed_ivf_topk",
    "x43_corpus_curation",
    "x42_dedup_embed_cosine",
    "x60_embed_kmeans",
    "x61_multimodal_png_roundtrip",
    "x71_dedup_clusters",
    "x76_multimodal_wav_roundtrip",
    "x78_bpe_merges",
    "x32_events_tumbling_hour",
    "x33_events_sessionize",
    "q56_sorted_collect",
    "x68_grouped_argmax",
    "x69_adjacent_doc_jaccard",
    "x77_stat_aggregates",
    "q68_rolling_hour_window",
    "x47_decontaminate",
    "x48_term_redaction",
    "x52_repetition_metrics",
    "x53_source_quota",
    "x54_chunk_overlap",
    "x55_doc_frequency",
    "x57_winnowing_fingerprints",
    "x62_salted_hot_key_agg",
    "x63_price_histogram",
    "x64_table_profile",
    "x65_stratified_sample",
    "x66_prefilter_decontam",
    "x67_session_funnel",
    "x72_sliding_windows",
    "x73_window_distribution",
    "x74_unpivot_metrics",
    "x75_interval_overlap_join",
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
