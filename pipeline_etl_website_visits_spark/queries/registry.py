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
# in dict order; with 179 registered queries we rotate so every query's
# latest driver row postdates its last code change (history in
# docs/COVERAGE.md).
#
# Round-10 pinning rule: HEAD = the NINETEEN new queries (x154-x172,
# never driver-checked — new code outranks everything), then x150
# (changed kernel this round), then 30 of the 42 remaining
# round-6-latest names: 19 + 1 + 30 = exactly 50. The twelve
# round-6-latest names that no longer fit (x36_approx_count_distinct,
# x37_approx_percentile, x44_hash_split, x45_snapshot_cdc,
# x46_len_quantiles_by_lang, x49_sequence_packing,
# x50_shuffled_sample, x51_mixture_sampling, x58_tfidf_top_terms,
# x59_bigram_rarity, x70_json_struct_agg, x92_heavy_hitters — the
# tail of the list, none changed since round 6) defer to the
# round-11 rotation head; all stay covered by the local full-suite
# check_oracle runs every session.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a) round-10 rotation head: the ELEVEN new queries first
    #    (x154 stratified quality gate, x155 gram diversity, x156
    #    boilerplate prefixes, x157 token-budget mixture planner,
    #    x158 OHLC resample, x159 l-diversity audit, x160
    #    compression-ratio signal, x161 real image resize, x162 real
    #    video frame sampling, x163 BM25 retrieval, x164 embed PCA,
    #    x165 hybrid BM25+dense RRF, x166 DSIR importance scores,
    #    x167 t-closeness audit, x168 touch attribution, x169 timed
    #    funnel, x170 stored-weights DSIR serving, x171 audio frame
    #    features, x172 stored-BM25-index serving),
    #    then x150 (its oov_counts kernel gained the empty-vocab
    #    guard this round — changed-code outranks stale rows), then
    #    38 round-6-latest names (VERDICT r9 item 1) --
    "x154_stratified_quality_gate",
    "x155_gram_diversity",
    "x156_boilerplate_prefixes",
    "x157_token_budget_mixture",
    "x158_ohlc_resample",
    "x159_l_diversity",
    "x160_compression_ratio",
    "x161_image_resize",
    "x162_video_frame_sample",
    "x163_bm25_retrieval",
    "x164_embed_pca",
    "x165_hybrid_rrf",
    "x166_dsir_scores",
    "x167_t_closeness",
    "x168_touch_attribution",
    "x169_timed_funnel",
    "x170_stored_dsir_serving",
    "x171_audio_frames",
    "x172_stored_bm25_serving",
    "x150_oov_rate",
    "q60_pricing_summary",
    "q61_pivot",
    "q62_variance_manual",
    "q63_shipping_priority",
    "q64_regional_volume",
    "q65_median_manual",
    "q66_regexp_extract",
    "q67_event_funnel",
    "q69_grouping_sets",
    "x102_variant_extract",
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
    "x141_event_transitions",
    "x142_gap_fill_forward",
    "x144_orc_roundtrip",
    "x145_k_anonymity",
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
