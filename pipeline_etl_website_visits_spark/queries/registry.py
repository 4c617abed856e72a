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
# in dict order (CORRECTNESS_r01.json == exact 50-entry prefix of the round-1
# registration order).  With 82 registered queries a single round can never
# cover them all, so we rotate: queries that have NOT yet received a driver
# correctness row are listed first, followed by the highest-value re-checks
# (flagship, merge, the dedup/similarity family, stream aggregations).
# Everything else keeps registration order after the priority block.
# Round-1 rows exist for the 50 names in CORRECTNESS_r01.json; round-2 covers
# the remaining 32 + 18 re-checks, so every query has a driver row across
# rounds 1+2 (see docs/COVERAGE.md).
DRIVER_ORDER: tuple[str, ...] = (
    # -- new in round 2 (no driver row yet) --
    "x58_tfidf_top_terms",
    "x59_bigram_rarity",
    "x60_embed_kmeans",
    "x57_winnowing_fingerprints",
    "x52_repetition_metrics",
    "x53_source_quota",
    "x54_chunk_overlap",
    "x55_doc_frequency",
    "x56_dedup_containment",
    # -- 32 queries with no driver row yet (round-1 positions 51..82) --
    "q48_having",
    "q49_conditional_agg",
    "q50_scalar_subquery",
    "q51_in_subquery",
    "q52_string_funcs",
    "q53_math_funcs",
    "q54_date_funcs",
    "q55_json_extract",
    "q56_sorted_collect",
    "q57_inline_lookup_join",
    "q58_star_join",
    "q59_sql_identical_text",
    "q60_pricing_summary",
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
    "q68_rolling_hour_window",
    "q69_grouping_sets",
    "q67_event_funnel",
    "x47_decontaminate",
    "x48_term_redaction",
    "x49_sequence_packing",
    "x50_shuffled_sample",
    "x51_mixture_sampling",
    # -- highest-value re-checks (changed this round first, then
    #    load-bearing round-1 greens; the driver prefix covers 50 total) --
    "x40_asof_join",
    "x42_dedup_embed_cosine",
    "q00_flagship_visitantes",
    "q10_merge_upsert",
    "x21_dedup_exact",
    "x22_dedup_ngram_jaccard",
    "x23_dedup_minhash_lsh",
    "x24_dedup_simhash",
    "x25_embed_cosine_topk",
    "x26_embed_ann_lsh",
    "x27_text_lang_id",
    "x43_corpus_curation",
    "x41_embed_ivf_topk",
    "x32_events_tumbling_hour",
    "x33_events_sessionize",
    "x39_time_range_join",
    "q01_scan_project_rename",
    "q05_error_explode",
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
