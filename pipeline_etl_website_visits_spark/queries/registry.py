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
    # -- (a) implementation changed in round 7 (8) --
    "x123_native_recursion",
    "x146_chunk_udtf",
    "x140_market_basket_pairs",
    "x84_embed_pq_adc_topk",
    "x82_embed_pq_codes",
    "x143_mad_outliers",
    "x117_stored_index_search",
    "x122_stored_gram_dedup",
    # -- (b) stalest rows: latest driver row is round 3 (42 of 43;
    #    the alphabetical tail spills to round 8) --
    "q01_scan_project_rename",
    "q05_error_explode",
    "q56_sorted_collect",
    "q68_rolling_hour_window",
    "x21_dedup_exact",
    "x22_dedup_ngram_jaccard",
    "x23_dedup_minhash_lsh",
    "x24_dedup_simhash",
    "x25_embed_cosine_topk",
    "x26_embed_ann_lsh",
    "x27_text_lang_id",
    "x32_events_tumbling_hour",
    "x33_events_sessionize",
    "x39_time_range_join",
    "x40_asof_join",
    "x41_embed_ivf_topk",
    "x42_dedup_embed_cosine",
    "x43_corpus_curation",
    "x47_decontaminate",
    "x48_term_redaction",
    "x52_repetition_metrics",
    "x53_source_quota",
    "x54_chunk_overlap",
    "x55_doc_frequency",
    "x57_winnowing_fingerprints",
    "x60_embed_kmeans",
    "x61_multimodal_png_roundtrip",
    "x62_salted_hot_key_agg",
    "x63_price_histogram",
    "x64_table_profile",
    "x65_stratified_sample",
    "x66_prefilter_decontam",
    "x67_session_funnel",
    "x68_grouped_argmax",
    "x69_adjacent_doc_jaccard",
    "x71_dedup_clusters",
    "x72_sliding_windows",
    "x73_window_distribution",
    "x74_unpivot_metrics",
    "x75_interval_overlap_join",
    "x76_multimodal_wav_roundtrip",
    "x77_stat_aggregates",
    # ---- slot 50 boundary: round-8 spillover ----
    "x78_bpe_merges",
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
