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
# Round-12 pinning rule (VERDICT r11 item 2): HEAD = (a) the THREE new
# queries (x178 cluster canonical keep-rule, x179 ANN recall eval, x180
# near-dup band histogram — never driver-checked); then (b) the ELEVEN
# queries whose code changed this round — the shingle-similarity family
# now served from the shared stored pair-overlap artifact (x22/x56/x71/
# x86/x98/x114), the x174 per-gram-group rework, the x92 phase-2
# merge/recount rework, and the stored-index serving paths that now
# resolve the live generation through the lifecycle pointer (x173/x177
# IVF-Flat, x117 IVF-PQ) — changed code outranks stale rows; then
# (c) the NINETEEN remaining round-7-latest names the r11 verdict named
# (x54, x55, x57, x61–x69, x72–x77, x84 — x71 is already in (b)), so no
# name's latest driver row predates round 8 after this round; then
# (d) 17 of the round-8-latest names, alphabetically (q00–q19 block).
# 3 + 11 + 19 + 17 = 50. The remaining round-8-latest names (q20, q40,
# q41, x78–x105 cohort, x140, x147) rotate in round 13; all stay covered
# by the local full-suite check_oracle runs every session.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a) new this round --
    "x178_cluster_canonical",
    "x179_ann_recall_eval",
    "x180_neardup_band_histogram",
    # -- (b) code changed this round --
    "x22_dedup_ngram_jaccard",
    "x56_dedup_containment",
    "x71_dedup_clusters",
    "x86_dedup_pipeline",
    "x98_doc_pagerank",
    "x114_neardup_triangles",
    "x174_common_span_mining",
    "x92_heavy_hitters",
    "x173_stored_hybrid_serving",
    "x177_ivfflat_ann_serving",
    "x117_stored_index_search",
    # -- (c) the remaining round-7-latest names (VERDICT r11 item 2) --
    "x54_chunk_overlap",
    "x55_doc_frequency",
    "x57_winnowing_fingerprints",
    "x61_multimodal_png_roundtrip",
    "x62_salted_hot_key_agg",
    "x63_price_histogram",
    "x64_table_profile",
    "x65_stratified_sample",
    "x66_prefilter_decontam",
    "x67_session_funnel",
    "x68_grouped_argmax",
    "x69_adjacent_doc_jaccard",
    "x72_sliding_windows",
    "x73_window_distribution",
    "x74_unpivot_metrics",
    "x75_interval_overlap_join",
    "x76_multimodal_wav_roundtrip",
    "x77_stat_aggregates",
    "x84_embed_pq_adc_topk",
    # -- (d) round-8-latest fill, alphabetical --
    "q00_flagship_visitantes",
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
