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
# in dict order; with 207 registered queries we rotate so every query's
# latest driver row postdates its last code change (history in
# docs/COVERAGE.md).
#
# Round-11 pinning rule: HEAD = (a) the FIVE new queries (x173 served
# hybrid retrieval, x174 common-span mining, x175 LM perplexity, x176
# stored-LM serving, x177 pruned-ANN serving — never driver-checked)
# plus the SEVEN queries whose implementation CHANGED to oracle-backed
# certificate forms this round (x60 integer k-means, x96 codebook
# SemDeDup, x23/x24 portable-hash MinHash/SimHash, x26/x42 quantized-
# plane LSH, x41 codebook IVF, x98 integer PageRank); then (b) the six
# queries whose kernels changed this round — x163/x165/x172 (bm25_topk
# + the stored index: DECIMAL(38,0) num/den, Java-\s prefilter
# tokenization, pre-filter _stats sidecar, driver-side bucket
# resolution), x166/x170 (DSIR weight products through DECIMAL), and
# x123 (AQE off inside the recursion scope) — changed code outranks
# stale rows; then (c) the TWELVE round-6-latest names round-10
# displaced; then (d) 14 of the remaining round-7-latest names (the r7
# fill names q01/q05/q56/q68/x143/x146 first, then alphabetical).
# 13 + 6 + 12 + 19 = 50. The round-7-latest names that do not fit
# (x32+ alphabetical tail) defer to the round-12 head; all stay covered
# by the local full-suite check_oracle runs every session.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a) new / converted-to-certificate this round --
    "x173_stored_hybrid_serving",
    "x174_common_span_mining",
    "x175_lm_perplexity",
    "x176_stored_lm_serving",
    "x177_ivfflat_ann_serving",
    "x60_embed_kmeans",
    "x96_semantic_dedup",
    "x23_dedup_minhash_lsh",
    "x24_dedup_simhash",
    "x26_embed_ann_lsh",
    "x41_embed_ivf_topk",
    "x42_dedup_embed_cosine",
    "x98_doc_pagerank",
    # -- (b) kernels changed this round --
    "x163_bm25_retrieval",
    "x165_hybrid_rrf",
    "x172_stored_bm25_serving",
    "x166_dsir_scores",
    "x170_stored_dsir_serving",
    "x123_native_recursion",
    # -- (c) the twelve round-6-latest names (VERDICT r10 item 2) --
    "x36_approx_count_distinct",
    "x37_approx_percentile",
    "x44_hash_split",
    "x45_snapshot_cdc",
    "x46_len_quantiles_by_lang",
    "x49_sequence_packing",
    "x50_shuffled_sample",
    "x51_mixture_sampling",
    "x58_tfidf_top_terms",
    "x59_bigram_rarity",
    "x70_json_struct_agg",
    "x92_heavy_hitters",
    # -- (d) round-7-latest fill: the displaced r7 fills, then
    #    alphabetical --
    "q01_scan_project_rename",
    "q05_error_explode",
    "q56_sorted_collect",
    "q68_rolling_hour_window",
    "x143_mad_outliers",
    "x146_chunk_udtf",
    "x21_dedup_exact",
    "x22_dedup_ngram_jaccard",
    "x25_embed_cosine_topk",
    "x27_text_lang_id",
    "x32_events_tumbling_hour",
    "x33_events_sessionize",
    "x39_time_range_join",
    "x40_asof_join",
    "x43_corpus_curation",
    "x47_decontaminate",
    "x48_term_redaction",
    "x52_repetition_metrics",
    "x53_source_quota",
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
