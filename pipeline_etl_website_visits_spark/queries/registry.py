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
# in dict order; with 215 registered queries we rotate so every query's
# latest driver row postdates its last code change (history in
# docs/COVERAGE.md).
#
# Round-14 pinning rule (VERDICT r13 item 1 — close the r14 rotation
# tail): HEAD = (a) the TWO new queries (x183 event pseudonymization,
# x184 source-drift PSI — never driver-checked); then (b) the FOUR
# queries whose executed semantics-bearing code changed this round —
# x166/x175 now served from the stored compacted-bigram artifact
# (docbig), x176 through the extracted lm_scores_from_counts kernel,
# x182 through the zero-prefix-guarded cosine_topk_widths; then (c) the
# THIRTY-SIX round-9-latest names the r13 verdict enumerated — after
# this round no name's latest driver row predates round 10; then (d)
# EIGHT representatives of the tokens_of input-guard delta (ADVICE r13:
# the array pass-through now REJECTS non-array<string> element types —
# a pure added guard that cannot change any registered query's values,
# pinned value-identical by test_tokens_of_rejects_non_string_arrays +
# test_tokens_of_pretokenized_equals_inline; the remaining token-family
# consumers keep their r13 rows under that equivalence argument).
# 2+4+36+8 = 50. The round-10-latest names rotate next.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a) new this round --
    "x183_event_pseudonymize",
    "x184_source_drift_psi",
    # -- (b) code changed this round --
    "x166_dsir_scores",
    "x175_lm_perplexity",
    "x176_stored_lm_serving",
    "x182_matryoshka_recall",
    # -- (c) the round-9-latest tail (VERDICT r13 item 1) --
    "q50_scalar_subquery",
    "q51_in_subquery",
    "q52_string_funcs",
    "q53_math_funcs",
    "q54_date_funcs",
    "q55_json_extract",
    "q57_inline_lookup_join",
    "q58_star_join",
    "q59_sql_identical_text",
    "x28_text_quality",
    "x29_text_token_count",
    "x30_text_fingerprint",
    "x31_doc_stats_by_lang",
    "x34_events_user_daily",
    "x35_distinct",
    "x79_recursive_cte",
    "x106_label_centroids",
    "x107_scd2_dimension",
    "x108_scd2_asof_lookup",
    "x109_waiting_supplier",
    "x110_dormant_customers",
    "x111_bulk_suppliers",
    "x112_dup_span_scrub",
    "x113_constraint_audit",
    "x115_repetition_scrub",
    "x116_cheapest_supplier",
    "x118_promo_revenue",
    "x119_disjunctive_revenue",
    "x120_top_supplier",
    "x121_nation_volume",
    "x122_stored_gram_dedup",
    "x148_greedy_doc_packing",
    "x149_leakage_free_split",
    "x151_epoch_shuffle",
    "x152_dup_gram_fraction",
    "x153_length_histogram",
    # -- (d) tokens_of-guard representatives --
    "x23_dedup_minhash_lsh",
    "x38_top_bigrams",
    "x55_doc_frequency",
    "x58_tfidf_top_terms",
    "x85_incremental_dedup",
    "x92_heavy_hitters",
    "x97_cms_token_counts",
    "x130_zipf_slope",
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
