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
# Round-9 pinning rule: HEAD = the five NEW queries (x149-x153), then
# the four whose implementation (or underlying operators) changed this
# round, then ALL 39 round-5-latest names (including q42/q43, displaced
# by the r8 head), then the 2 oldest round-6-latest names:
# 5 + 4 + 39 + 2 = exactly 50. After this round no query's latest driver
# row predates round 6; the remaining round-6 cohort rotates in round 10.
# All names stay covered by the local full-suite check_oracle runs
# regardless of rotation.
DRIVER_ORDER: tuple[str, ...] = (
    # -- (a) round-9 rotation head: the TWO new queries first (never
    #    driver-checked: x149 leakage-free hash split, x150 OOV audit),
    #    then the queries whose implementation (or whose underlying
    #    operators) changed this round — x148 via greedy_pack_bins'
    #    caller-typed grp schema; x122/x117 via the stored indexes'
    #    backend-routed ledger resets/carries + save_gram_index's family
    #    compactor lease; q10 via the warehouse pointer reads now routed
    #    through the commit backend --
    "x149_leakage_free_split",
    "x150_oov_rate",
    "x151_epoch_shuffle",
    "x152_dup_gram_fraction",
    "x153_length_histogram",
    "x148_greedy_doc_packing",
    "x122_stored_gram_dedup",
    "x117_stored_index_search",
    "q10_merge_upsert",
    # -- (b) ALL 39 round-5-latest names (incl. the q42/q43 the r8 head
    #    displaced): after this round no query's latest driver row
    #    predates round 6 (VERDICT r8 item 1) --
    "q42_except",
    "q43_intersect",
    "q44_union_distinct",
    "q45_cube",
    "q46_window_rank_lag",
    "q47_window_frame_running_sum",
    "q48_having",
    "q49_conditional_agg",
    "q50_scalar_subquery",
    "q51_in_subquery",
    "q52_string_funcs",
    "q53_math_funcs",
    "q54_date_funcs",
    "q55_json_extract",
    "q57_inline_lookup_join",
    "x106_label_centroids",
    "x107_scd2_dimension",
    "x108_scd2_asof_lookup",
    "x109_waiting_supplier",
    "x110_dormant_customers",
    "x111_bulk_suppliers",
    "x112_dup_span_scrub",
    "x113_constraint_audit",
    "x114_neardup_triangles",
    "x115_repetition_scrub",
    "x116_cheapest_supplier",
    "x118_promo_revenue",
    "x119_disjunctive_revenue",
    "x120_top_supplier",
    "x121_nation_volume",
    "x28_text_quality",
    "x29_text_token_count",
    "x30_text_fingerprint",
    "x31_doc_stats_by_lang",
    "x34_events_user_daily",
    "x35_distinct",
    "x38_top_bigrams",
    "x79_recursive_cte",
    "x98_doc_pagerank",
    # -- (c) oldest round-6-latest names fill the remaining 2 slots;
    #    the rest of the round-6 cohort rotates in round 10 --
    "q58_star_join",
    "q59_sql_identical_text",
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
