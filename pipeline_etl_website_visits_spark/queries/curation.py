"""Training-data curation + incremental-pipeline declared queries.

Operations a large-scale training-data pipeline runs beside dedup/similarity
(SURVEY.md §0.3 north-star scope): deterministic dataset splitting, snapshot
change-data-capture, exact per-group quantiles, time-range rolling windows,
grouping sets, and event funnels. All oracle-backed.

Scale notes are on each query; the common theme: everything here is a single
shuffle on a key Spark would shuffle on anyway (user_id / lang / join key),
no driver-side loops, no UDFs — whole-stage codegen end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pipeline_etl_website_visits_spark.queries.registry import query
from pipeline_etl_website_visits_spark.tables import load_table


# --------------------------------------------------------------------------
# x44 — deterministic train/val/test split (hash bucketing)
#
# The split must be stable across runs, machines, and engines — so no
# rand(): bucket on the md5 hex of the stable document id. Both Spark and
# DuckDB produce identical lowercase-hex md5 of the same UTF-8 bytes, and
# the first two hex chars give 256 buckets compared lexicographically.
# At 100 TB this is a narrow projection + partial agg — no shuffle of the
# documents themselves, just the 3-row aggregate.
# --------------------------------------------------------------------------
_TRAIN_HI = "cd"  # 205/256 ≈ 80.1 %
_VAL_HI = "e6"  # 25/256 ≈ 9.8 %; rest ≈ 10.2 % test


@query(
    "x44_hash_split",
    oracle=f"""
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}' THEN 'train'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split ORDER BY split
    """,
    certifies="deterministic dataset split (north-star §0.3); hash bucketing",
    tags=("llm", "curation"),
)
def x44(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < _TRAIN_HI, "train").when(bucket < _VAL_HI, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# x45 — snapshot change-data-capture (full-outer diff classify)
#
# Incremental pipelines re-ingest a source and need insert/update/delete/same
# classification between consecutive snapshots. Single full-outer equi-join
# on the key — at scale both snapshots are bucketed on the key so the join is
# shuffle-free (docs/SCALE.md); here AQE would pick SMJ. Two synthetic
# snapshots carved from orders so the oracle sees identical inputs.
# --------------------------------------------------------------------------
@query(
    "x45_snapshot_cdc",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_orderstatus AS old_status
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS new_status
      FROM orders WHERE o_orderkey % 3 <> 1
    )
    SELECT CASE WHEN new_status IS NULL THEN 'delete'
                WHEN old_status IS NULL THEN 'insert'
                WHEN old_status <> new_status THEN 'update'
                ELSE 'same' END AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(COALESCE(old.k, new.k)) AS BIGINT) AS min_key,
           CAST(MAX(COALESCE(old.k, new.k)) AS BIGINT) AS max_key
    FROM old FULL OUTER JOIN new ON old.k = new.k
    GROUP BY 1 ORDER BY 1
    """,
    certifies="snapshot CDC diff (incremental ingest); full-outer classify",
    tags=("llm", "curation", "join"),
)
def x45(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("old_status")
    )
    new = orders.filter(F.col("o_orderkey") % 3 != 1).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("new_status"),
    )
    j = old.join(new, "k", "full_outer")
    change = (
        F.when(F.col("new_status").isNull(), "delete")
        .when(F.col("old_status").isNull(), "insert")
        .when(F.col("old_status") != F.col("new_status"), "update")
        .otherwise("same")
    )
    return (
        j.select(change.alias("change_type"), "k")
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
    )


# --------------------------------------------------------------------------
# x46 — exact per-group quantiles (positional, type-1)
#
# Interpolated percentile risks last-ulp float divergence between engines, so
# the declared form is the positional quantile: rank ceil(q*n) in (n_chars,
# doc_id) order — pure integer logic, hash-exact. One shuffle on lang (a
# low-cardinality key: fine — 10s of languages, each partition a window scan).
# For skewed corpora the window sort is the cost; at 100 TB use approx
# percentile_approx for monitoring and this exact form for audits.
# --------------------------------------------------------------------------
@query(
    "x46_len_quantiles_by_lang",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN n_chars END) AS BIGINT) AS p50_chars,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN n_chars END) AS BIGINT) AS p90_chars
    FROM ranked
    GROUP BY lang ORDER BY lang
    """,
    certifies="exact group-wise quantiles (corpus length audit)",
    tags=("llm", "curation", "window"),
)
def x46(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    p50_at = F.ceil(0.5 * F.col("n")).cast("bigint")
    p90_at = F.ceil(0.9 * F.col("n")).cast("bigint")
    return (
        ranked.groupBy("lang")
        .agg(
            F.max("n").alias("n_docs"),
            F.max(F.when(F.col("rn") == p50_at, F.col("n_chars"))).alias("p50_chars"),
            F.max(F.when(F.col("rn") == p90_at, F.col("n_chars"))).alias("p90_chars"),
        )
    )


# --------------------------------------------------------------------------
# q65 — time-range rolling window (RANGE frame over event time)
#
# "events in the trailing hour per user" — a RANGE frame over epoch seconds,
# not a ROW frame: ties (same second) are frame-peers in both engines, so the
# result is order-insensitive and deterministic. The rolling value sum runs
# in DECIMAL so accumulation order can't perturb the hash. One shuffle on
# user_id; the per-user sort is what Spark's window exec does anyway.
# --------------------------------------------------------------------------
@query(
    "q68_rolling_hour_window",
    oracle="""
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS events_last_hour,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 2) AS value_last_hour
    FROM (SELECT event_id, user_id, value,
                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    certifies="time-range rolling window (RANGE frame); SURVEY §2.10 windows",
    tags=("window", "events"),
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        # timestamp cast first: no-op on TIMESTAMP, normalizes NTZ inputs
        # (NTZ cannot cast directly to BIGINT).
        "event_id", "user_id", "value", F.col("ts").cast("timestamp").cast("long").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.count("*").over(w).alias("events_last_hour"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 2
        ).alias("value_last_hour"),
    )


# --------------------------------------------------------------------------
# q66 — GROUPING SETS with GROUPING() ids
#
# Rollup/cube are declared elsewhere (q18, q45); this is the general form —
# an explicit set list that is NOT a rollup prefix chain, plus GROUPING()
# to disambiguate "NULL data" from "aggregated-out". Spark plans one
# Expand + single agg — the same shape DuckDB uses.
# --------------------------------------------------------------------------
@query(
    "q69_grouping_sets",
    oracle="""
    SELECT COALESCE(n_name, 'ALL') AS nation,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, c_mktsegment), (c_mktsegment), ())
    ORDER BY g_nation, g_segment, nation, segment
    """,
    certifies="grouping sets + GROUPING() (SURVEY §2.10 grouping-sets gap)",
    tags=("agg",),
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    return (
        j.groupingSets(
            [["n_name", "c_mktsegment"], ["c_mktsegment"], []],
            "n_name",
            "c_mktsegment",
        )
        .agg(
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("c_mktsegment").cast("int").alias("g_segment"),
            F.count("*").alias("n_customers"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "g_nation",
            "g_segment",
            "n_customers",
        )
    )


# --------------------------------------------------------------------------
# q67 — ordered event funnel (signup-free 3-step: view → click → purchase)
#
# Per-user conditional min(ts) per step, then strict ordering comparisons —
# the standard funnel without self-joins: one shuffle on user_id, map-side
# partial aggs, no explode. At 100 TB the groupBy(user_id) is the natural
# partitioning of any sessionized event store.
# --------------------------------------------------------------------------
@query(
    "q67_event_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_view,
           CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view) AS BIGINT) AS n_view_click,
           CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
    certifies="ordered event funnel (conditional min, no self-join)",
    tags=("events", "agg"),
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage1 = F.col("t_view").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.sum(stage1.cast("long")).alias("n_view"),
        F.sum(stage2.cast("long")).alias("n_view_click"),
        F.sum(stage3.cast("long")).alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
# x47 — benchmark decontamination (shared n-grams vs a small eval set)
#
# Standard LLM-corpus hygiene: any training document sharing an n-gram with
# the benchmark/eval set is flagged for removal. Eval grams broadcast
# (benchmarks are KBs); the corpus side never shuffles its grams — see
# operators.dedup.contamination_hits.
# --------------------------------------------------------------------------
_EVAL_MAX_ID = 20  # doc_id < 20 plays the role of the benchmark set


@query(
    "x47_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(lst) - 1),
               i -> lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2]))) AS gram
      FROM (SELECT doc_id,
                   regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS lst
            FROM documents)
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < {_EVAL_MAX_ID})
    SELECT g.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS shared_grams
    FROM g JOIN ev USING (gram)
    WHERE g.doc_id >= {_EVAL_MAX_ID}
    GROUP BY 1 ORDER BY 1
    """,
    certifies="benchmark decontamination via shared n-grams (north-star §0.3)",
    tags=("llm", "curation", "dedup"),
)
def x47(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= _EVAL_MAX_ID)
    eval_df = docs.filter(F.col("doc_id") < _EVAL_MAX_ID)
    return D.contamination_hits(corpus, eval_df, "text", "doc_id", n=3)


# --------------------------------------------------------------------------
# x48 — blocklist-term redaction (global regex replace + count)
#
# The scrubbing primitive for PII/banned-term removal: whole-word
# alternation, counted and replaced in one codegen'd projection. The
# synthetic corpus has no real PII, so the blocklist is three corpus words —
# the operator (operators.text.redact_terms) takes any term list.
# --------------------------------------------------------------------------
_BLOCKLIST = ("customer", "merge", "spark")


@query(
    "x48_term_redaction",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\b(?:{"|".join(_BLOCKLIST)})\\b')) AS BIGINT) AS n_redacted,
           CAST(LENGTH(regexp_replace(text, '\\b(?:{"|".join(_BLOCKLIST)})\\b', '<TERM>', 'g')) AS BIGINT) AS redacted_len
    FROM documents
    WHERE len(regexp_extract_all(text, '\\b(?:{"|".join(_BLOCKLIST)})\\b')) > 0
    ORDER BY doc_id
    """,
    certifies="blocklist/PII redaction: global regexp replace + count (north-star §0.3)",
    tags=("llm", "curation", "text"),
)
def x48(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T

    # fan_out: global regexp replace per row dominates; per-row output (safe)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return T.redact_terms(docs, "text", "doc_id", _BLOCKLIST)


# --------------------------------------------------------------------------
# x49 — sequence packing (concat-and-chunk into fixed token budgets)
#
# Training pipelines pack documents into fixed-length sequences; the
# standard "concatenate the shard, chunk every BUDGET tokens" assignment is
# a running token offset: doc -> pack floor(start_offset / BUDGET). Packing
# is per-shard exactly as in real pipelines (each worker packs its own
# shard), which also keeps the prefix-sum window parallel — an unpartitioned
# window would serialize the whole corpus through one task.
# --------------------------------------------------------------------------
_PACK_BUDGET = 2048
_PACK_SHARDS = 8


@query(
    "x49_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
             CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS BIGINT) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT shard, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
      FROM toks
    )
    SELECT shard, CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM placed
    GROUP BY shard, pack_id
    """,
    certifies="sequence packing by running token offset (north-star §0.3)",
    tags=("llm", "curation", "window"),
)
def x49(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        placed.groupBy(
            "shard", F.expr(f"start_offset div {_PACK_BUDGET}").cast("long").alias("pack_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --------------------------------------------------------------------------
# x50 — deterministic shuffled sample (top-k by content-independent hash)
#
# "Shuffle the corpus" without rand(): rank by md5 of the id. The full
# permutation (global row_number) would serialize through one task; the
# declared form is the distributed top-k prefix of that permutation —
# Spark's TakeOrdered is a per-partition top-k + driver merge, the same
# shape at any scale.
# --------------------------------------------------------------------------
_SAMPLE_K = 100


@query(
    "x50_shuffled_sample",
    oracle=f"""
    SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS shuffle_key
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {_SAMPLE_K}
    """,
    certifies="deterministic shuffled sampling (north-star §0.3)",
    tags=("llm", "curation"),
)
def x50(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", F.substring(h, 1, 8).alias("shuffle_key"))
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .limit(_SAMPLE_K)
    )


# --------------------------------------------------------------------------
# x51 — mixture sampling (per-source keep rates)
#
# Training mixtures downweight/upweight sources; the deterministic version
# keeps a doc iff its hash bucket clears the source's rate. Narrow
# projection + filter + partial agg — fully map-side until the per-source
# count.
# --------------------------------------------------------------------------
# keep rates in 256ths by source bucket (sources are src0..src19):
# src%4==0 -> 25% (< '40'), ==1 -> 50%, ==2 -> 75%, else 100%
@query(
    "x51_mixture_sampling",
    oracle="""
    WITH tagged AS (
      SELECT source,
             CAST(substring(source, 4) AS INT) % 4 AS bucket,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE
             CASE WHEN bucket = 0 THEN h < '40'
                  WHEN bucket = 1 THEN h < '80'
                  WHEN bucket = 2 THEN h < 'c0'
                  ELSE TRUE END) AS BIGINT) AS n_kept
    FROM tagged
    GROUP BY source
    """,
    certifies="deterministic mixture sampling by source weight (north-star §0.3)",
    tags=("llm", "curation"),
)
def x51(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.col("source"), 4, 10).cast("int") % 4
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    keep = (
        F.when(bucket == 0, h < "40")
        .when(bucket == 1, h < "80")
        .when(bucket == 2, h < "c0")
        .otherwise(F.lit(True))
    )
    return (
        docs.select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# x52-x56 — second curation wave: intra-doc repetition (Gopher-style quality
# rules), per-source quota caps, sliding-window chunking, corpus document
# frequency, and containment near-dup (subset duplication). All single-
# shuffle or map-only; operator impls in operators/text.py / dedup.py.
# --------------------------------------------------------------------------
_NORM_C = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


@query(
    "x52_repetition_metrics",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_C}, ' ')) AS tok FROM documents
    ), per_tok AS (
      SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
    ), ranked AS (
      SELECT doc_id, tok, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok DESC) AS rn,
             SUM(cnt) OVER (PARTITION BY doc_id) AS n_tokens,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct
      FROM per_tok
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct_tokens,
           CAST(((n_tokens - n_distinct) * 2000 + n_tokens) // (2 * n_tokens) / 1000.0 AS DOUBLE)
             AS dup_token_ratio,
           tok AS top_token,
           CAST((cnt * 2000 + n_tokens) // (2 * n_tokens) / 1000.0 AS DOUBLE) AS top_token_frac
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    certifies="X4 intra-doc repetition quality signal (Gopher rules; north-star §0.3)",
    tags=("llm", "text", "curation"),
)
def x52(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T

    # fan_out: explode + per-doc aggs; integer ratios (order-safe)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return T.repetition_features(docs, "text", "doc_id")


@query(
    "x53_source_quota",
    oracle="""
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, CAST(rank_in_key AS INT) AS rank_in_key
    FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank_in_key
      FROM documents
    )
    WHERE rank_in_key <= 10 ORDER BY doc_id
    """,
    certifies="per-source contribution cap / domain quota (north-star §0.3)",
    tags=("llm", "curation"),
)
def x53(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    capped = T.quota_per_key(docs, "source", "n_chars", "doc_id", quota=10)
    return capped.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("rank_in_key").cast("int").alias("rank_in_key"),
    )


@query(
    "x54_chunk_overlap",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_C}, ' ') AS toks,
             len(string_split({_NORM_C}, ' ')) AS n
      FROM documents
    ), idx AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, CAST((GREATEST(n - 50, 0) + 39) // 40 AS INT))) AS chunk_idx
      FROM base
    ), chunks AS (
      SELECT doc_id, chunk_idx, toks[chunk_idx * 40 + 1 : chunk_idx * 40 + 50] AS chunk
      FROM idx
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(chunk) AS INT) AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM chunks ORDER BY doc_id, chunk_idx
    """,
    certifies="sliding-window chunking for context-length packing / RAG (north-star §0.3)",
    tags=("llm", "curation", "text"),
)
def x54(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T

    # fan_out: HOF slicing + md5 per chunk, map-only per-row output (safe)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return T.chunk_documents(docs, "text", "doc_id", window=50, stride=40)


@query(
    "x55_doc_frequency",
    oracle=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM (
      SELECT doc_id, unnest(list_distinct(string_split({_NORM_C}, ' '))) AS token
      FROM documents
    )
    GROUP BY token ORDER BY doc_freq DESC, token LIMIT 25
    """,
    certifies="corpus document frequency / IDF denominator, served from the stored vocabulary-count artifact (exact countDistinct at build; oracle re-derives inline) (north-star §0.3 text stats)",
    tags=("llm", "text"),
)
def x55(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.queries.llmops import shared_token_counts

    # stored vocabulary-count artifact: document frequency is a stored
    # column (exact countDistinct at build); oracle re-derives inline
    tc = shared_token_counts(spark, sf_dir)
    return (
        tc.select("token", "doc_freq")
        .orderBy(F.col("doc_freq").desc(), "token")
        .limit(25)
    )


@query(
    "x56_dedup_containment",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_C}, ' ') AS t FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
      FROM toks, unnest(generate_series(1, GREATEST(len(t) - 2, 0))) AS u(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST((i * 2000 + LEAST(sa.sz, sb.sz)) // (2 * LEAST(sa.sz, sb.sz)) / 1000.0 AS DOUBLE)
             AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / LEAST(sa.sz, sb.sz) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    certifies="X3 containment near-dup: subset/quote duplication Jaccard misses",
    tags=("llm", "dedup"),
)
def x56(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import dedup as D
    from pipeline_etl_website_visits_spark.queries.llmops import shared_pair_overlap

    # served from the family-shared stored pair-overlap artifact (r12):
    # containment is a pure (inter, min(sz)) filter over the same relation
    # Jaccard reads; the oracle re-derives inline so the hash certifies it
    docs = load_table(spark, sf_dir, "documents")
    return D.shingle_containment_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5,
        overlap=shared_pair_overlap(spark, sf_dir, min_containment=0.5),
    )


@query(
    "x57_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_C}, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, i - 1 AS pos, md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS gh
      FROM toks, unnest(generate_series(1, GREATEST(len(t) - 2, 0))) AS u(i)
    ), winmin AS (
      SELECT doc_id,
             MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
      FROM grams
    ), fps AS (
      SELECT DISTINCT doc_id, fp FROM winmin WHERE wn = 4
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           MIN(fp) AS min_fp,
           MAX(fp) AS max_fp
    FROM fps GROUP BY doc_id ORDER BY doc_id
    """,
    certifies="X3 winnowing fingerprints (MOSS sketch): guaranteed-overlap doc signatures",
    tags=("llm", "dedup", "text"),
)
def x57(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.winnowing_fingerprints(docs, "text", "doc_id", n=3, window=4, portable_hash=True)


@query(
    "x58_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_C}, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, token
    ), dfreq AS (
      SELECT *, CAST(COUNT(*) OVER (PARTITION BY token) AS BIGINT) AS doc_freq FROM tf
    ), scored AS (
      SELECT doc_id, token, tf, doc_freq,
             tf * CAST(FLOOR(LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / doc_freq)
                             * 1000000) AS BIGINT) AS score_micro
      FROM dfreq
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score_micro DESC, token) AS BIGINT) AS term_rank
      FROM scored
    )
    SELECT doc_id, token, tf, doc_freq, score_micro, term_rank
    FROM ranked WHERE term_rank <= 5 ORDER BY doc_id, term_rank
    """,
    certifies="X4 TF-IDF top-terms per document (keyword extraction; integer-quantized IDF)",
    tags=("llm", "text", "curation"),
)
def x58(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T
    from pipeline_etl_website_visits_spark.queries.llmops import shared_tokenized_corpus

    # stored tokenized-corpus artifact (every documents row kept, so the
    # IDF's N = COUNT(*) is unchanged). compact_first=False opts into the
    # fused single-exchange form — the right call for THIS corpus
    # (normalized tokens, no stop-word monster); the operator's
    # corpus-scale default is the skew-safe compact-before-shuffle form
    # (ADVICE r5).
    toks = shared_tokenized_corpus(spark, sf_dir)
    return T.tfidf_top_terms(
        toks, "toks", "doc_id", k=5, compact_first=False
    ).withColumnRenamed("rank", "term_rank")


@query(
    "x59_bigram_rarity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_C}, ' ') AS t FROM documents
    ), big AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ), compact AS (
      SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM big GROUP BY doc_id, bigram
    ), wc AS (
      SELECT *, CAST(SUM(cnt) OVER (PARTITION BY bigram) AS BIGINT) AS corpus_cnt FROM compact
    ), agg AS (
      SELECT doc_id, SUM(cnt) AS n_bigrams,
             SUM(CASE WHEN corpus_cnt <= 2 THEN cnt ELSE 0 END) AS n_rare
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(n_rare AS BIGINT) AS n_rare_bigrams,
           CAST((n_rare * 100 * 20 + n_bigrams) // (2 * n_bigrams) / 10.0 AS DOUBLE) AS rare_pct
    FROM agg ORDER BY doc_id
    """,
    certifies="X4 corpus-LM rarity quality signal (integer-exact perplexity cousin)",
    tags=("llm", "text", "curation"),
)
def x59(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T
    from pipeline_etl_website_visits_spark.queries.llmops import shared_tokenized_corpus

    # stored tokenized-corpus artifact (written at build parallelism, so
    # the bigram HOF starts wide without a fan_out exchange);
    # compact_first=False: the fused single-exchange form (see x58 note)
    toks = shared_tokenized_corpus(spark, sf_dir)
    return T.bigram_rarity(toks, "toks", "doc_id", rare_max_count=2, compact_first=False)


# --------------------------------------------------------------------------
# x62 — salted hot-key aggregation, certified at the query level
#
# The skew lever (operators/skew.py) gets an oracle row: the two-stage
# (key, salt) partial → key final aggregation must equal a plain GROUP BY.
# event_type is the low-cardinality key a viral product would turn
# pathological; the salt spreads each key over 32 partial cells.
# --------------------------------------------------------------------------
@query(
    "x62_salted_hot_key_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    certifies="skew salting: two-stage salted agg == plain groupBy (SURVEY §4.3)",
    tags=("scale", "events"),
)
def x62(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.skew import salted_count

    ev = load_table(spark, sf_dir, "events")
    return salted_count(ev, "event_type", salt_col="event_id", buckets=32)


# --------------------------------------------------------------------------
# x63 — fixed-width histogram (profiling primitive)
#
# Bucket arithmetic is explicit integer math in BOTH dialects (DuckDB lacks
# width_bucket; Spark's would round differently at edges anyway): bucket =
# min(floor(price/5000), 19). Decimal-safe: floor on DOUBLE of cents-scale
# values is exact for the TPC-H price domain (< 2^38).
# --------------------------------------------------------------------------
@query(
    "x63_price_histogram",
    oracle="""
    SELECT CAST(LEAST(CAST(FLOOR(l_extendedprice / 5000) AS BIGINT), 19) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    certifies="fixed-width histogram / profiling primitive (SURVEY §2.10 aggregates)",
    tags=("profile",),
)
def x63(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_extendedprice") / 5000).cast("long"), F.lit(19)).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# x64 — table profile (per-group column statistics)
#
# The manifest/catalog-stats primitive: per o_orderstatus, min/max/nulls/
# distincts across heterogeneous columns in ONE scan (what a 100 TB ingest
# writes as per-partition stats for file skipping). Exact distinct via
# count(distinct) — both engines plan a single aggregate with multiple
# distinct branches.
# --------------------------------------------------------------------------
@query(
    "x64_table_profile",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(MIN(o_orderdate) AS DATE) AS min_date,
           CAST(MAX(o_orderdate) AS DATE) AS max_date,
           CAST(MIN(LENGTH(o_orderpriority)) AS BIGINT) AS min_prio_len,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    certifies="per-group column profile / manifest stats in one scan (SURVEY §2.10)",
    tags=("profile",),
)
def x64(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
        F.min(F.length("o_orderpriority")).cast("long").alias("min_prio_len"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).cast("long").alias("n_null_price"),
    )


# --------------------------------------------------------------------------
# x65 — stratified sample with per-stratum rates
#
# Deterministic md5-bucket sampling (portable across engines, unlike
# xxhash64), with per-language rates: high-resource langs downsampled,
# low-resource kept — the standard mixture-rebalancing pass before
# training. The rate lookup is a broadcast map; the filter is a pure scan
# predicate (no shuffle at all).
# --------------------------------------------------------------------------
# Per-stratum keep-thresholds as 2-hex-digit ceilings over the md5 bucket
# byte: a doc is kept when its bucket hex < threshold. Fixed-width lowercase
# hex compares lexicographically == numerically in BOTH dialects (the x44
# portable-hash trick), so no engine-specific hex parsing is needed.
# en 25/256, zh 50/256, others 75/256 — high-resource downsampled hardest.
_STRATA_HEX = {"en": "19", "zh": "32", "de": "4b", "es": "4b", "fr": "4b"}


def _strata_case_sql() -> str:
    whens = " ".join(f"WHEN lang = '{lang}' THEN '{hi}'" for lang, hi in _STRATA_HEX.items())
    return f"CASE {whens} ELSE '00' END"


@query(
    "x65_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM (
      SELECT lang, n_chars, doc_id,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    )
    WHERE b < ({_strata_case_sql()})
    GROUP BY lang ORDER BY lang
    """,
    certifies="stratified per-stratum-rate sampling (north-star curation)",
    tags=("llm", "curation"),
)
def x65(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thresh = F.lit("00")
    for lang, hi in _STRATA_HEX.items():
        thresh = F.when(F.col("lang") == lang, hi).otherwise(thresh)
    return (
        docs.filter(b < thresh)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# x66 — approximate-membership prefilter + exact anti-join (decontamination)
#
# The 100 TB runtime-filter shape for "drop corpus docs whose fingerprint
# appears in the eval set": a compact approximate-membership structure over
# the (small) contaminated fingerprint set — here the SET OF 16-BIT
# FINGERPRINT PREFIXES (≤65536 entries, a literal IN-set Catalyst compiles
# to a hash probe; same no-false-negative guarantee as a Bloom filter) —
# splits the corpus at the SCAN into provably-clean rows (prefix absent:
# pass through, never shuffled) and candidates (prefix present: EXACT
# broadcast anti-join, so false positives cannot drop good docs). The
# union equals the plain anti-join — which is exactly what the oracle
# checks.
# --------------------------------------------------------------------------
@query(
    "x66_prefilter_decontam",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE md5(CAST(d.n_chars AS VARCHAR)) NOT IN (
      SELECT md5(CAST(n_chars AS VARCHAR)) FROM documents WHERE source = 'src0'
    )
    ORDER BY d.doc_id
    """,
    certifies="approximate-membership prefilter + exact anti-join (runtime-filter shape, SURVEY §4)",
    tags=("llm", "curation", "scale"),
)
def x66(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("n_chars").cast("string"))
    corpus = docs.select("doc_id", "lang", "n_chars", fp.alias("__fp"))
    # no .distinct(): left_anti is unaffected by duplicate keys on the build
    # side and the prefix collect dedups in Python — dropping it removes a
    # shuffle from the build path.
    contam = docs.filter(F.col("source") == "src0").select(fp.alias("__fp"))
    # driver-side sketch: bounded by construction at 65536 prefixes, and a
    # fixed per-corpus serving input — memoized per fingerprint (r14) so
    # the sketch-build collect runs once, not per call
    from pipeline_etl_website_visits_spark.queries.llmops import fingerprint_memo

    prefixes = fingerprint_memo(
        sf_dir, "documents", "decontam_prefixes",
        lambda: sorted(
            {r[0] for r in contam.select(F.substring("__fp", 1, 4)).collect()}
        ),
    )
    pref = F.substring(F.col("__fp"), 1, 4)
    provably_clean = corpus.filter(~pref.isin(prefixes))
    candidates = corpus.filter(pref.isin(prefixes))
    verified_clean = candidates.join(F.broadcast(contam), "__fp", "left_anti")
    return provably_clean.unionByName(verified_clean).select("doc_id", "lang", "n_chars")


# --------------------------------------------------------------------------
# x67 — sessionized funnel depth
#
# Two window layers + one aggregation: (1) 30-min-gap sessionization via
# lag/cumulative-sum (the classic gaps-and-islands, one shuffle on
# user_id); (2) per-session funnel depth from order-insensitive min-when
# aggregates (first view / first click-after-view / first purchase-after-
# click), so tie order inside a second can't flip the result. Depth
# histogram is deterministic and matches DuckDB's identical window SQL.
# --------------------------------------------------------------------------
@query(
    "x67_session_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), tagged AS (
      SELECT user_id, event_type, sec,
             CASE WHEN sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
    ), sess AS (
      SELECT user_id, event_type, sec,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM tagged
    ), per_sess AS (
      SELECT user_id, sess_id,
             MIN(CASE WHEN event_type = 'view' THEN sec END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN sec END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN sec END) AS t_buy
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT CAST(CASE WHEN t_view IS NULL THEN 0
                WHEN t_click IS NULL OR t_click < t_view THEN 1
                WHEN t_buy IS NULL OR t_buy < t_click THEN 2
                ELSE 3 END AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM per_sess GROUP BY 1 ORDER BY 1
    """,
    certifies="gaps-and-islands sessionization + ordered funnel (SURVEY §2.10 windows; X-series events)",
    tags=("window", "events"),
)
def x67(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").cast("long").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    new_sess = F.when(
        F.col("sec") - F.lag("sec").over(w) > 1800, 1
    ).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("sec"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("sec"))).alias("t_buy"),
    )
    depth = (
        F.when(F.col("t_view").isNull(), 0)
        .when(F.col("t_click").isNull() | (F.col("t_click") < F.col("t_view")), 1)
        .when(F.col("t_buy").isNull() | (F.col("t_buy") < F.col("t_click")), 2)
        .otherwise(3)
    ).cast("int")
    return (
        per_sess.groupBy(depth.alias("depth"))
        .agg(F.count("*").cast("long").alias("n_sessions"))
    )


# --------------------------------------------------------------------------
# x72 — sliding event-time windows (1 h window, 15 min slide)
#
# Spark's F.window(slide) assigns each event to window_len/slide overlapping
# windows via an internal expand — the oracle reproduces exactly that
# assignment arithmetically (each event belongs to the 4 windows whose
# start lies in (sec-3600, sec] on 900 s boundaries). Certifies sliding
# windows beside x32's tumbling form.
# --------------------------------------------------------------------------
@query(
    "x72_sliding_windows",
    oracle="""
    WITH e AS (
      SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, value FROM events
    ), expanded AS (
      SELECT (sec // 900) * 900 - (3 - u.i) * 900 AS w_start, value
      FROM e, unnest(generate_series(0, 3)) AS u(i)
    )
    SELECT w_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
    FROM expanded
    GROUP BY w_start ORDER BY w_start
    """,
    certifies="sliding event-time windows (SURVEY §2.10 streaming constructs, batch twin)",
    tags=("window", "events"),
)
def x72(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("w_start"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# x73 — distribution window functions (ntile / percent_rank / cume_dist)
#
# The ranking-distribution family over a deterministic total order
# (n_chars, doc_id). percent_rank/cume_dist are exact rationals of row
# counts — integer-derived, so cross-engine double equality is safe at
# 6 dp rounding.
# --------------------------------------------------------------------------
@query(
    "x73_window_distribution",
    oracle="""
    SELECT doc_id,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(CAST(PERCENT_RANK() OVER w AS DOUBLE), 6) AS pct_rank,
           ROUND(CAST(CUME_DIST() OVER w AS DOUBLE), 6) AS cume,
           CAST(FIRST_VALUE(doc_id) OVER w AS BIGINT) AS shortest_doc
    FROM documents
    WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
    ORDER BY doc_id
    """,
    certifies="ntile/percent_rank/cume_dist/first_value distribution windows (SURVEY §2.10)",
    tags=("window",),
)
def x73(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w).cast("double"), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w).cast("double"), 6).alias("cume"),
        F.first_value("doc_id").over(w).cast("long").alias("shortest_doc"),
    )


# --------------------------------------------------------------------------
# x74 — unpivot / melt (wide → long)
#
# Spark DataFrame.unpivot (the Expand-based melt); the oracle uses the
# portable UNION ALL formulation — semantics, not syntax, must match.
# --------------------------------------------------------------------------
@query(
    "x74_unpivot_metrics",
    oracle="""
    SELECT o_orderkey, metric, val FROM (
      SELECT o_orderkey, 'totalprice_floor' AS metric,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'order_year', CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS BIGINT) FROM orders
    )
    ORDER BY o_orderkey, metric
    """,
    certifies="unpivot/melt wide-to-long (SURVEY §2.10)",
    tags=("reshape",),
)
def x74(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("totalprice_floor"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.col("o_custkey").cast("long").alias("custkey"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["totalprice_floor", "order_year", "custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# --------------------------------------------------------------------------
# x75 — interval-overlap join (bucketed, no cross product)
#
# Intervals derived deterministically from events: [ts, ts + value minutes]
# per user. The oracle runs the plain theta join (fine at sf0.01); Spark
# runs the bucketed equi-join from operators/rangejoin.py — same result,
# linear shuffle instead of the quadratic nested loop that a theta join
# plans at scale.
# --------------------------------------------------------------------------
@query(
    "x75_interval_overlap_join",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT) + CAST(FLOOR(value * 60) AS BIGINT) AS e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.event_id AS a_id, b.event_id AS b_id
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.s <= b.e AND b.s <= a.e
    ORDER BY a_id, b_id
    """,
    certifies="interval-overlap join via bucketed equi-join (SURVEY §2.10 'no range/as-of/interval joins')",
    tags=("join", "events", "scale"),
)
def x75(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.rangejoin import interval_overlap_pairs

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # second-truncate the START too: the oracle works in whole epoch seconds,
    # and a microsecond left on the Spark side flips touch-at-endpoint pairs
    # (caught at sf0.1: one boundary pair off).
    sec = F.col("ts").cast("timestamp").cast("long")
    iv = ev.select(
        "user_id",
        "event_id",
        sec.cast("timestamp").alias("start_ts"),
        (sec + F.floor(F.col("value") * 60).cast("long")).cast("timestamp").alias("end_ts"),
    )
    return interval_overlap_pairs(
        iv, "user_id", "start_ts", "end_ts", "event_id", bucket_seconds=3600
    ).select(F.col("a_id").cast("long"), F.col("b_id").cast("long"))


# --------------------------------------------------------------------------
# x92 — exact heavy hitters via sketch-then-verify (Misra–Gries candidates)
#
# "Which tokens are ≥ 1/256 of the corpus" WITHOUT shuffling the vocabulary
# long tail: per-partition mergeable Misra–Gries summaries nominate a
# provably-complete candidate set (≤ capacity×n_partitions tokens), then an
# exact recount over candidates-only makes the answer exact. The oracle is
# the brute-force groupBy — the operator must equal it exactly.
# --------------------------------------------------------------------------
@query(
    "x92_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM_C}, ' ')) AS token FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM toks),
    cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY token)
    SELECT token, cnt FROM cnt, tot WHERE cnt * 256 >= n ORDER BY cnt DESC, token
    """,
    certifies="exact heavy hitters / frequent-token mining served from the stored vocabulary-count artifact (shared_token_counts; oracle re-derives from documents inline, certifying the stored counts); the one-pass sketch-then-verify operator (text.heavy_hitters MG + exact recount) is the no-artifact path, exactness-pinned in tests (north-star §0.3)",
    tags=("llm", "text", "scale"),
)
def x92(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.queries.llmops import shared_token_counts

    # served from the STORED vocabulary-count artifact (VERDICT r12
    # item 3, the x22 pair-overlap precedent): heavy hitters are a filter
    # over the vocab-sized (token, cnt) relation; the oracle re-derives
    # every count from documents inline, so the hash-match certifies the
    # stored counts. The sketch-then-verify operator (text.heavy_hitters,
    # the inline/no-artifact path) keeps its own exactness tests —
    # test_curation_ops pins it equal to brute force on planted corpora.
    tc = shared_token_counts(spark, sf_dir)
    n = tc.agg(F.sum("cnt").cast("long").alias("__n"))
    return (
        tc.join(F.broadcast(n))  # benign broadcast-of-one-scalar-row
        .filter(F.col("cnt") * 256 >= F.col("__n"))
        .select("token", "cnt")
        .orderBy(F.col("cnt").desc(), "token")
    )


# --------------------------------------------------------------------------
# x100 — deterministic weighted sampling without replacement (A-ES keys)
#
# Efraimidis–Spirakis reservoir sampling made deterministic: each doc gets
# u ~ Uniform(0,1) derived from md5(doc_id) (content-independent, identical
# on every run and engine), and the 25 smallest exponential keys
# -ln(u)/w win — equivalent to sampling without replacement with
# probability ∝ w (here w = n_chars: longer docs proportionally more
# likely, the quality-weighted curation draw). Distributed shape =
# TakeOrdered partial top-k per partition, same as x50. Rows-only driver
# check; tests pin the exact selected set against a pure-Python replica
# of the same formula.
# --------------------------------------------------------------------------
_WS_K = 25


@query(
    "x100_weighted_sample",
    # ln() ulp portability is a real risk class, but verified empirically:
    # the selected set matches a pure-Python replica AND this oracle at
    # sf0.001/0.01/0.1 — the top-k boundary gaps dwarf last-ulp noise.
    oracle=f"""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM (
      SELECT doc_id, n_chars,
             -ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 0.5)
                 / 281474976710656.0) / n_chars AS k
      FROM documents
    ) ORDER BY k, doc_id LIMIT {_WS_K}
    """,
    certifies="weighted sampling without replacement (A-ES exponential keys from md5-uniforms)",
    tags=("llm", "curation"),
)
def x100(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u48 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast("long")
    )
    u = (u48 + F.lit(0.5)) / F.lit(float(1 << 48))
    key = -F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"), key.alias("__k"))
        .orderBy(F.col("__k").asc(), "doc_id")
        .limit(_WS_K)
        .select("doc_id", "n_chars")
    )


# --------------------------------------------------------------------------
# x105 — token-budgeted mixture (per-source budget, deterministic order)
#
# The budgeted cousin of x53's count quota: each source contributes docs in
# content-independent md5 order until its character budget is exhausted
# (the "take N tokens per source" mixture recipe). One per-source window
# cumsum + filter + agg — the window partitions by source, so at 100 TB
# each source's running sum is an independent partition-local sort, no
# global ordering anywhere.
# --------------------------------------------------------------------------
_MIX_BUDGET_CHARS = 20_000


@query(
    "x105_token_budget_mixture",
    oracle=f"""
    WITH ordered AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(cum) AS BIGINT) AS chars_taken,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM ordered WHERE cum <= {_MIX_BUDGET_CHARS}
    GROUP BY source ORDER BY source
    """,
    certifies="token/char-budgeted mixture sampling per source (north-star §0.3 curation; x53's budget twin)",
    tags=("llm", "curation"),
)
def x105(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    taken = docs.select(
        "source", "doc_id", "n_chars", F.sum("n_chars").over(w).alias("cum")
    ).filter(F.col("cum") <= _MIX_BUDGET_CHARS)
    return (
        taken.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("cum").cast("long").alias("chars_taken"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# x112 — duplicate-span scrubbing (the rewrite side of dedup)
#
# Every other dedup query FINDS duplication (pairs, clusters, keep-sets);
# this one emits the CLEANED CORPUS: tokens covered by a 5-gram that also
# occurs in an earlier document are deleted (the earliest doc keeps its
# copy; intra-doc repeats untouched), and each document's surviving tokens
# are rejoined in original order — the C4/Dolma span-scrub step. The Spark
# side never sorts tokens back together: the removed positions are a SET
# per doc and the rewrite is an indexed array filter (order preserved by
# construction). Oracle replays the identical keep-first span semantics
# with positional grams + string_agg ORDER BY idx.
# --------------------------------------------------------------------------
@query(
    "x112_dup_span_scrub",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_C}, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, i AS start,
             md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]) AS gh
      FROM toks, unnest(generate_series(1, GREATEST(len(t) - 4, 0))) AS u(i)
    ), dup AS (
      SELECT gh, MIN(doc_id) AS keep_doc
      FROM grams GROUP BY gh HAVING COUNT(*) > 1
    ), covered AS (
      SELECT DISTINCT g.doc_id, g.start + o.off AS idx
      FROM grams g JOIN dup d ON g.gh = d.gh,
           unnest(generate_series(0, 4)) AS o(off)
      WHERE g.doc_id > d.keep_doc
    ), tokpos AS (
      SELECT doc_id, i AS idx, t[i] AS tok
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    ), kept AS (
      SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.idx) AS txt
      FROM tokpos tp LEFT JOIN covered c ON tp.doc_id = c.doc_id AND tp.idx = c.idx
      WHERE c.idx IS NULL GROUP BY tp.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(cv.n_rm, 0) AS BIGINT) AS n_removed,
           COALESCE(k.txt, '') AS text_clean
    FROM documents d
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_rm FROM covered GROUP BY doc_id) cv
           ON d.doc_id = cv.doc_id
    LEFT JOIN kept k ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    """,
    certifies="cross-document duplicate-span scrubbing with keep-first semantics — the corpus REWRITE step of dedup (C4-style), order-preserving reassembly",
    tags=("llm", "dedup", "text", "scale"),
)
def x112(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import dedup as D

    # A/B r14: the toktab artifact made this one SLOWER (2.14 vs 0.89 s at
    # sf0.1) — the checkpointed token-ARRAY relation re-reads worse than
    # the text re-scan (the r13 columnar-token-caching finding); inline
    # normalize stays the serving form, the tokens_of seam remains for
    # corpora that arrive pre-tokenized.
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return D.scrub_duplicate_spans(docs, "text", "doc_id", n=5)


# --------------------------------------------------------------------------
# x115 — intra-document repetition scrubbing (map-only corpus rewrite)
#
# The rewrite twin of x52's repetition METRICS and the intra-doc half of
# span dedup (x112 handles cross-document spans): tokens covered by a
# 3-gram whose identical gram occurred earlier in the SAME document are
# deleted, first occurrence kept. Repetition is a per-document property,
# so the whole rewrite is array higher-order functions in one projection
# — MAP-ONLY, zero shuffles, no joins (plan-asserted): the strongest
# possible scale shape for a corpus rewrite.
# --------------------------------------------------------------------------
@query(
    "x115_repetition_scrub",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_C}, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, i AS start, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, unnest(generate_series(1, GREATEST(len(t) - 2, 0))) AS u(i)
    ), firsts AS (
      SELECT doc_id, g, MIN(start) AS first_start FROM grams GROUP BY doc_id, g
    ), covered AS (
      SELECT DISTINCT gr.doc_id, gr.start + o.off AS idx
      FROM grams gr JOIN firsts f ON gr.doc_id = f.doc_id AND gr.g = f.g,
           unnest(generate_series(0, 2)) AS o(off)
      WHERE gr.start > f.first_start
    ), tokpos AS (
      SELECT doc_id, i AS idx, t[i] AS tok
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    ), kept AS (
      SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.idx) AS txt
      FROM tokpos tp LEFT JOIN covered c ON tp.doc_id = c.doc_id AND tp.idx = c.idx
      WHERE c.idx IS NULL GROUP BY tp.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(cv.n_rm, 0) AS BIGINT) AS n_removed,
           COALESCE(k.txt, '') AS text_clean
    FROM documents d
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_rm FROM covered GROUP BY doc_id) cv
           ON d.doc_id = cv.doc_id
    LEFT JOIN kept k ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    """,
    certifies="intra-document repetition scrubbing (Gopher-style rewrite, keep-first): map-only array-HOF corpus rewrite, zero shuffles",
    tags=("llm", "text", "dedup", "scale"),
)
def x115(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T

    # A/B r14: toktab serving measured SLOWER here too (1.08 vs 0.71 s at
    # sf0.1 — array scan beats regex only when the op is array-bound, not
    # HOF-bound); inline stays, the tokens_of seam remains available.
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return T.scrub_repeated_spans(docs, "text", "doc_id", n=3)


# --------------------------------------------------------------------------
# x132 — schema evolution on read (mergeSchema + rename map), oracle-backed
#
# The sources.read_parquet_evolving contract as a value-level certificate:
# a corpus directory written in two eras — era1 (doc_id, text), era2
# (doc_id, body, lang) where "body" is the renamed text column — reads as
# ONE relation with NULL backfill and old→new coalescing, and an
# aggregate over it hash-matches an oracle that derives the same
# era-dependent values straight from the documents table (era membership
# is doc_id-deterministic: odd ids are era2). The scratch eras are built
# once per corpus fingerprint with the stored-index build discipline
# (pid-tagged tmp + atomic rename commit), so repeat gate/bench runs
# never rebuild or race.
# --------------------------------------------------------------------------
@query(
    "x132_schema_evolution",
    oracle="""
    SELECT CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM documents
    GROUP BY 1 ORDER BY 1 NULLS FIRST
    """,
    certifies="schema evolution on read: mergeSchema unions per-file footers (NULL backfill for pre-evolution files) + rename-map coalescing, zero rewrites — value-certified against the flat source",
    tags=("sources", "scale"),
)
def x132(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )
    from pipeline_etl_website_visits_spark.sources.generic import (
        read_parquet_evolving,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _scratch_path(sf_dir, "documents", "evolve")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        era1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        era2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", F.col("text").alias("body"), "lang"
        )
        era1.write.parquet(os.path.join(tmp, "era1"))
        era2.write.parquet(os.path.join(tmp, "era2"))
        # top-level commit marker: the per-era _SUCCESS files sit inside
        # the era dirs; the rename is atomic but a reader probes this one
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        _commit_scratch_build(tmp, path)
    merged = read_parquet_evolving(spark, path + "/era*", renames={"body": "text"})
    return (
        merged.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
        .orderBy(F.col("lang").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# x139 — per-document token entropy (micro-nats, engine-exact)
#
# The repetition/diversity quality signal: H = ln n − (1/n)·Σ c·ln c over
# the doc's token counts. ln is evaluated only on INTEGER counts and
# quantized per value (FLOOR(ln(k)·1e6) — the x130 zipf discipline), so
# everything after the per-value quantization is exact integer math and
# both engines agree digit-for-digit. One exchange: repartition(doc)
# then both groupBys reuse the partitioning (plan-asserted).
# --------------------------------------------------------------------------
@query(
    "x139_token_entropy",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_C}, ' ')) AS token FROM documents
    ), tc AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id, token
    ), agg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * CAST(FLOOR(LN(c) * 1000000) AS BIGINT)) AS BIGINT) AS s
      FROM tc GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, n AS n_tokens,
           CAST(CAST(FLOOR(LN(n) * 1000000) AS BIGINT) - (s // n) AS BIGINT) AS entropy_micro
    FROM agg ORDER BY doc_id
    """,
    certifies="X4 per-doc token entropy in integer micro-nats (quantized-ln + exact integer algebra — the zipf_slope exactness discipline)",
    tags=("llm", "text", "scale"),
)
def x139(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T
    from pipeline_etl_website_visits_spark.queries.llmops import shared_tokenized_corpus

    toks = shared_tokenized_corpus(spark, sf_dir)
    return T.token_entropy(toks, "toks")


# --------------------------------------------------------------------------
# x144 — ORC as a source/sink format (columnar-format portability)
#
# The fact projection is snapshotted ONCE per corpus fingerprint as an
# ORC dataset partitioned by l_returnflag (the x132/x117 scratch-build
# discipline: pid-tagged tmp + atomic rename, _SUCCESS probed), then
# the pricing aggregate runs ON THE ORC SNAPSHOT — certifying the ORC
# scan path (schema, partition discovery, predicate pushdown) carries
# the same values as the parquet original the oracle reads. Spark's
# ORC reader is vectorized + pushdown-capable like parquet; at 100 TB
# the format choice is a storage decision, not a semantics one, and
# this pins that.
# --------------------------------------------------------------------------
@query(
    "x144_orc_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1995-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    certifies="ORC source/sink round trip: write-once ORC snapshot (partitioned by returnflag) read back through Spark's vectorized ORC scan with filter pushdown; exact DECIMAL sums match the parquet-derived oracle",
    tags=("sources", "formats"),
)
def x144(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )

    path = _scratch_path(sf_dir, "lineitem", "orcrt")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate")
            .write.partitionBy("l_returnflag")
            .orc(tmp)
        )
        _commit_scratch_build(tmp, path)
    orc = spark.read.orc(path)
    return (
        orc.where(F.col("l_shipdate") <= F.lit("1995-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double"), 2).alias("sum_price"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# x145 — k-anonymity audit + keyed-hash pseudonymization (privacy ops)
#
# The governance twin of the GDPR forget path: quasi-identifier groups
# (segment, nation, coarse balance bucket) with k < 5 members are
# re-identification risks that a release pipeline must suppress or
# generalize. The direct identifier is pseudonymized with a keyed hash
# (md5 over a peppered name — deterministic, so joins still work
# post-masking) and only the group-level min pseudonym leaves the
# query. One scan + one partial-aggregated shuffle on the tiny QI
# domain; at 100 TB the violating-group list is the sparse tail.
# --------------------------------------------------------------------------
@query(
    "x145_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS segment, CAST(c_nationkey AS INT) AS nationkey,
             CAST(FLOOR(c_acctbal / 2000) AS INT) AS bal_bucket,
             md5('pepper:' || c_name) AS pseud
      FROM customer
    )
    SELECT segment, nationkey, bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS k,
           MIN(pseud) AS group_tag
    FROM q GROUP BY segment, nationkey, bal_bucket
    HAVING COUNT(*) < 5
    ORDER BY segment, nationkey, bal_bucket
    """,
    certifies="privacy governance: k-anonymity audit over quasi-identifier groups (k<5 violations) + deterministic keyed-hash pseudonymization of the direct identifier — cross-engine identical md5 masking",
    tags=("governance", "privacy"),
)
def x145(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    q = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_bucket"),
        F.md5(F.concat(F.lit("pepper:"), F.col("c_name")).cast("binary")).alias("pseud"),
    )
    return (
        q.groupBy("segment", "nationkey", "bal_bucket")
        .agg(F.count("*").cast("long").alias("k"), F.min("pseud").alias("group_tag"))
        .where(F.col("k") < 5)
        .orderBy("segment", "nationkey", "bal_bucket")
    )


# --------------------------------------------------------------------------
# x157 — token-budget mixture planning (the allocation step before x51's
# sampling executes it)
#
# Weights derive from the source bucket (the x51 idiom — scale-free, no
# name list): src%4==0 -> 400 per-mille of budget, ==1 -> 300, ==2 -> 200,
# else 100; repetition capped at 2 epochs. Budget 20,000 tokens puts
# sf0.01 sources cap-bound and sf0.1 sources target-bound — both branches
# of the LEAST exercise under the driver gate.
# --------------------------------------------------------------------------
@query(
    "x157_token_budget_mixture",
    oracle="""
    WITH a AS (
      SELECT source,
             CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END) AS BIGINT)
               AS available_tokens
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, available_tokens,
             CAST(CASE CAST(substring(source, 4) AS INT) % 4
                  WHEN 0 THEN 400 WHEN 1 THEN 300 WHEN 2 THEN 200 ELSE 100 END
                  AS BIGINT) AS wt
      FROM a
    )
    SELECT source, available_tokens,
           CAST(20000 * wt // 1000 AS BIGINT) AS target_tokens,
           CAST(LEAST(20000 * wt // 1000, available_tokens * 2000 // 1000) AS BIGINT)
             AS granted_tokens,
           CAST(CASE WHEN available_tokens = 0 THEN 0 ELSE
                LEAST(20000 * wt // 1000, available_tokens * 2000 // 1000)
                * 1000 // available_tokens END AS BIGINT) AS epochs_permille,
           CAST(20000 * wt // 1000
                - LEAST(20000 * wt // 1000, available_tokens * 2000 // 1000)
                AS BIGINT) AS unmet_tokens
    FROM w ORDER BY source
    """,
    certifies="X4 token-budget mixture planning: per-source allocation under weight + repetition cap, exact integer arithmetic, one partial-agged exchange (north-star §0.3)",
    tags=("llm", "curation", "stats"),
)
def x157(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.text import token_budget_mixture

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.col("source"), 4, 10).cast("int") % 4
    w = (
        F.when(bucket == 0, F.lit(400))
        .when(bucket == 1, F.lit(300))
        .when(bucket == 2, F.lit(200))
        .otherwise(F.lit(100))
    )
    return token_budget_mixture(
        docs, "text", "source", w, budget_tokens=20_000, cap_per_mille=2000
    )


# --------------------------------------------------------------------------
# x159 — l-diversity audit (the k-anonymity complement, x145)
#
# k-anonymity alone leaks when a quasi-identifier group is homogeneous in
# the SENSITIVE attribute (everyone in the group shares it). Per
# (segment, bal_bucket) QI group: group size k and distinct sensitive
# nationkeys l; emit the l < 3 violations a release gate would block.
# --------------------------------------------------------------------------
@query(
    "x159_l_diversity",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(FLOOR(c_acctbal / 2000) AS INT) AS bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS l
    FROM customer
    GROUP BY segment, bal_bucket
    HAVING COUNT(DISTINCT c_nationkey) < 3
    ORDER BY segment, bal_bucket
    """,
    certifies="privacy governance: l-diversity audit (sensitive-attribute homogeneity within quasi-identifier groups — the x145 k-anonymity complement)",
    tags=("governance", "privacy"),
)
def x159(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_bucket"),
            F.col("c_nationkey").alias("sensitive"),
        )
        .groupBy("segment", "bal_bucket")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.countDistinct("sensitive").cast("long").alias("l"),
        )
        .where(F.col("l") < 3)
        .orderBy("segment", "bal_bucket")
    )


# --------------------------------------------------------------------------
# x160 — zlib compression-ratio quality signal (rows-only: no DEFLATE in
# an ANSI oracle; certified by the direct-zlib exactness test)
# --------------------------------------------------------------------------
@query(
    "x160_compression_ratio",
    oracle=None,
    certifies="X4 compression-ratio quality signal (boilerplate/junk tails): Arrow mapInPandas map-only pass, integer per-mille ratios; exactness test vs direct zlib",
    tags=("llm", "text", "quality", "no-oracle"),
)
def x160(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.text import compression_ratio

    docs = load_table(spark, sf_dir, "documents")
    return compression_ratio(docs, "text", "doc_id")


import os as _os

_BM25_STATS_CACHE: dict[tuple, tuple[int, int]] = {}


def _bm25_corpus_stats(docs, sf_dir: str) -> tuple[int, int]:
    """Corpus stats (N docs, total tokens) collected once per corpus
    FINGERPRINT and reused across calls — the same trained-artifact
    serving shape as _pq_codebook (x82/x84): a real deployment computes
    these once, like a stored index's metadata, so the retrieval queries
    shouldn't re-scan the corpus for two scalars on every call. Keyed by
    the source file's (path, size, mtime_ns) so regenerated test data
    can never be served stale stats. The values are exactly what the
    in-query aggregation (and the SQL oracle) computes, so results are
    bit-identical either way."""
    import pyspark.sql.functions as _F

    def build() -> tuple[int, int]:
        from pipeline_etl_website_visits_spark.operators.dedup import normalize_text

        row = docs.select(
            _F.size(_F.split(normalize_text(_F.col("text")), " ")).cast("long").alias("dl")
        ).agg(_F.count("*").cast("long").alias("n"), _F.sum("dl").cast("long").alias("tl")).collect()[0]
        return (int(row["n"]), int(row["tl"]))

    src = _os.path.join(sf_dir, "documents.parquet")
    try:
        st = _os.stat(src)
    except OSError:
        return build()  # unstat-able source: never memoize blind (ADVICE r14)
    key = (src, st.st_size, st.st_mtime_ns)
    stats = _BM25_STATS_CACHE.get(key)
    if stats is None:
        stats = _BM25_STATS_CACHE[key] = build()
    return stats


_BM25_QUERIES = {
    "q_join": "fast hash join",
    "q_scan": "table scan filter",
    "q_sort": "sort merge window",
}
_BM25_Q_VALUES = ", ".join(f"('{k}', '{v}')" for k, v in sorted(_BM25_QUERIES.items()))


# Shared BM25 CTE chain (query terms -> integer-quantized per-(query,doc)
# scores) used by both the x163 oracle and the x165 hybrid-fusion oracle.
_BM25_PERDOC_CTES = f"""\
    WITH q(query_id, qtext) AS (VALUES {_BM25_Q_VALUES}),
    qterms AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT query_id,
               unnest(string_split(regexp_replace(lower(trim(qtext)), '\\s+', ' ', 'g'), ' ')) AS term
        FROM q
      ) WHERE term <> ''
    ),
    toks AS (SELECT doc_id, string_split({_NORM_C}, ' ') AS lst FROM documents),
    dl AS (SELECT doc_id, CAST(len(lst) AS BIGINT) AS dl FROM toks),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
    pairs AS (SELECT doc_id, unnest(lst) AS term FROM toks),
    tf AS (
      SELECT p.doc_id, p.term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM pairs p JOIN (SELECT DISTINCT term FROM qterms) t USING (term)
      GROUP BY p.doc_id, p.term
    ),
    wdf AS (
      SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df_t FROM tf
    ),
    scored AS (
      SELECT w.doc_id, w.term,
             CAST(FLOOR(LN(2.0 * (s.n_docs + 1) / (2 * w.df_t + 1)) * 1000000) AS BIGINT) AS idf_micro,
             CAST(w.tf * 2200 * 1000 * s.total_len AS BIGINT) AS num,
             CAST(1000000 * s.total_len * w.tf + 1200 * 250 * s.total_len
                  + 1200 * 750 * d.dl * s.n_docs AS BIGINT) AS den
      FROM wdf w CROSS JOIN stats s JOIN dl d ON w.doc_id = d.doc_id
    ),
    contrib AS (
      SELECT qt.query_id, sc.doc_id,
             CAST(FLOOR(CAST(sc.idf_micro AS DOUBLE) * CAST(sc.num AS DOUBLE)
                        / CAST(sc.den AS DOUBLE)) AS BIGINT) AS c
      FROM scored sc JOIN qterms qt USING (term)
    ),
    perdoc AS (
      SELECT query_id, doc_id,
             CAST(SUM(c) AS BIGINT) AS score_micro,
             CAST(COUNT(*) AS BIGINT) AS n_terms_matched
      FROM contrib GROUP BY query_id, doc_id
    )
"""


@query(
    "x163_bm25_retrieval",
    oracle=f"""
    {_BM25_PERDOC_CTES}
    SELECT query_id, doc_id, score_micro, n_terms_matched, CAST(rnk AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, doc_id) AS rnk
      FROM perdoc
    ) WHERE rnk <= 10 ORDER BY query_id, rank
    """,
    certifies="X4 BM25 top-k retrieval (lexical RAG serving): broadcast query-term filter before the one (doc,term) aggregation shuffle; integer-quantized scoring (the x58 discipline extended to BM25 length normalization)",
    tags=("llm", "text", "retrieval"),
)
def x163(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_topk(
        docs, "text", "doc_id", _BM25_QUERIES, k=10,
        corpus_stats=_bm25_corpus_stats(docs, sf_dir),
    )


# vec_id -> BM25 query_id pairing for the hybrid query: the three probe
# vectors stand in for "the embedding of the query" (the synthetic tables
# have no query-encoder; the fusion contract only needs consistent ids).
_HYBRID_DQ_VALUES = "(0, 'q_join'), (1, 'q_scan'), (2, 'q_sort')"


@query(
    "x165_hybrid_rrf",
    oracle=f"""
    {_BM25_PERDOC_CTES},
    lex AS (
      SELECT query_id, doc_id, CAST(rnk AS INT) AS rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_micro DESC, doc_id) AS rnk
        FROM perdoc
      ) WHERE rnk <= 50
    ),
    dq(vec_id, query_id) AS (VALUES {_HYBRID_DQ_VALUES}),
    eq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 3),
    ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dsims AS (
      SELECT eq.vec_id AS qvid, ec.vec_id AS doc_id,
             list_dot_product(eq.v, ec.v)
               / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) AS sim_raw
      FROM eq JOIN ec ON eq.vec_id <> ec.vec_id
    ),
    dense AS (
      SELECT dq.query_id, d.doc_id, CAST(d.rnk AS INT) AS rank
      FROM (
        SELECT qvid, doc_id,
               ROW_NUMBER() OVER (PARTITION BY qvid ORDER BY sim_raw DESC, doc_id) AS rnk
        FROM dsims
      ) d JOIN dq ON dq.vec_id = d.qvid
      WHERE d.rnk <= 50
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_micro,
             CAST(COUNT(*) AS INT) AS n_legs
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM dense)
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_micro, n_legs, CAST(rnk AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_micro DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= 10 ORDER BY query_id, rank
    """,
    certifies="X3+X4 hybrid retrieval: BM25 lexical leg + exact-cosine dense leg fused by integer Reciprocal Rank Fusion; fusion cost is rank-bounded, never corpus-bounded",
    tags=("llm", "retrieval", "similarity"),
)
def x165(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (the RAG-serving shape): top-50 BM25 leg over
    documents.text + top-50 exact-cosine leg over embeddings (probe
    vectors vec_id 0-2 paired to the three query strings), fused with
    RRF (c=60) into a final top-10 per query. Both legs' plans are the
    certified x163/x25 shapes; the fusion itself is a tiny union-agg.
    """
    from pipeline_etl_website_visits_spark.operators import similarity as S
    from pipeline_etl_website_visits_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = T.bm25_topk(
        docs, "text", "doc_id", _BM25_QUERIES, k=50,
        corpus_stats=_bm25_corpus_stats(docs, sf_dir),
    ).select("query_id", "doc_id", "rank")
    from pipeline_etl_website_visits_spark.queries.llmops import fingerprint_memo

    q3 = emb.filter(F.col("vec_id") < 3)
    dense = S.cosine_topk(
        q3, emb, k=50, with_rank=True,
        # memoized probe collect (the x179/x182 fixed-serving-input rule)
        precollected_queries=fingerprint_memo(
            sf_dir, "embeddings", "probe_vecs3",
            lambda: [
                (r["vec_id"], r["embedding"])
                for r in q3.select("vec_id", "embedding").collect()
            ],
        ),
    )
    qid = (
        F.when(F.col("query_id") == 0, F.lit("q_join"))
        .when(F.col("query_id") == 1, F.lit("q_scan"))
        .otherwise(F.lit("q_sort"))
    )
    dense_leg = dense.select(
        qid.alias("query_id"), F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return S.reciprocal_rank_fusion([lex, dense_leg], k=10, c=60)


@query(
    "x166_dsir_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split({_NORM_C}, ' ') AS t FROM documents
    ),
    buck AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]), 1, 12)) AS BIGINT) % 1024 AS b
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    tprof AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t_cnt FROM buck WHERE source = 'src0' GROUP BY b),
    tstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM buck WHERE source = 'src0'),
    rprof AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r_cnt FROM buck GROUP BY b),
    rstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS rr FROM buck),
    w AS (
      SELECT r.b,
             CAST(FLOOR(LN(
               CAST((COALESCE(t.t_cnt, 0) + 1) * (rs.rr + 1024) AS DOUBLE)
               / CAST((r.r_cnt + 1) * (ts.tt + 1024) AS DOUBLE)
             ) * 1000000) AS BIGINT) AS w_micro
      FROM rprof r LEFT JOIN tprof t USING (b)
      CROSS JOIN tstat ts CROSS JOIN rstat rs
    )
    SELECT bk.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(w.w_micro) AS BIGINT) AS score_micro
    FROM buck bk JOIN w USING (b)
    GROUP BY bk.doc_id ORDER BY bk.doc_id
    """,
    certifies="X4 DSIR importance scoring (hashed-bigram log-likelihood ratio vs a target domain) SERVED from the stored compacted-bigram artifact (docbig — VERDICT r13 item 4): bucket fold + broadcast ≤buckets-row profiles, zero corpus re-tokenize; integer-exact weights (one ln over an int64 rational); oracle still derives inline, certifying the artifact end-to-end",
    tags=("llm", "text", "curation", "stored-index"),
)
def x166(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR scores for every document against the src0 domain as target,
    served from the shared compacted-bigram artifact
    (llmops.shared_doc_bigrams): the (doc, bucket) relation is a fold of
    the stored (doc, w1, w2, c) counts through the SAME dsir_bucket_of
    expression the inline stream hashes, and the src0 rows yield the
    target profile — neither corpus nor target is re-tokenized. Docstring
    cite: the method is public (Xie et al. 2023); the reference repo has
    no counterpart — this is §2.11 north-star surface."""
    from pipeline_etl_website_visits_spark.operators.text import (
        dsir_bucket_of,
        dsir_scores_from_marked_counts,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import shared_doc_bigrams

    bg = shared_doc_bigrams(spark, sf_dir)
    # target (src0) is a marked subset of the corpus, so ONE (doc,b,c,t_c)
    # relation feeds both profiles, both totals and the scoring join —
    # r14: the separate corpus_docb/tprof form scanned the artifact 4x
    # (profile, target profile, and both totals each recomputed the fold)
    docb = bg.select(
        "doc_id",
        dsir_bucket_of(
            F.concat_ws(" ", F.col("w1"), F.col("w2")), 1024, portable_hash=True
        ).alias("b"),
        "c",
        F.when(F.col("source") == "src0", F.col("c")).otherwise(F.lit(0)).alias("t_c"),
    )
    return dsir_scores_from_marked_counts(docb, buckets=1024)


@query(
    "x167_t_closeness",
    oracle="""
    WITH base AS (
      SELECT c_mktsegment AS segment,
             CAST(FLOOR(c_acctbal / 2000) AS INT) AS bal_bucket,
             c_nationkey AS s
      FROM customer
    ),
    gs AS (
      SELECT segment, bal_bucket, s, CAST(COUNT(*) AS BIGINT) AS cnt_gs
      FROM base GROUP BY segment, bal_bucket, s
    ),
    g AS (
      SELECT segment, bal_bucket, CAST(SUM(cnt_gs) AS BIGINT) AS n_g
      FROM gs GROUP BY segment, bal_bucket
    ),
    sglob AS (
      SELECT s, CAST(SUM(cnt_gs) AS BIGINT) AS cnt_s FROM gs GROUP BY s
    ),
    tot AS (SELECT CAST(SUM(cnt_gs) AS BIGINT) AS n FROM gs),
    grid AS (
      SELECT g.segment, g.bal_bucket, g.n_g, sg.s, sg.cnt_s,
             COALESCE(gs.cnt_gs, 0) AS cnt_gs, t.n
      FROM g CROSS JOIN sglob sg
      LEFT JOIN gs ON gs.segment = g.segment AND gs.bal_bucket = g.bal_bucket AND gs.s = sg.s
      CROSS JOIN tot t
    )
    SELECT segment, bal_bucket,
           CAST(MAX(n_g) AS BIGINT) AS k,
           CAST((CAST(SUM(ABS(cnt_gs * n - cnt_s * n_g)) AS BIGINT) * 500000)
                // (MAX(n_g) * MAX(n)) AS BIGINT) AS tvd_micro
    FROM grid GROUP BY segment, bal_bucket
    ORDER BY segment, bal_bucket
    """,
    certifies="privacy governance: t-closeness audit (total-variation distance between each QI group's sensitive distribution and the global one) — completes the k-anonymity (x145) / l-diversity (x159) trio; exact integer cross-multiplied rationals, micro-quantized once",
    tags=("governance", "privacy"),
)
def x167(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TVD-based t-closeness per (segment, bal_bucket) QI group over the
    customer table (sensitive = nationkey). Exact arithmetic:
    |p_g(s) - p(s)| cross-multiplies to |cnt_gs*N - cnt_s*n_g| (int64),
    sums exactly, and quantizes once via integer division by (n_g*N) —
    bound: group-count x total products must stay under 2^63/1e6
    (documents fine through ~sf100; beyond that swap in DECIMAL(38,0)).
    Scale shape: everything derives from the ONE (group, s) aggregation;
    the grid is groups x |sensitive support| with both small sides
    broadcast — corpus rows are touched exactly once.
    """
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_bucket"),
        F.col("c_nationkey").alias("s"),
    )
    # gs feeds FOUR consumers (g, sglob, tot, the grid join) — cached for
    # the same one-scan reason as x184/x166 (≤ groups×|sensitive| rows);
    # scoped_cache bounds repeated callers to one cached fold (ADVICE r14)
    from pipeline_etl_website_visits_spark.operators.text import scoped_cache

    gs = scoped_cache(
        base.groupBy("segment", "bal_bucket", "s").agg(
            F.count("*").cast("long").alias("cnt_gs")
        ),
        "x167_gs",
    )
    g = gs.groupBy("segment", "bal_bucket").agg(F.sum("cnt_gs").cast("long").alias("n_g"))
    sglob = gs.groupBy("s").agg(F.sum("cnt_gs").cast("long").alias("cnt_s"))
    tot = gs.agg(F.sum("cnt_gs").cast("long").alias("n"))
    grid = (
        g.crossJoin(F.broadcast(sglob))
        .join(gs, ["segment", "bal_bucket", "s"], "left")
        .na.fill({"cnt_gs": 0})
        .crossJoin(F.broadcast(tot))
    )
    return (
        grid.groupBy("segment", "bal_bucket")
        .agg(
            F.max("n_g").cast("long").alias("k"),
            F.expr("CAST((SUM(ABS(cnt_gs * n - cnt_s * n_g)) * 500000) div (MAX(n_g) * MAX(n)) AS BIGINT)").alias(
                "tvd_micro"
            ),
        )
        .orderBy("segment", "bal_bucket")
    )


@query(
    "x170_stored_dsir_serving",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split({_NORM_C}, ' ') AS t FROM documents
    ),
    buck AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]), 1, 12)) AS BIGINT) % 1024 AS b
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    tprof AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t_cnt FROM buck WHERE source = 'src0' GROUP BY b),
    tstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM buck WHERE source = 'src0'),
    rprof AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r_cnt FROM buck GROUP BY b),
    rstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS rr FROM buck),
    w AS (
      SELECT r.b,
             CAST(FLOOR(LN(
               CAST((COALESCE(t.t_cnt, 0) + 1) * (rs.rr + 1024) AS DOUBLE)
               / CAST((r.r_cnt + 1) * (ts.tt + 1024) AS DOUBLE)
             ) * 1000000) AS BIGINT) AS w_micro
      FROM rprof r LEFT JOIN tprof t USING (b)
      CROSS JOIN tstat ts CROSS JOIN rstat rs
    )
    SELECT bk.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(w.w_micro) AS BIGINT) AS score_micro
    FROM buck bk JOIN w USING (b)
    GROUP BY bk.doc_id ORDER BY bk.doc_id
    """,
    certifies="X4 DSIR serving against a STORED weights artifact (train-once / score-many): one hash pass + broadcast weight lookup, zero profile computation at query time; bit-identical to x166 because the artifact froze the same integer weights",
    tags=("llm", "text", "curation", "stored-index"),
)
def x170(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-path certificate for the frozen-weights DSIR artifact:
    train weights ONCE per corpus fingerprint (target = src0, reference
    = the corpus — exactly x166's setup, so the x166 oracle applies
    verbatim), then score through
    operators/text.py:dsir_scores_vs_weights, which never touches the
    target again. The write-once scratch discipline is x144's."""
    import os

    from pipeline_etl_website_visits_spark.operators.text import (
        dsir_scores_vs_weights,
        save_dsir_weights,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _scratch_path(sf_dir, "documents", "dsirw")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        save_dsir_weights(
            docs.where(F.col("source") == "src0"), docs, tmp, buckets=1024, portable_hash=True
        )
        _commit_scratch_build(tmp, path)
    return dsir_scores_vs_weights(docs, path, "text", "doc_id")


@query(
    "x172_stored_bm25_serving",
    oracle=f"""
    {_BM25_PERDOC_CTES}
    SELECT query_id, doc_id, score_micro, n_terms_matched, CAST(rnk AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, doc_id) AS rnk
      FROM perdoc
    ) WHERE rnk <= 10 ORDER BY query_id, rank
    """,
    certifies="X4 BM25 serving from a STORED inverted index (bucket-partitioned postings; queries read only their terms' partitions — partition-pruned, zero corpus scan at serve time); x163's oracle verbatim, so the index is hash-certified faithful",
    tags=("llm", "text", "retrieval", "stored-index"),
)
def x172(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-path certificate for the stored BM25 inverted index:
    build once per corpus fingerprint (x144's write-once scratch
    discipline), then answer the standard three queries reading ONLY
    the query terms' tok_bucket partitions. Identical output to x163
    because the postings/stats are faithful — one oracle certifies
    both the index build and the pruned serve."""
    import os

    from pipeline_etl_website_visits_spark.operators.text import (
        bm25_index_topk,
        save_bm25_index,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _scratch_path(sf_dir, "documents", "bm25idx")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        save_bm25_index(docs, tmp, "text", "doc_id", tok_buckets=64)
        _commit_scratch_build(tmp, path)
    return bm25_index_topk(spark, path, _BM25_QUERIES, k=10)


@query(
    "x173_stored_hybrid_serving",
    oracle=f"""
    {_BM25_PERDOC_CTES},
    lex AS (
      SELECT query_id, doc_id, CAST(rnk AS INT) AS rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_micro DESC, doc_id) AS rnk
        FROM perdoc
      ) WHERE rnk <= 50
    ),
    dq(vec_id, query_id) AS (VALUES {_HYBRID_DQ_VALUES}),
    eq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 3),
    ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dsims AS (
      SELECT eq.vec_id AS qvid, ec.vec_id AS doc_id,
             list_dot_product(eq.v, ec.v)
               / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) AS sim_raw
      FROM eq JOIN ec ON eq.vec_id <> ec.vec_id
    ),
    dense AS (
      SELECT dq.query_id, d.doc_id, CAST(d.rnk AS INT) AS rank
      FROM (
        SELECT qvid, doc_id,
               ROW_NUMBER() OVER (PARTITION BY qvid ORDER BY sim_raw DESC, doc_id) AS rnk
        FROM dsims
      ) d JOIN dq ON dq.vec_id = d.qvid
      WHERE d.rnk <= 50
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_micro,
             CAST(COUNT(*) AS INT) AS n_legs
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM dense)
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_micro, n_legs, CAST(rnk AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_micro DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= 10 ORDER BY query_id, rank
    """,
    certifies="X3+X4 SERVED hybrid retrieval: both legs answered from STORED indexes — partition-pruned BM25 postings (x172's artifact) + the IVF-Flat exact-vector index — fused by integer RRF; x165's oracle verbatim, so build+serve+fusion certify in one hash. The build-once/serve-many completion of the x170/x172 pattern",
    tags=("llm", "retrieval", "similarity", "stored-index"),
)
def x173(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Served hybrid search: the x165 fusion answered WITHOUT touching the
    corpus at query time. The lexical leg reads only the query terms'
    tok_bucket partitions of the stored BM25 postings (the exact x172
    artifact, shared scratch); the dense leg reads the stored IVF-Flat
    index (full probe here — the exactness certificate; production sets
    nprobe < num_coarse for the pruned path) and delegates scoring to the
    certified cosine kernel. Output is bit-identical to the inline x165,
    certified by the same oracle; serving cost is pruned-postings +
    stored-cells, never a corpus tokenize or an embedding-table rescan.
    """
    import os

    from pipeline_etl_website_visits_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )
    from pipeline_etl_website_visits_spark.operators.text import (
        bm25_index_topk,
        save_bm25_index,
    )
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        build_ivfflat_index,
        ivfflat_search,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )

    # lexical leg: the SAME stored postings artifact x172 serves from
    docs = load_table(spark, sf_dir, "documents")
    bm25_path = _scratch_path(sf_dir, "documents", "bm25idx")
    if not os.path.exists(os.path.join(bm25_path, "_SUCCESS")):
        tmp = f"{bm25_path}.build.{os.getpid()}"
        save_bm25_index(docs, tmp, "text", "doc_id", tok_buckets=64)
        _commit_scratch_build(tmp, bm25_path)
    lex = bm25_index_topk(spark, bm25_path, _BM25_QUERIES, k=50).select(
        "query_id", "doc_id", "rank"
    )

    # dense leg: stored IVF-Flat index (meta/_SUCCESS is the build's
    # commit marker — written last by build_ivfflat_index)
    emb = load_table(spark, sf_dir, "embeddings")
    flat_path = _scratch_path(sf_dir, "embeddings", "ivfflat")
    if not os.path.exists(os.path.join(flat_path, "meta", "_SUCCESS")):
        tmp = f"{flat_path}.build.{os.getpid()}"
        build_ivfflat_index(emb, tmp, num_coarse=4)
        _commit_scratch_build(tmp, flat_path)
    from pipeline_etl_website_visits_spark.queries.llmops import fingerprint_memo

    q3 = emb.filter(F.col("vec_id") < 3)
    dense = ivfflat_search(
        spark, flat_path, q3, k=50, with_rank=True,
        # memoized probe collect (the x179/x182 fixed-serving-input rule)
        precollected_queries=fingerprint_memo(
            sf_dir, "embeddings", "probe_vecs3",
            lambda: [
                (r["vec_id"], r["embedding"])
                for r in q3.select("vec_id", "embedding").collect()
            ],
        ),
    )
    qid = (
        F.when(F.col("query_id") == 0, F.lit("q_join"))
        .when(F.col("query_id") == 1, F.lit("q_scan"))
        .otherwise(F.lit("q_sort"))
    )
    dense_leg = dense.select(
        qid.alias("query_id"), F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return reciprocal_rank_fusion([lex, dense_leg], k=10, c=60)


@query(
    "x174_common_span_mining",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_C}, ' ') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram
      FROM toks, unnest(generate_series(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 4
    ),
    keep AS (
      SELECT gram FROM (
        SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
      ) WHERE df <= 64
    ),
    gk AS (SELECT g.* FROM g JOIN keep USING (gram)),
    p AS (
      SELECT g1.doc_id AS a, g2.doc_id AS b, g1.pos AS pa, g1.pos - g2.pos AS d
      FROM gk g1 JOIN gk g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
    ),
    runs AS (
      SELECT a, b, d, pa - ROW_NUMBER() OVER (PARTITION BY a, b, d ORDER BY pa) AS isl
      FROM p
    ),
    spans AS (
      SELECT a, b, CAST(COUNT(*) + 3 AS BIGINT) AS span_len
      FROM runs GROUP BY a, b, d, isl
    )
    SELECT a AS doc_a, b AS doc_b,
           CAST(MAX(span_len) AS BIGINT) AS max_span_len,
           CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM spans GROUP BY a, b ORDER BY doc_a, doc_b
    """,
    certifies="X3 corpus-internal exact-substring duplicate mining (Lee et al. 2022 shape): anchor-gram positional join + gaps-and-islands run folding — (doc_a, doc_b, max_span_len, n_spans) integers, stop-gram bounded (df cap replicated in the oracle), never a text self-join; Spark side pairs on xxhash64(gram) (~Σdf²/2⁶⁴ spurious-pair odds — hash-probabilistic where the oracle's string join is exact, so a collision fails this gate rather than passing silently)",
    tags=("llm", "text", "dedup", "bounded"),
)
def x174(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine exact shared token runs (>=4 tokens) across the corpus —
    the repeated-substring signal Lee et al. deduplicate on, computed
    relationally: anchor 4-grams with positions join on gram equality
    (a < b, stop-grams with df > 64 dropped before the join — the bound
    is part of the certified semantics), one alignment offset per match,
    islands fold each maximal run to its exact length."""
    from pipeline_etl_website_visits_spark.operators.dedup import mine_common_spans

    docs = load_table(spark, sf_dir, "documents")
    return mine_common_spans(docs, "text", "doc_id", min_span=4, max_gram_doc_freq=64)


# Shared CTE chain for the bigram-LM perplexity oracles (x175 inline /
# x176 stored-model serving — the model relations and the scoring
# formula are the operator's docstring verbatim).
_LM_PPL_SQL = f"""\
    WITH toks AS (
      SELECT doc_id, source, string_split({_NORM_C}, ' ') AS t FROM documents
    ),
    tb AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE source = 'src0' AND len(t) >= 2
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM tb GROUP BY w1, w2),
    c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS nfwd
      FROM c12 GROUP BY w1
    ),
    rev AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nrev FROM c12 GROUP BY w2),
    consts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c12) AS nbt,
             (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
              FROM (SELECT unnest(t) AS tok FROM toks WHERE source = 'src0')
              WHERE tok <> '') AS v
    ),
    cb AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
      GROUP BY doc_id, w1, w2
    ),
    scored AS (
      SELECT cb.doc_id, cb.c,
        CASE WHEN c1.c1 IS NOT NULL THEN
          CAST(FLOOR(LN(
            CAST(GREATEST(1000 * COALESCE(c12.c12, 0) - 750, 0) * (k.nbt + k.v + 1)
                 + 750 * c1.nfwd * (COALESCE(rev.nrev, 0) + 1) AS DOUBLE)
            / CAST(1000 * c1.c1 * (k.nbt + k.v + 1) AS DOUBLE)
          ) * 1000000) AS BIGINT)
        ELSE
          CAST(FLOOR(LN(
            CAST(COALESCE(rev.nrev, 0) + 1 AS DOUBLE) / CAST(k.nbt + k.v + 1 AS DOUBLE)
          ) * 1000000) AS BIGINT)
        END AS logp
      FROM cb
      LEFT JOIN c12 USING (w1, w2)
      LEFT JOIN c1 USING (w1)
      LEFT JOIN rev USING (w2)
      CROSS JOIN consts k
    )
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(-SUM(c * logp) AS BIGINT) AS nll_micro,
           CAST((-SUM(c * logp)) // SUM(c) AS BIGINT) AS avg_nll_micro
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@query(
    "x175_lm_perplexity",
    oracle=_LM_PPL_SQL,
    certifies="X4 CCNet-shape n-gram LM perplexity filter (Wenzek et al. 2020) SERVED from the stored compacted-bigram artifact (docbig — VERDICT r13 item 4): corpus side IS the artifact, model relations are pure folds of its src0 rows (vocab from the tokenized-corpus unigrams); exact integer-rational probabilities — ONE quantized ln per distinct (doc,bigram), DECIMAL(38,0) products; oracle still derives inline, certifying the artifact end-to-end",
    tags=("llm", "text", "curation", "quality", "stored-index"),
)
def x175(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity of every document under the src0-domain model
    (target = src0 docs, exactly x166's setup), served from the shared
    compacted-bigram artifact: the corpus (doc, w1, w2, c) relation is
    read as stored, the model's c12/c1/rev/nbt fold from its src0 rows
    (operators/text.py:lm_model_from_c12), and only the vocabulary count
    reads the tokenized-corpus artifact's unigrams — no re-tokenize
    anywhere. avg_nll_micro is the integer perplexity proxy a CCNet-style
    keep/middle/drop threshold cuts on. Method is public (Wenzek et al.
    2020 CCNet; Kneser-Ney smoothing); the reference repo has no
    counterpart — §2.11 surface."""
    from pipeline_etl_website_visits_spark.operators.text import (
        lm_model_from_c12,
        lm_scores_from_counts,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import (
        shared_doc_bigrams,
        shared_tokenized_corpus,
    )

    bg = shared_doc_bigrams(spark, sf_dir)
    tgt = bg.where(F.col("source") == "src0")
    c12 = tgt.groupBy("w1", "w2").agg(F.sum("c").cast("long").alias("c12"))
    v_df = (
        shared_tokenized_corpus(spark, sf_dir)
        .where(F.col("source") == "src0")
        .select(F.explode("toks").alias("tok"))
        .where(F.col("tok") != "")
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    c12, c1, rev, consts = lm_model_from_c12(c12, v_df)
    return lm_scores_from_counts(
        bg.select("doc_id", "w1", "w2", "c"), c12, c1, rev, consts
    )


@query(
    "x176_stored_lm_serving",
    oracle=_LM_PPL_SQL,
    certifies="X4 LM-perplexity serving against a STORED bigram model (train-once / score-many): the target is never rescanned, scoring is the corpus pass + model-key joins; bit-identical to x175 because the artifact froze the same exact integer counts — the x170/x172 stored-artifact pattern",
    tags=("llm", "text", "curation", "quality", "stored-index"),
)
def x176(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-path certificate for the stored bigram LM: train the model
    ONCE per corpus fingerprint (x144's write-once scratch discipline),
    then score through operators/text.py:lm_scores_vs_model — x175's
    oracle applies verbatim."""
    import os

    from pipeline_etl_website_visits_spark.operators.text import (
        lm_scores_vs_model,
        save_lm_model,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _scratch_path(sf_dir, "documents", "lmmodel")
    if not os.path.exists(os.path.join(path, "consts", "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        save_lm_model(docs.where(F.col("source") == "src0"), tmp)
        _commit_scratch_build(tmp, path)
    return lm_scores_vs_model(docs, path)


@query(
    "x177_ivfflat_ann_serving",
    oracle="""
    WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS arr FROM embeddings),
    v AS (
      SELECT vec_id, i - 1 AS pos, CAST(FLOOR(arr[i] * 1000000) AS BIGINT) AS val
      FROM raw, unnest(generate_series(1, len(arr))) AS u(i)
    ),
    c AS (SELECT vec_id AS cid, pos, val FROM v WHERE vec_id < 4),
    d AS (
      SELECT v.vec_id, c.cid, SUM((v.val - c.val) * (v.val - c.val)) AS dist
      FROM v JOIN c USING (pos) GROUP BY v.vec_id, c.cid
    ),
    asg AS (
      SELECT vec_id AS neighbor_id, cid AS cell FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d WHERE vec_id < 3
      ) WHERE rn <= 2
    ),
    sims AS (
      SELECT p.query_id, a.neighbor_id,
             list_dot_product(q.arr, n.arr)
               / (sqrt(list_dot_product(q.arr, q.arr)) * sqrt(list_dot_product(n.arr, n.arr))) AS sim_raw
      FROM probes p
      JOIN asg a USING (cell)
      JOIN raw q ON q.vec_id = p.query_id
      JOIN raw n ON n.vec_id = a.neighbor_id
      WHERE a.neighbor_id <> p.query_id
    )
    SELECT query_id, neighbor_id, ROUND(sim_raw, 4) AS sim, CAST(rn AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id) AS rn
      FROM sims
    ) WHERE rn <= 10 ORDER BY query_id, rank
    """,
    certifies="X3 PRUNED ANN serving from the stored IVF-Flat index (nprobe=2 of 4 cells): integer-exact cell assignment and probe selection (micro-quantized L2, first-min ties — fully SQL-replayable), partition-pruned candidate read, exact rounded-cosine ranking; x173 certifies the full-probe limit, this certifies the production recall/cost dial",
    tags=("llm", "similarity", "stored-index", "bounded"),
)
def x177(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN from the stored IVF-Flat index with nprobe=2 (half the cells
    read): the production serving path — deterministic end-to-end
    because cell assignment/probing is exact integer geometry and the
    within-cell ranking is the certified cosine kernel. Shares the x173
    scratch artifact."""
    import os

    from pipeline_etl_website_visits_spark.operators.vector_index import (
        build_ivfflat_index,
        ivfflat_search,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    flat_path = _scratch_path(sf_dir, "embeddings", "ivfflat")
    if not os.path.exists(os.path.join(flat_path, "meta", "_SUCCESS")):
        tmp = f"{flat_path}.build.{os.getpid()}"
        build_ivfflat_index(emb, tmp, num_coarse=4)
        _commit_scratch_build(tmp, flat_path)
    from pipeline_etl_website_visits_spark.queries.llmops import fingerprint_memo

    q3 = emb.filter(F.col("vec_id") < 3)
    return ivfflat_search(
        spark, flat_path, q3, k=10, nprobe=2, with_rank=True,
        # memoized probe collect (the x179/x182 fixed-serving-input rule)
        precollected_queries=fingerprint_memo(
            sf_dir, "embeddings", "probe_vecs3",
            lambda: [
                (r["vec_id"], r["embedding"])
                for r in q3.select("vec_id", "embedding").collect()
            ],
        ),
    )


# --------------------------------------------------------------------------
# x179 — ANN recall@k evaluation of the pruned serving dial
#
# The index-QA measurement every ANN deployment runs before turning the
# nprobe knob down in production: recall@10 of the pruned IVF-Flat search
# (x177's exact configuration — nprobe=2 of 4 cells, the stored artifact)
# against the exact cosine top-10 ground truth (x25's kernel). Both legs
# are deterministic certified paths, so the recall numbers themselves
# hash-certify: integer hit counts, recall in exact ppm.
# --------------------------------------------------------------------------
@query(
    "x179_ann_recall_eval",
    oracle="""
    WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS arr FROM embeddings),
    v AS (
      SELECT vec_id, i - 1 AS pos, CAST(FLOOR(arr[i] * 1000000) AS BIGINT) AS val
      FROM raw, unnest(generate_series(1, len(arr))) AS u(i)
    ),
    c AS (SELECT vec_id AS cid, pos, val FROM v WHERE vec_id < 4),
    d AS (
      SELECT v.vec_id, c.cid, SUM((v.val - c.val) * (v.val - c.val)) AS dist
      FROM v JOIN c USING (pos) GROUP BY v.vec_id, c.cid
    ),
    asg AS (
      SELECT vec_id AS neighbor_id, cid AS cell FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d WHERE vec_id < 3
      ) WHERE rn <= 2
    ),
    pruned AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                 list_dot_product(q.arr, n.arr)
                   / (sqrt(list_dot_product(q.arr, q.arr)) * sqrt(list_dot_product(n.arr, n.arr))) DESC,
                 a.neighbor_id) AS rn
        FROM probes p
        JOIN asg a USING (cell)
        JOIN raw q ON q.vec_id = p.query_id
        JOIN raw n ON n.vec_id = a.neighbor_id
        WHERE a.neighbor_id <> p.query_id
      ) WHERE rn <= 10
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_dot_product(q.arr, n.arr)
                   / (sqrt(list_dot_product(q.arr, q.arr)) * sqrt(list_dot_product(n.arr, n.arr))) DESC,
                 n.vec_id) AS rn
        FROM raw q JOIN raw n ON n.vec_id <> q.vec_id
        WHERE q.vec_id < 3
      ) WHERE rn <= 10
    )
    SELECT CAST(e.query_id AS BIGINT) AS query_id,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(p.neighbor_id) * 100000 AS BIGINT) AS recall_ppm
    FROM exact e
    LEFT JOIN pruned p ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
    GROUP BY e.query_id ORDER BY query_id
    """,
    certifies="X3 ANN recall@k evaluation: pruned stored-index serving (x177's nprobe=2 dial) measured against exact cosine top-k ground truth — integer hit counts / exact-ppm recall, the QA gate before lowering nprobe in production",
    tags=("llm", "similarity", "stored-index", "bounded"),
)
def x179(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 per query of the pruned IVF-Flat search vs exact cosine
    top-10. Shares the x173/x177 scratch index artifact; the exact leg is
    the certified cosine_topk kernel. recall_ppm = n_hits * 1e6 / 10 —
    exact integer (k fixed at 10)."""
    import os

    from pipeline_etl_website_visits_spark.operators.similarity import cosine_topk
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        build_ivfflat_index,
        ivfflat_search,
    )
    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
        _scratch_path,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    flat_path = _scratch_path(sf_dir, "embeddings", "ivfflat")
    if not os.path.exists(os.path.join(flat_path, "meta", "_SUCCESS")):
        tmp = f"{flat_path}.build.{os.getpid()}"
        build_ivfflat_index(emb, tmp, num_coarse=4)
        _commit_scratch_build(tmp, flat_path)
    # one memoized collect feeds BOTH legs' kernels and the probe planning —
    # the 3-row query relation would otherwise pay a job per leg per call
    # (probe vectors are fixed serving inputs: the _pq_codebook discipline)
    from pipeline_etl_website_visits_spark.queries.llmops import fingerprint_memo

    q_rows = fingerprint_memo(
        sf_dir, "embeddings", "probe_vecs3",
        lambda: [
            (r["vec_id"], r["embedding"])
            for r in q.select("vec_id", "embedding").collect()
        ],
    )
    pruned = ivfflat_search(
        spark, flat_path, q, k=10, nprobe=2, precollected_queries=q_rows
    ).select("query_id", "neighbor_id")
    exact = cosine_topk(q, emb, k=10, precollected_queries=q_rows).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(pruned, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) * 100000)
            .cast("long")
            .alias("recall_ppm"),
        )
        # no final orderBy (the x82 discipline, r15)
    )


# --------------------------------------------------------------------------
# x182 — Matryoshka truncation recall (MRL serving eval)
#
# Matryoshka-style embedding serving keeps only a PREFIX of each vector's
# dimensions (Kusupati et al. 2022); before turning that dial down in
# production the eval is recall@k of truncated-dimension search against
# full-dimension ground truth — the x179 QA pattern applied to the
# dimension axis instead of the nprobe axis. Truncation is native
# (F.slice on the array column — no UDF, pushdown-friendly); both legs
# run the certified cosine_topk kernel, so hit counts are deterministic
# integers and recall is exact ppm.
# --------------------------------------------------------------------------
_MRL_DIMS = (8, 32)


def _mrl_exact_leg(alias: str, dim_expr: str) -> str:
    return f"""
    {alias} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_dot_product({dim_expr('q')}, {dim_expr('n')})
                   / (sqrt(list_dot_product({dim_expr('q')}, {dim_expr('q')}))
                      * sqrt(list_dot_product({dim_expr('n')}, {dim_expr('n')}))) DESC,
                 n.vec_id) AS rn
        FROM raw q JOIN raw n ON n.vec_id <> q.vec_id
        WHERE q.vec_id < 3
      ) WHERE rn <= 10
    )"""


_MRL_ORACLE = (
    """
    WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS arr FROM embeddings),"""
    + _mrl_exact_leg("full_gt", lambda t: f"{t}.arr")
    + ","
    + ",".join(
        _mrl_exact_leg(f"t{d}", lambda t, d=d: f"list_slice({t}.arr, 1, {d})")
        for d in _MRL_DIMS
    )
    + f"""
    SELECT trunc_dim, query_id,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits * 100000 AS BIGINT) AS recall_ppm
    FROM (
    """
    + " UNION ALL ".join(
        f"""
      SELECT {d} AS trunc_dim, e.query_id, COUNT(t.neighbor_id) AS n_hits
      FROM full_gt e LEFT JOIN t{d} t
        ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
      GROUP BY e.query_id"""
        for d in _MRL_DIMS
    )
    + """
    ) ORDER BY trunc_dim, query_id
    """
)


@query(
    "x182_matryoshka_recall",
    oracle=_MRL_ORACLE,
    certifies="X3 Matryoshka-truncation serving eval (Kusupati et al. 2022 shape): recall@10 of prefix-dimension cosine search vs full-dimension ground truth, per truncation width — native array slicing, certified exact kernel both legs, integer hit counts / exact-ppm recall",
    tags=("llm", "similarity", "bounded"),
)
def x182(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of dimension-truncated cosine search (the MRL serving
    dial) against full-dimension exact ground truth, for each width in
    _MRL_DIMS. ONE corpus pass computes every width plus the full-dim
    ground truth (cosine_topk_widths, each width bit-identical to an
    independent cosine_topk over sliced columns); the tiny ranked result
    is checkpointed once so the per-width recall joins never re-run the
    kernel."""
    from pipeline_etl_website_visits_spark.operators.similarity import (
        cosine_topk_widths,
    )

    from pipeline_etl_website_visits_spark.queries.llmops import fingerprint_memo

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    # memoized probe collect — the x179 rationale
    q_rows = fingerprint_memo(
        sf_dir, "embeddings", "probe_vecs3",
        lambda: [
            (r["vec_id"], r["embedding"])
            for r in q.select("vec_id", "embedding").collect()
        ],
    )
    full_dim = len(q_rows[0][1])
    multi = cosine_topk_widths(
        emb, [full_dim, *_MRL_DIMS], q_rows, k=10
    ).localCheckpoint()  # widths x |Q| x k rows — materialized once, tiny
    gt = multi.filter(F.col("trunc_dim") == full_dim).select("query_id", "neighbor_id")
    legs = []
    for d in _MRL_DIMS:
        trunc = multi.filter(F.col("trunc_dim") == d).select("query_id", "neighbor_id")
        hits = (
            gt.join(trunc, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias("n_hits"))
        )
        legs.append(
            gt.select("query_id")
            .distinct()
            .join(hits, "query_id", "left")
            .select(
                F.lit(d).cast("long").alias("trunc_dim"),
                F.col("query_id").cast("long").alias("query_id"),
                F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
                (F.coalesce("n_hits", F.lit(0)) * 100000).cast("long").alias("recall_ppm"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    # no final orderBy (the x82 discipline, r15): determinism-only sort
    return out


# --------------------------------------------------------------------------
# x183 — deterministic pseudonymization of an event log (privacy TRANSFORM)
#
# The k-anonymity / l-diversity / t-closeness trio (x145/x159/x167) AUDITS
# re-identification risk; this is the transform a pipeline actually applies
# before an event log enters a training corpus: keyed tokenization of the
# user id (linkable pseudonym — downstream joins and per-user statistics
# still work, raw id gone), timestamp generalization to the hour, value
# banding, free-text props suppressed entirely, and small-count
# suppression (users with <5 events are dropped — the groups most at
# re-identification risk). Public method: pseudonymization + generalization
# + suppression are the standard GDPR-era de-identification toolkit.
# --------------------------------------------------------------------------
@query(
    "x183_event_pseudonymize",
    oracle="""
    WITH keep AS (
      SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 5
    )
    SELECT substring(md5('pepper-2024|' || CAST(e.user_id AS VARCHAR)), 1, 16) AS user_token,
           strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           e.event_type AS event_type,
           CAST(FLOOR(e.value / 5) * 5 AS BIGINT) AS value_band
    FROM events e JOIN keep USING (user_id)
    ORDER BY user_token, hour_bucket, event_type, value_band
    """,
    certifies="privacy preprocessing: deterministic keyed pseudonymization + generalization (hour-truncated ts, banded value) + small-count suppression of an event log before corpus entry — the TRANSFORM counterpart of the x145/x159/x167 audit trio; map-only after one user-count aggregate",
    tags=("governance", "privacy", "events"),
)
def x183(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymized event relation: user_token = md5('pepper-2024|'||id)
    first 16 hex (a salted deterministic token — same user, same token,
    so cohort/session analyses survive; in production the pepper lives in
    a KMS, here it is a fixed literal so the oracle certifies the exact
    arithmetic). Scale shape: ONE count aggregate on user_id produces the
    keep-set (suppression), the event scan then joins it (AQE picks
    broadcast vs shuffle by its real size) and everything else is a
    map-only projection — no window, no sort; identifier-bearing columns
    (event_id, props) never reach the output."""
    ev = load_table(spark, sf_dir, "events")
    keep = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= 5)
        .select("user_id")
    )
    return ev.join(keep, "user_id").select(
        F.substring(
            F.md5(
                F.concat(F.lit("pepper-2024|"), F.col("user_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            16,
        ).alias("user_token"),
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_bucket"
        ),
        "event_type",
        (F.floor(F.col("value") / 5) * 5).cast("long").alias("value_band"),
    )


# --------------------------------------------------------------------------
# x184 — corpus drift: population-stability index per source (monitoring)
#
# The drift dial a production pipeline watches between corpus snapshots:
# PSI of each source's doc-length distribution against the whole corpus.
# PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over shared buckets — <0.1 stable,
# 0.1-0.25 drifting, >0.25 shifted (the standard monitoring bands).
# Laplace-smoothed so empty cells stay finite, and exact-integer per the
# x167 discipline: both probabilities are int64 rationals, ONE quantized
# ln per grid cell over an exact integer ratio, one integer division per
# source at the end — replays digit-for-digit on any engine.
# --------------------------------------------------------------------------
@query(
    "x184_source_drift_psi",
    oracle="""
    WITH base AS (
      SELECT source, CAST(FLOOR(n_chars / 50) AS INT) AS b FROM documents
    ),
    sb AS (
      SELECT source, b, CAST(COUNT(*) AS BIGINT) AS cnt_sb FROM base GROUP BY source, b
    ),
    ns AS (SELECT source, CAST(SUM(cnt_sb) AS BIGINT) AS n_s FROM sb GROUP BY source),
    gb AS (SELECT b, CAST(SUM(cnt_sb) AS BIGINT) AS cnt_b FROM sb GROUP BY b),
    tot AS (SELECT CAST(SUM(cnt_b) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS nb FROM gb),
    grid AS (
      SELECT ns.source, ns.n_s, gb.b, gb.cnt_b, COALESCE(sb.cnt_sb, 0) AS cnt_sb,
             t.n, t.nb
      FROM ns CROSS JOIN gb
      LEFT JOIN sb ON sb.source = ns.source AND sb.b = gb.b
      CROSS JOIN tot t
    ),
    terms AS (
      SELECT source, n_s,
             ((cnt_sb + 1) * (n + nb) - (cnt_b + 1) * (n_s + nb))
             * CAST(FLOOR(LN(CAST((cnt_sb + 1) * (n + nb) AS DOUBLE)
                             / CAST((cnt_b + 1) * (n_s + nb) AS DOUBLE))
                          * 1000000) AS BIGINT) AS term_num,
             (n_s + nb) * (n + nb) AS denom
      FROM grid
    )
    SELECT source,
           CAST(MAX(n_s) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(term_num) AS BIGINT) // MAX(denom) AS BIGINT) AS psi_micro
    FROM terms GROUP BY source ORDER BY source
    """,
    certifies="corpus drift monitoring: per-source population-stability index of the doc-length distribution vs the whole corpus (Laplace-smoothed, exact int64 rationals, one quantized ln per grid cell, one integer division per source) — the snapshot-over-snapshot QA dial next to the x181/x182 tuning audits",
    tags=("governance", "monitoring", "llm"),
)
def x184(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI per source over 50-char length buckets. Every term is ≥0 by
    construction ((p−q) and ln(p/q) share sign; the floor quantization
    only grows the magnitude), so the final integer division is safe
    under both truncating (Spark div) and flooring (DuckDB //)
    semantics. Overflow bound: (N+B)²·|ln|·1e6 must stay under 2^63 —
    fine through ~sf10 documents; beyond that the cross-products move to
    DECIMAL(38,0) (the x167 note). Scale shape: ONE scan → (source, b)
    counts; everything downstream folds from that tiny relation and the
    sources×buckets grid is broadcast arithmetic — corpus rows touched
    exactly once, no wide shuffle, no window."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source", F.floor(F.col("n_chars") / 50).cast("int").alias("b")
    )
    # sb is consumed by FOUR derivations (ns, gb, tot, the grid join) with
    # different column sets, so exchange reuse cannot canonicalize (the
    # ngram_novelty/x166 finding) — cache the ≤ sources×buckets-row fold so
    # the corpus scan runs once (r14); scoped_cache bounds repeated callers
    # to one cached fold (ADVICE r14 cache lifecycle)
    from pipeline_etl_website_visits_spark.operators.text import scoped_cache

    sb = scoped_cache(
        base.groupBy("source", "b").agg(
            F.count("*").cast("long").alias("cnt_sb")
        ),
        "x184_sb",
    )
    ns = sb.groupBy("source").agg(F.sum("cnt_sb").cast("long").alias("n_s"))
    gb = sb.groupBy("b").agg(F.sum("cnt_sb").cast("long").alias("cnt_b"))
    tot = gb.agg(
        F.sum("cnt_b").cast("long").alias("n"), F.count("*").cast("long").alias("nb")
    )
    grid = (
        ns.crossJoin(F.broadcast(gb))
        .join(sb, ["source", "b"], "left")
        .na.fill({"cnt_sb": 0})
        .crossJoin(F.broadcast(tot))
    )
    num = (F.col("cnt_sb") + 1) * (F.col("n") + F.col("nb"))
    den = (F.col("cnt_b") + 1) * (F.col("n_s") + F.col("nb"))
    lnq = F.floor(
        F.log(num.cast("double") / den.cast("double")) * F.lit(1000000.0)
    ).cast("long")
    terms = grid.select(
        "source",
        "n_s",
        ((num - den) * lnq).alias("term_num"),
        ((F.col("n_s") + F.col("nb")) * (F.col("n") + F.col("nb"))).alias("denom"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_docs"),
            F.sum("term_num").cast("long").alias("__t"),
            F.max("denom").cast("long").alias("__d"),
        )
        .select(
            "source",
            "n_docs",
            F.expr("__t div __d").cast("long").alias("psi_micro"),
        )
        .orderBy("source")
    )
