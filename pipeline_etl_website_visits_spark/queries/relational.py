"""Declared queries Q1–Q20 (SURVEY.md §2.12) — DataFrame-first implementations.

Each query certifies one reference operator row from SURVEY.md §2 (citations
inline). The Spark side is written with the DataFrame API so Catalyst owns
the physical plan (pushdown, pruning, broadcast/SMJ selection, AQE); the
oracle is a portable SQL twin for DuckDB.

Scale notes that apply throughout:
- filters appear before joins/aggs so they push into the parquet scan;
- every join keys on a single equi-key — small dims (nation/customer at
  dim-scale) broadcast automatically under AQE;
- LIMIT-after-ORDER BY compiles to TakeOrderedAndProject (no full sort
  materialization).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pipeline_etl_website_visits_spark.queries.registry import query
from pipeline_etl_website_visits_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1 — scan + rename + project (certifies S3/P2: reference
# utils/utils_transform.py:65-74 CSV scan, 202-203 rename)
# --------------------------------------------------------------------------
@query(
    "q01_scan_project_rename",
    oracle="""
    SELECT o_orderkey AS id, o_orderstatus AS status
    FROM orders ORDER BY id LIMIT 100
    """,
    certifies="S3 scan, P2 rename (utils/utils_transform.py:65-74, 202-203)",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(F.col("o_orderkey").alias("id"), F.col("o_orderstatus").alias("status"))
        .orderBy("id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q2 — regex predicate (certifies F1 email regex:
# utils/utils_transform.py:111-116)
# --------------------------------------------------------------------------
_Q2_PATTERN = r"(data|spark) (join|merge)"


@query(
    "q02_regex_filter",
    oracle=f"""
    SELECT doc_id FROM documents
    WHERE regexp_matches(text, '{_Q2_PATTERN}')
    ORDER BY doc_id
    """,
    certifies="F1 regex predicate (utils/utils_transform.py:111-116)",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(_Q2_PATTERN)).select("doc_id")


# --------------------------------------------------------------------------
# Q3 — NULL-or-pattern predicate (certifies F2 date predicate shape:
# utils/utils_transform.py:119-129 — NULL is valid OR regex matches)
# --------------------------------------------------------------------------
@query(
    "q03_null_or_pattern",
    oracle="""
    SELECT event_id FROM events
    WHERE props IS NULL OR props LIKE '%"k": 1%'
    ORDER BY event_id
    """,
    certifies="F2 null-or-pattern (utils/utils_transform.py:119-129)",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.filter(F.col("props").isNull() | F.col("props").like('%"k": 1%'))
        .select("event_id")
    )


# --------------------------------------------------------------------------
# Q4 — boolean conjunction + valid/invalid split (certifies F3/F4:
# utils/utils_transform.py:131-136)
# --------------------------------------------------------------------------
@query(
    "q04_bool_split",
    oracle="""
    SELECT CASE WHEN l_quantity >= 25 AND l_discount <= 0.05 THEN 'ok' ELSE 'err' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1 ORDER BY bucket
    """,
    certifies="F3 flag conjunction + F4 split (utils/utils_transform.py:131-136)",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    is_valid = (F.col("l_quantity") >= 25) & (F.col("l_discount") <= 0.05)
    return (
        li.select(F.when(is_valid, "ok").otherwise("err").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Q5 — per-row failed-check enumeration + explode (certifies E1, the
# reference's only reshape: utils/utils_transform.py:139-168 iterrows loop,
# rebuilt as vectorized array→filter→explode)
# --------------------------------------------------------------------------
@query(
    "q05_error_explode",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'HIGH_QTY' AS tipo_error FROM lineitem WHERE l_quantity > 45
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'BIG_DISC' AS tipo_error FROM lineitem WHERE l_discount >= 0.08
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'TAXED' AS tipo_error FROM lineitem WHERE l_tax >= 0.07
    ORDER BY l_orderkey, l_linenumber, tipo_error
    """,
    certifies="E1 error expansion (utils/utils_transform.py:139-168)",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    checks = F.array(
        F.when(F.col("l_quantity") > 45, F.lit("HIGH_QTY")),
        F.when(F.col("l_discount") >= 0.08, F.lit("BIG_DISC")),
        F.when(F.col("l_tax") >= 0.07, F.lit("TAXED")),
    )
    failed = F.filter(checks, lambda x: x.isNotNull())
    return (
        li.select("l_orderkey", "l_linenumber", F.explode(failed).alias("tipo_error"))
    )


# --------------------------------------------------------------------------
# Q6 — placeholder→NULL + trim (certifies P1/P3:
# utils/utils_transform.py:198-199, 212-214)
# --------------------------------------------------------------------------
@query(
    "q06_nullif_trim",
    oracle="""
    SELECT o_orderkey, NULLIF(NULLIF(TRIM(o_orderpriority), '-'), '0') AS prio
    FROM orders ORDER BY o_orderkey LIMIT 500
    """,
    certifies="P1 placeholder-null + P3 trim (utils/utils_transform.py:198, 212-214)",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    trimmed = F.trim(F.col("o_orderpriority"))
    prio = F.when(trimmed.isin("-", "0"), F.lit(None).cast("string")).otherwise(trimmed)
    return orders.select("o_orderkey", prio.alias("prio")).orderBy("o_orderkey").limit(500)


# --------------------------------------------------------------------------
# Q7 — datetime + numeric casts (certifies P4/P5:
# utils/utils_transform.py:216-222). FLOOR before INT cast: DuckDB's
# double→int rounds, Spark truncates.
# --------------------------------------------------------------------------
@query(
    "q07_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(FLOOR(o_totalprice) AS INT) AS price_int
    FROM orders ORDER BY o_orderkey LIMIT 500
    """,
    certifies="P4 datetime cast + P5 numeric cast (utils/utils_transform.py:216-222)",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            F.floor("o_totalprice").cast("int").alias("price_int"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q8 — group-agg: visits per key with first/last dates (certifies A1/A3:
# utils/utils_transform.py:229-233 + the D20 ruling min/max dates)
# --------------------------------------------------------------------------
@query(
    "q08_visits_agg",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS visitas_totales,
           MIN(CAST(o_orderdate AS DATE)) AS fecha_primera_visita,
           MAX(CAST(o_orderdate AS DATE)) AS fecha_ultima_visita
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    certifies="A1 group-count + A3 min/max dates (utils/utils_transform.py:229-233, D20 ruling)",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("visitas_totales"),
            F.min(d).alias("fecha_primera_visita"),
            F.max(d).alias("fecha_ultima_visita"),
        )
    )


# --------------------------------------------------------------------------
# Q9 — scalar record counts (certifies A2/K1/K3 control-log counts:
# utils/utils_load.py:100-105)
# --------------------------------------------------------------------------
@query(
    "q09_scalar_counts",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS registros,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS registros_fallidos
    FROM lineitem
    """,
    certifies="A2 scalar counts (utils/utils_load.py:100-105)",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("registros"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("registros_fallidos"),
    )


# --------------------------------------------------------------------------
# Q10 — the merge/upsert as a full-outer join (certifies J2:
# utils/utils_load.py:43-84 MERGE with D21/D22 rulings). Target = history
# (orders before 1998), source = the new batch (1998+); merge rules mirror
# the reference: keep first-visit, greatest last-visit, counters add.
# --------------------------------------------------------------------------
@query(
    "q10_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS tot,
             MIN(CAST(o_orderdate AS DATE)) AS first_v, MAX(CAST(o_orderdate AS DATE)) AS last_v
      FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01' GROUP BY o_custkey
    ), source AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS tot,
             MIN(CAST(o_orderdate AS DATE)) AS first_v, MAX(CAST(o_orderdate AS DATE)) AS last_v
      FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01' GROUP BY o_custkey
    )
    SELECT COALESCE(t.k, s.k) AS custkey,
           CAST(COALESCE(t.tot, 0) + COALESCE(s.tot, 0) AS BIGINT) AS visitas_totales,
           COALESCE(t.first_v, s.first_v) AS fecha_primera_visita,
           GREATEST(COALESCE(t.last_v, s.last_v), COALESCE(s.last_v, t.last_v)) AS fecha_ultima_visita
    FROM target t FULL OUTER JOIN source s ON t.k = s.k
    ORDER BY custkey
    """,
    certifies="J2 keyed merge/upsert (utils/utils_load.py:43-84, D21/D22 rulings)",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")

    def half(pred):
        return (
            orders.filter(pred)
            .groupBy(F.col("o_custkey").alias("k"))
            .agg(F.count("*").alias("tot"), F.min(d).alias("first_v"), F.max(d).alias("last_v"))
        )

    t = half(d < F.lit("1998-01-01").cast("date"))
    s = half(d >= F.lit("1998-01-01").cast("date"))
    t = t.select([F.col(c).alias(f"t_{c}") for c in t.columns])
    s = s.select([F.col(c).alias(f"s_{c}") for c in s.columns])
    joined = t.join(s, t.t_k == s.s_k, "full_outer")
    return joined.select(
        F.coalesce("t_k", "s_k").alias("custkey"),
        (F.coalesce("t_tot", F.lit(0)) + F.coalesce("s_tot", F.lit(0))).cast("long").alias("visitas_totales"),
        F.coalesce("t_first_v", "s_first_v").alias("fecha_primera_visita"),
        F.greatest(F.coalesce("t_last_v", "s_last_v"), F.coalesce("s_last_v", "t_last_v")).alias(
            "fecha_ultima_visita"
        ),
    )


# --------------------------------------------------------------------------
# Q11 — anti-join / FK check (certifies J4: database/schema.sql:38)
# --------------------------------------------------------------------------
@query(
    "q11_anti_join",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    certifies="J4 FK integrity anti-join (database/schema.sql:38)",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
    )


# --------------------------------------------------------------------------
# Q12 — inner equi-join (gap-map: joins beyond the upsert, SURVEY §2.10)
# --------------------------------------------------------------------------
@query(
    "q12_inner_join",
    oracle="""
    SELECT o_orderkey, c_name, o_orderstatus
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey LIMIT 1000
    """,
    certifies="inner equi-join (SURVEY §2.10)",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    # customer is the dim side: Catalyst/AQE broadcasts it under the 64MB
    # threshold; at 100 TB the fact side never shuffles for this join.
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q13 — left semi-join / EXISTS (gap-map, SURVEY §2.10)
# --------------------------------------------------------------------------
@query(
    "q13_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
    certifies="left semi-join (SURVEY §2.10)",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# Q14 — window dedup: latest order per customer (certifies X1 window dedup,
# SURVEY §2.11; the "latest visit per email" shape from README.md:174)
# --------------------------------------------------------------------------
@query(
    "q14_window_dedup",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1 ORDER BY o_custkey
    """,
    certifies="X1 window dedup / latest-per-key (SURVEY §2.11)",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("odate"))
    )


# --------------------------------------------------------------------------
# Q15 — tie-broken top-k (README.md:174 "top tipos de error" shape)
# --------------------------------------------------------------------------
@query(
    "q15_topk",
    oracle="""
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_partkey
    ORDER BY cnt DESC, l_partkey LIMIT 10
    """,
    certifies="top-k with tiebreak (SURVEY §2.10)",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q16 — union of two ranges, re-aggregated (SURVEY §2.10 set ops; the
# union-over-files shape of daily re-runs)
# --------------------------------------------------------------------------
@query(
    "q16_union",
    oracle="""
    SELECT src, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT 'h1' AS src, o_orderstatus FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      UNION ALL
      SELECT 'h2' AS src, o_orderstatus FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
    ) GROUP BY src, o_orderstatus ORDER BY src, o_orderstatus
    """,
    certifies="union all + re-aggregate (SURVEY §2.10)",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    split = F.lit("1998-01-01").cast("date")
    h1 = orders.filter(d < split).select(F.lit("h1").alias("src"), "o_orderstatus")
    h2 = orders.filter(d >= split).select(F.lit("h2").alias("src"), "o_orderstatus")
    return (
        h1.unionAll(h2)
        .groupBy("src", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Q17 — exact count distinct (certifies X2-exact, SURVEY §2.11)
# --------------------------------------------------------------------------
@query(
    "q17_count_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    """,
    certifies="exact count-distinct (SURVEY §2.11 X2)",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


# --------------------------------------------------------------------------
# Q18 — rollup with coalesced labels (SURVEY §2.10 grouping sets; money agg
# in DECIMAL for cross-engine determinism, surfaced as rounded DOUBLE)
# --------------------------------------------------------------------------
@query(
    "q18_rollup",
    oracle="""
    SELECT COALESCE(n_name, 'ALL') AS nation,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS acctbal_sum
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    ORDER BY nation, segment
    """,
    certifies="rollup / grouping sets (SURVEY §2.10)",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = customer.join(nation, customer.c_nationkey == nation.n_nationkey, "inner")
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2).alias("acctbal_sum"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n",
            "acctbal_sum",
        )
    )


# --------------------------------------------------------------------------
# Q19 — EXTRACT year/month + group (certifies J2's rollover internals:
# utils/utils_load.py:66-77 EXTRACT(YEAR/MONTH) comparisons)
# --------------------------------------------------------------------------
@query(
    "q19_extract_ym",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY y, m ORDER BY y, m
    """,
    certifies="EXTRACT(YEAR/MONTH) + CASE internals of J2 (utils/utils_load.py:66-77)",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Q20 — scalar text ops (certifies X4 deterministic text layer,
# SURVEY §2.11; lower/trim/length used by P3's canonicalization)
# --------------------------------------------------------------------------
@query(
    "q20_text_ops",
    oracle="""
    SELECT doc_id,
           LOWER(TRIM(text)) AS norm_text,
           CAST(LENGTH(text) AS INT) AS n_chars_computed
    FROM documents ORDER BY doc_id LIMIT 500
    """,
    certifies="X4 text scalar ops (SURVEY §2.11)",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.lower(F.trim(F.col("text"))).alias("norm_text"),
            F.length("text").cast("int").alias("n_chars_computed"),
        )
        .orderBy("doc_id")
        .limit(500)
    )
