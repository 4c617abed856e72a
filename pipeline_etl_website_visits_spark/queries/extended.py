"""Extended operator coverage (SURVEY §2.10 gap map, beyond Q1-Q20).

Everything the reference lacks that a user of a general analytics engine
expects: outer/cross joins, set operations, cube, analytic windows with
frames, HAVING, scalar/IN subqueries, string/math/date/JSON scalar families,
inline literal relations, multi-join star queries, and the SQL entry path
(spark.sql over registered views).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pipeline_etl_website_visits_spark.queries.registry import query
from pipeline_etl_website_visits_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Joins beyond inner/semi/anti (SURVEY §2.10 "joins beyond the upsert")
# --------------------------------------------------------------------------
@query(
    "q40_left_outer_join",
    oracle="""
    SELECT c_custkey, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey
    """,
    certifies="left outer join + null fill (SURVEY §2.10)",
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        customer.join(cnt, customer.c_custkey == cnt.o_custkey, "left")
        .select("c_custkey", F.coalesce("cnt", F.lit(0)).cast("long").alias("n_orders"))
    )


@query(
    "q41_cross_join",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
    """,
    certifies="cross join (SURVEY §2.10)",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return region.select("r_name").crossJoin(nation.select("n_name"))


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.10 "set ops: none")
# --------------------------------------------------------------------------
@query(
    "q42_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders ORDER BY k
    """,
    certifies="EXCEPT set-op (SURVEY §2.10)",
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return customer.exceptAll(orders).distinct()


@query(
    "q43_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey AS k FROM orders ORDER BY k
    """,
    certifies="INTERSECT set-op (SURVEY §2.10)",
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return customer.intersect(orders)


@query(
    "q44_union_distinct",
    oracle="""
    SELECT o_orderstatus AS v FROM orders
    UNION
    SELECT l_linestatus AS v FROM lineitem ORDER BY v
    """,
    certifies="UNION (distinct) set-op (SURVEY §2.10)",
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("v"))
    b = _t(spark, sf_dir, "lineitem").select(F.col("l_linestatus").alias("v"))
    return a.union(b).distinct()


# --------------------------------------------------------------------------
# CUBE (grouping-sets family beyond q18's rollup)
# --------------------------------------------------------------------------
@query(
    "q45_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    certifies="CUBE grouping sets (SURVEY §2.10)",
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# Analytic windows: ranking + lag + frames (SURVEY §2.10 "window functions:
# none")
# --------------------------------------------------------------------------
@query(
    "q46_window_rank_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           LAG(o_orderkey) OVER w AS prev_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    certifies="rank/dense_rank/lag analytics (SURVEY §2.10)",
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").cast("date"), F.col("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@query(
    "q47_window_frame_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_total
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
    certifies="window frame (running sum) (SURVEY §2.10)",
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.floor("o_totalprice").cast("long")).over(w).cast("long").alias("running_total"),
    )


# --------------------------------------------------------------------------
# HAVING + conditional aggregation
# --------------------------------------------------------------------------
@query(
    "q48_having",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15 ORDER BY o_custkey
    """,
    certifies="HAVING post-aggregate filter (SURVEY §2.10)",
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(F.count("*").alias("n")).filter(F.col("n") >= 15)


@query(
    "q49_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    certifies="FILTER/conditional aggregation (SURVEY §2.10)",
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_disc"),
    )


# --------------------------------------------------------------------------
# Subqueries: scalar + IN (certified through the SQL entry path to also
# exercise spark.sql parsing/planning)
# --------------------------------------------------------------------------
@query(
    "q50_scalar_subquery",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    certifies="scalar subquery (SURVEY §2.10); via spark.sql SQL entry path",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey FROM orders "
        "WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)"
    )


@query(
    "q51_in_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
    ORDER BY c_custkey
    """,
    certifies="IN subquery (SURVEY §2.10); via spark.sql SQL entry path",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)"
    )


# --------------------------------------------------------------------------
# Scalar function families (SURVEY §2.10 "absent: math, array/map/json")
# --------------------------------------------------------------------------
@query(
    "q52_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           SUBSTRING(c_name, 1, 8) AS prefix,
           REPLACE(c_name, 'Customer', 'C') AS short_name,
           REVERSE(c_mktsegment) AS rseg,
           split_part(c_name, '#', 2) AS id_part,
           CAST(LENGTH(c_name) AS INT) AS name_len
    FROM customer ORDER BY c_custkey
    """,
    certifies="string scalar family (SURVEY §2.10)",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("short_name"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("id_part"),
        F.length("c_name").cast("int").alias("name_len"),
    )


@query(
    "q53_math_funcs",
    oracle="""
    SELECT p_partkey,
           ABS(p_size - 25) AS dist,
           CAST(p_size % 7 AS INT) AS m7,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
           CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
           SQRT(CAST(p_size AS DOUBLE)) AS root,
           CAST(POWER(2, p_size % 5) AS BIGINT) AS pw
    FROM part ORDER BY p_partkey
    """,
    certifies="math scalar family (SURVEY §2.10); sqrt is IEEE correctly-rounded in both engines",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("dist"),
        (F.col("p_size") % 7).cast("int").alias("m7"),
        F.floor("p_retailprice").cast("long").alias("fl"),
        F.ceil("p_retailprice").cast("long").alias("ce"),
        F.sqrt(F.col("p_size").cast("double")).alias("root"),
        F.power(F.lit(2), F.col("p_size") % 5).cast("long").alias("pw"),
    )


@query(
    "q54_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
           CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    certifies="date/time scalar family (SURVEY §2.10)",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # DOW: DuckDB Sunday=0; Spark dayofweek is Sunday=1 → subtract 1.
    return (
        o.select(
            "o_orderkey",
            F.date_add(d, 30).alias("due_date"),
            F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias("days_since_epoch_start"),
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
            F.last_day(d).alias("month_end"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "q55_json_extract",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS INT) AS k_value
    FROM events ORDER BY event_id LIMIT 1000
    """,
    certifies="JSON extraction (SURVEY §2.10 'json functions entirely absent')",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # Top-N first, parse after: written as select(json)->orderBy->limit the
    # JSON parse runs over every row before the sort; ordering by event_id
    # doesn't need the parsed value, so take the 1000 rows first and parse
    # only those.
    return (
        e.select("event_id", "props")
        .orderBy("event_id")
        .limit(1000)
        .select("event_id", F.get_json_object("props", "$.k").cast("int").alias("k_value"))
    )


@query(
    "q56_sorted_collect",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(array_agg(DISTINCT o_orderpriority ORDER BY o_orderpriority), '|') AS priorities
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    certifies="array aggregation (deterministic via sort) (SURVEY §2.10)",
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Surface the array as a '|'-joined string (registry dialect rule: nested
    # types are canonicalized to formatted strings so the driver's pandas
    # comparator can sort/hash them).
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias("priorities")
    )


# --------------------------------------------------------------------------
# Inline literal relation + multi-join star query
# --------------------------------------------------------------------------
@query(
    "q57_inline_lookup_join",
    oracle="""
    SELECT o.o_orderkey, m.label
    FROM orders o
    JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'), ('5-LOW', 'cold')) AS m(prio, label)
      ON o.o_orderpriority = m.prio
    ORDER BY o.o_orderkey
    """,
    certifies="inline literal relation + broadcast lookup join (SURVEY §2.10)",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    lookup = o.sparkSession.createDataFrame(
        [("1-URGENT", "hot"), ("2-HIGH", "hot"), ("5-LOW", "cold")], "prio string, label string"
    )
    return (
        o.join(F.broadcast(lookup), o.o_orderpriority == lookup.prio, "inner")
        .select("o_orderkey", "label")
    )


@query(
    "q58_star_join",
    oracle="""
    SELECT r_name, n_name, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS revenue_floor
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name, c_mktsegment
    ORDER BY r_name, n_name, c_mktsegment
    """,
    certifies="multi-join star query with dim chain (SURVEY §2.10)",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor("o_totalprice").cast("long")).cast("long").alias("revenue_floor"),
        )
    )


@query(
    "q59_sql_identical_text",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    certifies="SQL entry path: one ANSI statement runs verbatim on both engines",
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    # Exactly the oracle text — certifies dialect-portable SQL subset.
    return spark.sql(
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


# --------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary: money-exact via LONG integer cents, not
# DECIMAL — the 2-dp inputs convert to exact cent integers, products carry
# scale 4/6 as plain longs (peak magnitude ~1e17 at sf0.1, 64-bit-safe by
# >10x), half-up rounding is an add-half + integer div. Measured ~2.7x
# faster than the decimal(18,2) formulation (128-bit decimal sum vs long
# sum in the hash aggregate). At TB scale, re-check the overflow headroom:
# charge numerators grow ~1e11 per row, so ~1e7 rows per group is the safe
# ceiling — beyond that, partial-sum in DECIMAL(38,6) instead.
# --------------------------------------------------------------------------
@query(
    "q60_pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS dc,
             CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS tc
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(qc) AS BIGINT) / 100.0 AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(pc) AS BIGINT) / 100.0 AS DOUBLE) AS sum_base_price,
           CAST(((CAST(SUM(pc * (100 - dc)) AS BIGINT) + 50) // 100) / 100.0 AS DOUBLE) AS sum_disc_price,
           CAST(((CAST(SUM(pc * (100 - dc) * (100 + tc)) AS BIGINT) + 5000) // 10000) / 100.0 AS DOUBLE) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    certifies="money-exact aggregation in integer cents (TPC-H Q1 shape)",
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")

    def cents(c: str):
        return F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")

    qc, pc, dc, tc = cents("l_quantity"), cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qc) / F.lit(100.0)).cast("double").alias("sum_qty"),
            (F.sum(pc) / F.lit(100.0)).cast("double").alias("sum_base_price"),
            F.sum(pc * (F.lit(100) - dc)).alias("disc_num"),
            F.sum(pc * (F.lit(100) - dc) * (F.lit(100) + tc)).alias("charge_num"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            (F.expr("(disc_num + 50) div 100") / F.lit(100.0)).cast("double").alias("sum_disc_price"),
            (F.expr("(charge_num + 5000) div 10000") / F.lit(100.0)).cast("double").alias("sum_charge"),
            "count_order",
        )
    )


# --------------------------------------------------------------------------
# Pivot (wide conditional aggregation)
# --------------------------------------------------------------------------
_PIVOT_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q61_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    certifies="pivot / wide conditional aggregation (SURVEY §2.10)",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out = o.groupBy("o_orderstatus").pivot("o_orderpriority", _PIVOT_PRIOS).count()
    return out.na.fill(0, _PIVOT_PRIOS).select(
        "o_orderstatus", *[F.col(f"`{p}`").cast("long").alias(p) for p in _PIVOT_PRIOS]
    )


# --------------------------------------------------------------------------
# Variance from exact sums (portable; built-in stddev/var are float-sum-order
# dependent across engines, so the manual two-pass formula is the oracle-safe
# formulation)
# --------------------------------------------------------------------------
@query(
    "q62_variance_manual",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT) * CAST(FLOOR(o_totalprice) AS BIGINT)) AS DOUBLE) AS sx2
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           CAST(FLOOR((sx2 - sx * sx / n) / (n - 1)) AS BIGINT) AS var_floor
    FROM s ORDER BY o_orderstatus
    """,
    certifies="variance via exact integer sums (SURVEY §2.10 math gap)",
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    x = F.floor("o_totalprice").cast("long")
    s = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sx2"),
    )
    return s.select(
        "o_orderstatus",
        "n",
        F.floor((F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1))
        .cast("long")
        .alias("var_floor"),
    )


# --------------------------------------------------------------------------
# Approximate sketches (X2): engine-specific estimators — rows-only checks
# --------------------------------------------------------------------------
@query(
    "x36_approx_count_distinct",
    oracle=None,
    certifies="X2 approx distinct (HLL++; estimator engine-specific, no oracle)",
    tags=("approx", "no-oracle"),
)
def x36(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # default rsd (5%): HLL++ update cost scales with register count — rsd
    # 0.01 measured 5x slower for precision a cardinality monitor never needs
    return o.agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
    ).crossJoin(li.agg(F.approx_count_distinct("l_partkey").alias("approx_parts")))


@query(
    "x37_approx_percentile",
    oracle=None,
    certifies="X2 approx percentiles (KLL/GK sketch; estimator engine-specific)",
    tags=("approx", "no-oracle"),
)
def x37(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_quantity", [0.5, 0.9, 0.99], 10000).alias("qty_quantiles"),
    )


# --------------------------------------------------------------------------
# TPC-H Q3/Q5-shaped analytics over the star schema (fact-fact join through
# the orderkey, dim chain pruning) — the headline OLAP shapes.
# --------------------------------------------------------------------------
@query(
    "q63_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           CAST(((CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
                  + 50) // 100) / 100.0 AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS odate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY o_orderkey, odate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 20
    """,
    certifies="TPC-H Q3 shape: selective dim filter + fact-fact join + top-k by revenue",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    # Dim chain broadcast (filtered customers → filtered orders), the
    # lineitem fact streams shuffle-free into the per-order aggregate;
    # revenue in integer cents as in q60.
    pc = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dc = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    o_building = o.join(F.broadcast(c), c.c_custkey == o.o_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        li.join(F.broadcast(o_building), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("odate"), "o_orderpriority")
        .agg(F.sum(pc * (F.lit(100) - dc)).alias("rev_num"))
        .select(
            "o_orderkey",
            (F.expr("(rev_num + 50) div 100") / F.lit(100.0)).cast("double").alias("revenue"),
            "odate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q64_regional_volume",
    oracle="""
    SELECT n_name,
           CAST(((CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
                  + 50) // 100) / 100.0 AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    certifies="TPC-H Q5 shape: 6-table join with same-nation constraint",
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Star-schema join order: every dimension side is broadcast, so the
    # lineitem fact table streams through broadcast hash joins with NO
    # shuffle until the 5-row nation aggregate — the plan shape that holds
    # at 100 TB (dims fit executors; without CBO stats Spark keeps the
    # written order, so write the right one). Revenue in integer cents as
    # in q60 (~2.7x over DECIMAL sums).
    pc = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dc = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    c_asia = c.join(F.broadcast(n_asia), c.c_nationkey == n_asia.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_name"
    )
    o_asia = o.join(F.broadcast(c_asia), o.o_custkey == c_asia.c_custkey).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(o_asia), (F.col("l_orderkey") == F.col("o_orderkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(pc * (F.lit(100) - dc)).alias("rev_num"))
        .select(
            "n_name",
            (F.expr("(rev_num + 50) div 100") / F.lit(100.0)).cast("double").alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Exact (lower) median via row_number — engines disagree on interpolated
# median of doubles, so the deterministic formulation is positional.
# --------------------------------------------------------------------------
@query(
    "q65_median_manual",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS median_floor
    FROM ranked WHERE rn = (n + 1) // 2
    ORDER BY o_orderstatus
    """,
    certifies="exact positional median (SURVEY §2.10 math gap; interpolation-free)",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return ranked.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2)).select(
        "o_orderstatus", F.floor("o_totalprice").cast("long").alias("median_floor")
    )


@query(
    "q66_regexp_extract",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)$', 1) AS id_digits,
           CAST(regexp_matches(c_name, '^Customer#') AS BOOLEAN) AS is_customer
    FROM customer ORDER BY c_custkey
    """,
    certifies="regexp_extract / capture groups (F1/F2 regex family, SURVEY §2.10)",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("id_digits"),
        F.col("c_name").rlike("^Customer#").alias("is_customer"),
    )


# --------------------------------------------------------------------------
# x68 — max_by / min_by grouped argmax (SURVEY §2.10 aggregates)
#
# The single-pass argmax aggregate (no window, no self-join): per order
# status, which customer placed the priciest order. DuckDB's arg_max can't
# take a struct comparator, so ties are broken deterministically via a
# zero-padded sortable STRING comparator (lexicographic == numeric for
# fixed width; price folded to exact integer cents first) — identical
# construction in both dialects.
# --------------------------------------------------------------------------
@query(
    "x68_grouped_argmax",
    oracle="""
    WITH keyed AS (
      SELECT o_orderstatus, o_custkey, o_orderkey, o_totalprice,
             LPAD(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 18, '0')
               || LPAD(CAST(o_custkey AS VARCHAR), 18, '0') AS price_key,
             strftime(o_orderdate, '%Y%m%d')
               || LPAD(CAST(o_orderkey AS VARCHAR), 18, '0') AS date_key
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(arg_max(o_custkey, price_key) AS BIGINT) AS top_custkey,
           ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 2) AS top_price,
           CAST(arg_min(o_orderkey, date_key) AS BIGINT) AS earliest_orderkey
    FROM keyed
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    certifies="argmax/argmin aggregates (max_by/min_by), single-pass grouped top-1",
    tags=("agg",),
)
def x68(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    price_key = F.concat(
        F.lpad(F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 18, "0"),
        F.lpad(F.col("o_custkey").cast("string"), 18, "0"),
    )
    date_key = F.concat(
        F.date_format(F.col("o_orderdate"), "yyyyMMdd"),
        F.lpad(F.col("o_orderkey").cast("string"), 18, "0"),
    )
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_custkey", price_key).cast("long").alias("top_custkey"),
        F.round(F.max("o_totalprice").cast("double"), 2).alias("top_price"),
        F.min_by("o_orderkey", date_key).cast("long").alias("earliest_orderkey"),
    )


# --------------------------------------------------------------------------
# x69 — array-function Jaccard over consecutive doc pairs
#
# The ARRAY-NATIVE similarity form (array_intersect/array_union on distinct
# token arrays — no explode, no shuffle beyond the pair join): each doc
# compared to doc_id+1. Same integer-exact ratio discipline as the
# inverted-index family; certifies the array set-operation functions
# themselves. The oracle reformulates with unnest (DuckDB's list_intersect
# has different NULL semantics — semantics, not implementation, must match).
# --------------------------------------------------------------------------
@query(
    "x69_adjacent_doc_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.t AS ta, b.t AS tb
      FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    ), sized AS (
      SELECT doc_a, doc_b,
             len(list_filter(ta, x -> list_contains(tb, x))) AS inter,
             len(ta) + len(tb) - len(list_filter(ta, x -> list_contains(tb, x))) AS uni
      FROM pairs
    )
    SELECT doc_a, doc_b,
           CAST(inter AS BIGINT) AS n_shared,
           CAST((inter * 2000 + uni) // (2 * uni) / 1000.0 AS DOUBLE) AS jaccard
    FROM sized ORDER BY doc_a
    """,
    certifies="array set-operation functions (array_intersect/union) as similarity primitive",
    tags=("llm", "dedup", "array"),
)
def x69(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.functions import ratio_round
    from pipeline_etl_website_visits_spark.operators.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(normalize_text(F.col("text")), " ")).alias("t")
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    b = toks.select((F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    uni = F.size("ta") + F.size("tb") - inter
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("n_shared"),
            ratio_round(inter, uni, 3).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# x70 — full JSON struct parse + typed aggregation
#
# q55 extracts one scalar path; this parses the whole props object to a
# TYPED struct (from_json with explicit schema — schema-on-read, the 100 TB
# pattern: parse once in the scan projection, never re-parse per field) and
# aggregates on the typed field. Decile bucketing keeps outputs integral.
# --------------------------------------------------------------------------
@query(
    "x70_json_struct_agg",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS INT) AS k_decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    certifies="from_json typed struct parse + aggregation on parsed field (SURVEY §2.10 json)",
    tags=("json", "events"),
)
def x70(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: Jackson JSON parse is per-row compute that would otherwise
    # serialize through the single-split scan's one task (tables._fan_out)
    ev = load_table(spark, sf_dir, "events", fan_out=True)
    parsed = ev.select(
        "event_id", F.from_json("props", "k bigint").alias("p")
    ).filter(F.col("p.k").isNotNull())
    return (
        parsed.groupBy(F.floor(F.col("p.k") / 10).cast("int").alias("k_decile"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("event_id").cast("long").alias("min_event_id"),
        )
    )


# --------------------------------------------------------------------------
# x77 — statistical aggregate family (corr / covar / stddev / skew / kurt)
#
# Dialect traps resolved empirically at all three SFs: Spark's skewness is
# the POPULATION g1 while DuckDB's is the bias-corrected sample G1 — the
# oracle converts exactly via g1 = G1 * (n-2) / sqrt(n*(n-1)); Spark's
# kurtosis matches DuckDB's kurtosis_pop (both population excess).
# Roundings chosen so distributed-vs-single-pass accumulation-order noise
# (~1e-12 relative) can never flip a digit.
# --------------------------------------------------------------------------
@query(
    "x77_stat_aggregates",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 3) AS covar_qty_price,
           ROUND(stddev_samp(l_extendedprice), 3) AS sd_price,
           ROUND(skewness(l_extendedprice) * (COUNT(*) - 2) / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 5) AS skew_price,
           ROUND(kurtosis_pop(l_extendedprice), 5) AS kurt_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    certifies="statistical aggregates: corr/covar_samp/stddev_samp/skewness/kurtosis (SURVEY §2.10 math family)",
    tags=("agg", "stats"),
)
def x77(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 3).alias("sd_price"),
        F.round(F.skewness("l_extendedprice"), 5).alias("skew_price"),
        F.round(F.kurtosis("l_extendedprice"), 5).alias("kurt_price"),
    )


# --------------------------------------------------------------------------
# x79 — recursive CTE semantics (bounded hierarchy walk)
#
# The oracle is WITH RECURSIVE (UNION ALL form) over a synthetic binary
# tree on order keys (parent(k) = k // 2 — acyclic, every node reached
# exactly once). Rounds 3-4 ran the IDENTICAL statement through Spark
# 4.1's own WITH RECURSIVE, which executes one job per recursion LEVEL
# (UnionLoopExec) — a measured ~0.8-1.1 s scheduling floor REGARDLESS of
# input size (~80 ms/level × ~11 levels; DuckDB's in-process recursion
# does the walk in ~50 ms). Per VERDICT r4 item 5 the Spark side is now an
# algebraic twin that runs the whole walk in ONE job:
#
#   The recursion's WHERE (o_orderkey < 1024) statically bounds the
#   entire walk to <1024 keys — every row the fixpoint can ever touch is
#   ~8 KB. So the plan is: pushed-down, zonemap-pruned key-range scan →
#   ONE collect job (size-guarded against the bound) → the fixpoint runs
#   on the driver → the 10-row aggregate returns as a local relation.
#   Exactly the constant-folding a planner should do for a provably-
#   bounded recursion, and what DuckDB itself does (in-process recursion
#   over the pruned range). At 100 TB the scan is the same pruned
#   <1024-key read, so cost is invariant in corpus size. Measured: 1.09 s
#   (UnionLoopExec, r4) → ~0.1 s.
#
#   This bounded-inline rule is NOT the general recursion path: when the
#   frontier is unbounded or the parent relation is data (arbitrary edge
#   lists), the engine's iterative driver-loop pattern is the recursive-
#   CTE replacement — lineage-truncated per-round DataFrame jobs, as
#   dedup_clusters (x71) and pagerank (x98) certify. Two rejected
#   middles, both dominated by fixed per-stage overhead on a 1022-row
#   working set: a single-task Arrow BFS kernel (0.31 s — one Python
#   worker round trip) and ancestor-path factorization (explode each key
#   into its ≤log2(B) proper ancestors + one equi-join; 1.9 s — three
#   shuffle stages). The latter IS the right shape when the bound is too
#   big to collect but the parent stays key-computable.
# --------------------------------------------------------------------------
_X79_SQL = """
    WITH RECURSIVE walk(k, depth) AS (
      SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
      UNION ALL
      SELECT o.o_orderkey, w.depth + 1
      FROM orders o JOIN walk w ON CAST(FLOOR(o.o_orderkey / 2) AS BIGINT) = w.k
      WHERE o.o_orderkey > 1 AND o.o_orderkey < 1024 AND w.depth < 30
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM walk GROUP BY depth ORDER BY depth
"""


@query(
    "x79_recursive_cte",
    oracle=_X79_SQL,
    certifies="recursive CTE semantics (WITH RECURSIVE, UNION ALL form) — the DuckDB oracle runs the statement; the Spark side is a bounded driver-side fixpoint twin over the pushed-down key set (<1024 keys, guarded), replacing Spark's per-level UnionLoopExec job floor; x123 keeps Spark's native WITH RECURSIVE path exercised",
    tags=("sql", "recursive"),
)
def x79(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keys eligible to appear in the walk (the recursion's own WHERE,
    # pushed down to the parquet scan); <1024 rows by the same predicate
    keys = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .filter((F.col("k") > 1) & (F.col("k") < 1024))
    )
    rows = keys.collect()
    # The WHERE bound (k < 1024) is what makes this collect legal; the
    # check guards FUTURE EDITS that widen the filter without revisiting
    # the driver-side fixpoint (a real exception, not an assert — asserts
    # strip under -O). It counts raw rows, pre-dedup, so a duplicate-key
    # regression in the source also trips it.
    if len(rows) >= 1024:
        raise ValueError(
            "bounded-recursion contract violated: the pushed-down key range "
            f"returned {len(rows)} rows; widen-the-filter edits must move this "
            "query to the iterative-loop pattern (x71/x98)"
        )
    present = {r["k"] for r in rows}

    # the UNION ALL fixpoint: anchor k=1 at depth 0; children of p are
    # exactly {2p, 2p+1} (floor(k/2) = p), admitted while parent
    # depth < 30. Acyclic + unique keys => each node reached once.
    depths: dict[int, int] = {1: 0}
    frontier, d = [1], 0
    while frontier and d < 30:
        frontier = [c for p in frontier for c in (2 * p, 2 * p + 1) if c in present]
        d += 1
        for c in frontier:
            depths[c] = d
    agg: dict[int, list[int]] = {}
    for k, dd in depths.items():
        row = agg.setdefault(dd, [0, k, k])
        row[0] += 1
        row[1] = min(row[1], k)
        row[2] = max(row[2], k)
    import pandas as pd

    # pandas input -> Arrow LocalRelation: collect() is job-free (a python
    # list would parallelize into default-parallelism tasks instead)
    return spark.createDataFrame(
        pd.DataFrame(
            [(dd, n, lo, hi) for dd, (n, lo, hi) in sorted(agg.items())],
            columns=["depth", "n_nodes", "min_key", "max_key"],
        ),
        "depth int, n_nodes long, min_key long, max_key long",
    )


# --------------------------------------------------------------------------
# x123 — WITH RECURSIVE executed NATIVELY by Spark (UnionLoopExec)
#
# x79 certifies recursive-CTE *semantics* through a driver-side fixpoint
# twin (its ~30-level walk pays Spark's one-job-per-level UnionLoopExec
# floor); ADVICE r5 asked that the engine's own recursion path stay
# exercised too. This query IS that: identical WITH RECURSIVE statement
# text on both engines, Spark executing the recursive union itself. The
# walk is kept shallow (customer keys < 32 → 4 levels; was <128/7 levels
# until the per-level job floor — ~0.15 s/level at sf0.1, scheduling +
# a cached-view probe per iteration — made this single query ~2% of the
# whole 154-query suite's wall) so that floor stays a bounded constant
# independent of data scale — the documented trade: native recursion for bounded depth, the
# x79/x71/x98 iterative-driver pattern when depth × job-floor would
# dominate. Its wall-clock IS the UnionLoopExec floor, not a plan defect.
# --------------------------------------------------------------------------
_X123_SQL = """
    WITH RECURSIVE walk(k, depth) AS (
      SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
      UNION ALL
      SELECT c.c_custkey, w.depth + 1
      FROM customer c JOIN walk w ON CAST(FLOOR(c.c_custkey / 2) AS BIGINT) = w.k
      WHERE c.c_custkey > 1 AND c.c_custkey < 32 AND w.depth < 5
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM walk GROUP BY depth ORDER BY depth
"""


@query(
    "x123_native_recursion",
    oracle=_X123_SQL,
    certifies="recursive CTE, natively executed: Spark's UnionLoopExec runs the identical WITH RECURSIVE statement text as the oracle (shallow bounded walk — the regime where per-level job overhead is a constant, not the bill)",
    tags=("sql", "recursive"),
)
def x123(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The statement scans `customer` once PER RECURSION LEVEL (UnionLoopExec
    # re-executes the step's plan); registering the view as the cached,
    # pre-filtered key projection (the recursion's own WHERE — semantics
    # unchanged, the x79-round-4 prescription) makes each level an
    # in-memory probe instead of a parquet scan: measured 1.88 s → 1.24 s
    # at sf0.1. Round-11 floor attack: AQE OFF for the statement — AQE
    # re-plans and re-measures EVERY recursion level (29 Spark jobs per
    # run vs 22 without; min-of-3 1.44 s → 1.00 s at sf0.1), and a
    # 30-row-per-level loop has nothing for AQE to adapt. The residual
    # ~45 ms/job × 22 jobs IS the UnionLoopExec scheduling floor
    # (docs/SCALE.md round-11 note); the driver-fixpoint twin (x79) is
    # the shape for recursions where that floor matters.
    import pandas as pd

    keys = (
        _t(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") > 1) & (F.col("c_custkey") < 32))
        .select("c_custkey")
        .cache()
    )
    keys.createOrReplaceTempView("customer")
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # materialize EAGERLY inside the cache scope (triangle_count
        # discipline): the recursion's per-level probes hit the cache,
        # then the cache is released — repeated gate/bench invocations
        # must not accumulate pinned storage for the session lifetime.
        # The result is bounded (one row per depth level) so collecting
        # and re-wrapping as an Arrow LocalRelation is free.
        rows = spark.sql(_X123_SQL).toPandas()
    finally:
        # drop the view too: leaving a filtered single-column relation
        # registered under the real table's name would silently corrupt
        # any later same-session consumer that reads `customer` without
        # re-registering it
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.catalog.dropTempView("customer")
        keys.unpersist()
    return spark.createDataFrame(
        rows.astype(
            {"depth": "int32", "n_nodes": "int64", "min_key": "int64", "max_key": "int64"}
        )
        if len(rows)
        else pd.DataFrame(
            {
                "depth": pd.Series(dtype="int32"),
                "n_nodes": pd.Series(dtype="int64"),
                "min_key": pd.Series(dtype="int64"),
                "max_key": pd.Series(dtype="int64"),
            }
        ),
        "depth int, n_nodes long, min_key long, max_key long",
    )


# --------------------------------------------------------------------------
# x80 — TPC-H Q9 shape: product-line profit by supplier nation and year
#
# The widest join in the suite (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈
# nation): the fact table streams once through BROADCAST true dims (part
# filtered by name, supplier, nation), joins orders under planner choice
# (auto-broadcast of the narrow key+date projection at bench scale; shuffle
# join via AQE at real scale — orders is itself a fact, so its strategy
# must stay data-driven, never forced), then one shuffle on the
# (nation, year) group key. There is no partsupp table in the test schema,
# so cost is derived from part.p_retailprice (80% of retail per unit) —
# the join/aggregate SHAPE is Q9's, which is what this certifies. Money in
# integer cents end-to-end (the q60/q63 discipline); profit = revenue_cents
# − cost_cents stays exact BIGINT until the final display division.
# --------------------------------------------------------------------------
@query(
    "x80_product_profit",
    oracle="""
    SELECT n_name AS supp_nation,
           CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
           CAST(((SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                      - 100 * CAST(FLOOR(p_retailprice * 80 + 0.5) AS BIGINT)
                            * CAST(l_quantity AS BIGINT))
                  + 50) // 100) / 100.0 AS DOUBLE) AS profit,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY supp_nation, o_year
    ORDER BY supp_nation, o_year
    """,
    certifies="TPC-H Q9 shape: 5-table fact-through-broadcast-dims join, profit rollup by nation x year",
    tags=("olap",),
)
def x80(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Narrow every relation to exactly the joined/aggregated columns before
    # the joins (broadcast builds then carry only what they must), force
    # broadcast ONLY for the true dims (filtered part, supplier, nation) and
    # let the planner pick the orders⋈lineitem strategy: at bench scale the
    # projected orders side auto-broadcasts anyway; at 100 TB orders is a
    # fact table and forcing a broadcast would be the wrong plan — AQE
    # downgrades it to a shuffle join exactly when it must.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    price_c = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc_c = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    cost_c = F.floor(F.col("p_retailprice") * 80 + F.lit(0.5)).cast("long")
    profit_c = price_c * (F.lit(100) - disc_c) - F.lit(100) * cost_c * F.col("l_quantity").cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit_c).alias("profit_num"), F.count("*").alias("n_lines"))
        .select(
            "supp_nation",
            "o_year",
            (F.expr("(profit_num + 50) div 100") / F.lit(100.0)).cast("double").alias("profit"),
            F.col("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("supp_nation", "o_year")
    )


# --------------------------------------------------------------------------
# x81 — TPC-H Q8 shape: a nation's market share within a region, by year
#
# Conditional-aggregate ratio over the same fact-through-dims join family
# as x80: customer-side region filter (AMERICA via nation→region chain) and
# a share numerator keyed on the SUPPLIER's nation. Exercises the
# "aggregate-of-case" idiom (share = SUM(CASE)/SUM(all)) that Q8 is the
# canonical test for. Numerator and denominator both stay in exact integer
# cents; the share is one final double division of two BIGINTs (bit-exact
# across engines for identical inputs).
# --------------------------------------------------------------------------
@query(
    "x81_market_share",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_6'
                         THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                              * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                         ELSE 0 END) AS BIGINT) AS nation_vol,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS total_vol,
           ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_6'
                               THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                                    * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                               ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE), 6) AS share
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region ON r_regionkey = cn.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE r_name = 'AMERICA'
    GROUP BY o_year
    ORDER BY o_year
    """,
    certifies="TPC-H Q8 shape: 7-table join, conditional-aggregate market-share ratio by year",
    tags=("olap",),
)
def x81(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # customer-side dim chain folds to one broadcast: customers in AMERICA
    cust_america = (
        cust.join(
            F.broadcast(
                nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
                .filter(F.col("r_name") == "AMERICA")
                .select("n_nationkey")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_n_name"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_n_name")
    vol_c = (
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        * (F.lit(100) - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long"))
    )
    # The cust_america key set is a join OUTPUT, so the planner has no size
    # stats for it and (AQE off) would fall back to sort-merge; the hint
    # restores the broadcast the statistics would justify. Same for the
    # 3-column orders projection. At 100 TB both are fact-sized and these
    # hints must go — the production session (session.py) keeps AQE on
    # precisely so the runtime row counts make this call adaptively.
    grouped = (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_america), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_n_name") == "NATION_6", vol_c).otherwise(F.lit(0))).alias("nation_vol"),
            F.sum(vol_c).alias("total_vol"),
        )
    )
    return grouped.select(
        "o_year",
        F.col("nation_vol").cast("long").alias("nation_vol"),
        F.col("total_vol").cast("long").alias("total_vol"),
        F.round(F.col("nation_vol").cast("double") / F.col("total_vol").cast("double"), 6).alias("share"),
    ).orderBy("o_year")


# --------------------------------------------------------------------------
# x87 — correlated EXISTS / NOT EXISTS (decorrelation certificate)
#
# The textual correlated-subquery surface, identical statement on both
# engines: Catalyst must decorrelate EXISTS into a left-semi and NOT EXISTS
# into a left-anti join (the DataFrame twins are certified by q13/q11; this
# certifies the SQL entry path and the rewrite itself — plan asserted in
# test_plans).
# --------------------------------------------------------------------------
_X87_SQL = """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    ORDER BY c_custkey
"""


@query(
    "x87_correlated_exists",
    oracle=_X87_SQL,
    certifies="correlated EXISTS/NOT EXISTS decorrelation to semi/anti joins — identical statement text both engines",
    tags=("sql",),
)
def x87(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_X87_SQL)


# --------------------------------------------------------------------------
# x88 — LATERAL correlated top-k join
#
# Per-customer top-2 orders via a correlated LATERAL subquery with
# ORDER BY + LIMIT — the SQL form of grouped top-k (DataFrame twin: q15's
# window row_number). Identical statement text on both engines; Spark
# plans the correlation as a rewritten join, and the outer c_custkey < 100
# bound keeps the lateral fan-out a pruned scan on the customer side.
# --------------------------------------------------------------------------
_X88_SQL = """
    SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    )
    WHERE c_custkey < 100 ORDER BY c_custkey, o_orderkey
"""


@query(
    "x88_lateral_topk",
    oracle=_X88_SQL,
    certifies="LATERAL correlated subquery with per-row ORDER BY/LIMIT (grouped top-k SQL form) — identical statement text both engines",
    tags=("sql",),
)
def x88(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_X88_SQL)


# --------------------------------------------------------------------------
# x91 — mergeable HLL sketches: two-level approx-distinct rollup
#
# The SCALE half of the approx-distinct story (x36 is the direct form):
# per-nation Apache DataSketches HLL sketches built in one pass, then
# UNIONED to region level — sketches, not raw keys, cross the second
# shuffle. This is the pattern that makes distinct-count rollups reusable
# at 100 TB: per-partition/day sketches are stored once and any coarser
# rollup (region, month, whole-corpus) is a cheap sketch-union, never a rescan.
# DuckDB has no compatible sketch type → rows-only driver check; the
# estimate-vs-exact tolerance is pinned in tests/test_operators.py.
# --------------------------------------------------------------------------
@query(
    "x91_hll_union_rollup",
    oracle=None,
    certifies="X2 mergeable distinct sketches: hll_sketch_agg per nation → hll_union_agg per region → estimate",
    tags=("approx", "no-oracle"),
)
def x91(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", 14).alias("sk"),
        F.count("*").alias("n_rows"),
    )
    return (
        per_nation.join(F.broadcast(nation), per_nation.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_regionkey").cast("int").alias("region"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk", True)).cast("long").alias("approx_customers"),
            F.sum("n_rows").cast("long").alias("exact_rows"),
        )
        .orderBy("region")
    )


# --------------------------------------------------------------------------
# x93 — Z-order (Morton) clustering zone map
#
# Multi-dimensional data-layout clustering: interleave (p_size, price
# bucket) into one z-value, bucket by its prefix (the "file" a z-sorted
# writer would emit), and report per-bucket min/max of BOTH dims — the
# zone-map envelopes a reader prunes with. The oracle reproduces the bit
# interleave with native >> & << arithmetic, so the layout is verified
# value-exact, not just shape-wise.
# --------------------------------------------------------------------------
def _z_interleave_sql(a: str, b: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "x93_zorder_zone_map",
    oracle=f"""
    WITH dims AS (
      SELECT p_size AS a,
             LEAST(CAST(FLOOR(p_retailprice / 32) AS INT), 63) AS b
      FROM part
    ), z AS (
      SELECT a, b, ({_z_interleave_sql('a', 'b', 6)}) >> 6 AS zone FROM dims
    )
    SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(a) AS INT) AS a_min, CAST(MAX(a) AS INT) AS a_max,
           CAST(MIN(b) AS INT) AS b_min, CAST(MAX(b) AS INT) AS b_max
    FROM z GROUP BY zone ORDER BY zone
    """,
    certifies="Z-order multi-dimensional clustering / zone-map data skipping (SURVEY §4 scale levers)",
    tags=("layout", "scale"),
)
def x93(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.layout import zorder_zone_map

    part = _t(spark, sf_dir, "part")
    a = F.col("p_size")
    b = F.least(F.floor(F.col("p_retailprice") / 32).cast("int"), F.lit(63))
    return zorder_zone_map(part, a, b, bits=6, prefix_shift=6)


# --------------------------------------------------------------------------
# x94 — incremental materialized-view maintenance (mergeable agg state)
#
# The warehouse pattern the reference's nightly full-recompute can't afford
# at 100 TB: keep a per-key aggregate STATE table and fold each new batch
# in by merging partial-aggregate states (counts add, sums add, max/last
# take greatest) instead of rescanning history. Composes the same
# merge_upsert/rule machinery as the visitantes upsert (J2). The oracle is
# the full recompute over base ∪ delta — merged state must equal it
# exactly, which is precisely the algebraic-mergeability contract.
# --------------------------------------------------------------------------
_MV_CUTOFF = "1997-01-01"


@query(
    "x94_incremental_mv",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(MAX(o_orderdate) AS DATE) AS last_date
    FROM orders GROUP BY o_custkey
    """,
    certifies="incremental materialized-view maintenance via mergeable partial-aggregate state (SURVEY §4; composes J2 merge rules)",
    tags=("warehouse", "scale"),
)
def x94(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import merge as M

    orders = _t(spark, sf_dir, "orders")

    def agg_state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price"),
            F.max("o_totalprice").alias("max_price"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        )

    cutoff = F.lit(_MV_CUTOFF).cast("date")
    base = agg_state(orders.filter(F.col("o_orderdate").cast("date") < cutoff))
    delta = agg_state(orders.filter(F.col("o_orderdate").cast("date") >= cutoff))
    merged = M.merge_upsert(
        base,
        delta,
        "o_custkey",
        {
            "n_orders": M.add_counters,
            "total_price": M.add_counters,
            "max_price": M.greatest_of,
            "last_date": M.greatest_of,
        },
        # o_custkey is non-null: plain-equality join reuses the two agg
        # exchanges instead of re-shuffling on (coalesce(k,0), isnull(k))
        null_safe=False,
    )
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("total_price").cast("double"), 2).alias("total_price"),
        F.col("max_price").cast("double").alias("max_price"),
        F.col("last_date").cast("date").alias("last_date"),
    )


# --------------------------------------------------------------------------
# x95 — skyline / Pareto frontier (two-phase local→global sweep)
#
# "Largest part for the least money": rows no other row dominates on
# (p_size max, p_retailprice min). The oracle is the quadratic NOT EXISTS
# self-join; the engine runs the two-phase skyline (operators/skyline.py)
# — batch-local vectorized sweeps, then one pass over the tiny survivor
# union. Same answer, nothing O(n²), nothing driver-side.
# --------------------------------------------------------------------------
@query(
    "x95_skyline_pareto",
    oracle="""
    SELECT p_partkey, CAST(p_size AS INT) AS p_size,
           CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_size >= a.p_size AND b.p_retailprice <= a.p_retailprice
        AND (b.p_size > a.p_size OR b.p_retailprice < a.p_retailprice)
    )
    ORDER BY p_partkey
    """,
    certifies="skyline / Pareto-dominance query via two-phase local-global sweep (north-star analytics)",
    tags=("analytics", "scale"),
)
def x95(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.skyline import skyline_2d

    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("int").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return skyline_2d(part, "p_size", "p_retailprice").orderBy("p_partkey")


# --------------------------------------------------------------------------
# x99 — TPC-H Q13 shape: customer order-count distribution (custdist)
#
# Completes the classic-OLAP fleet next to x80 (Q9) and x81 (Q8): a LEFT
# join whose non-key predicate lives in the JOIN CONDITION (zero-order
# customers must survive with count 0), a per-customer count, then the
# distribution of those counts. Scale: one shuffle join on custkey (orders
# side pre-filtered at the scan), then a second agg over at most
# |distinct counts| rows — effectively free after the map-side combine.
# --------------------------------------------------------------------------
@query(
    "x99_custdist",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    certifies="TPC-H Q13 shape: left join with non-key condition + two-level count distribution",
    tags=("olap",),
)
def x99(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# x102 — VARIANT semi-structured path (schema-less shredding)
#
# x70 parses props with a DECLARED schema (from_json); this is the Spark 4
# VARIANT path — parse once to the binary variant encoding, extract typed
# paths at query time with no schema up front (the lakehouse
# semi-structured pattern: land JSON as VARIANT, shred lazily). Aggregates
# on the extracted value + counts a missing path to pin null-path
# semantics. Oracle = the identical json_extract arithmetic in DuckDB.
# --------------------------------------------------------------------------
@query(
    "x102_variant_extract",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS INT) AS k_mod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(COUNT(*) FILTER (WHERE json_extract_string(props, '$.missing') IS NULL) AS BIGINT) AS n_missing_path
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    certifies="VARIANT semi-structured type: parse_json + variant_get typed path extraction without a declared schema (Spark 4 surface)",
    tags=("json", "events"),
)
def x102(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: parse_json is per-row compute on a single-split scan
    ev = load_table(spark, sf_dir, "events", fan_out=True)
    v = ev.select(F.parse_json(F.col("props")).alias("v"))
    shredded = v.select(
        F.variant_get(F.col("v"), "$.k", "bigint").alias("k"),
        F.variant_get(F.col("v"), "$.missing", "bigint").alias("m"),
    ).filter(F.col("k").isNotNull())
    return (
        shredded.groupBy((F.col("k") % 7).cast("int").alias("k_mod"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.count_if(F.col("m").isNull()).cast("long").alias("n_missing_path"),
        )
        .orderBy("k_mod")
    )


# --------------------------------------------------------------------------
# x103 — cohort retention matrix (product analytics)
#
# Cohort = each user's first-seen day; cell (cohort, day_offset) = distinct
# users of that cohort active day_offset days later. The shape: a
# self-derived dimension (MIN per user), joined back to the fact, then a
# distinct + matrix count. Scale: the firsts agg and the join share the
# user_id shuffle key (partitioning reuse — same discipline as x94), and
# the distinct is on (user, cohort, offset) — bounded by user-days, far
# below raw events.
# --------------------------------------------------------------------------
@query(
    "x103_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(CAST(e.ts AS DATE) - f.cohort_day AS INT) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity GROUP BY 1, 2 ORDER BY 1, 2
    """,
    certifies="cohort retention matrix: self-derived first-seen dimension + distinct activity matrix (north-star analytics)",
    tags=("events", "analytics"),
)
def x103(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("int").alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------------
# x107 — SCD Type 2 dimension maintenance
#
# The versioned-dimension pattern every warehouse needs: an update batch
# closes changed current rows at the effective date and opens new
# versions; no-op updates (same attributes) and history pass through.
# Engine side: operators/merge.scd2_apply — ONE dim scan, broadcast batch,
# per-row 1-or-2-version explode. Oracle: the UNION-of-cases SQL
# reformulation. Batch here: every 7k+3 customer moves to 'PROMO' (real
# changes) and every 7k+5 "changes" to its existing segment (no-ops that
# must NOT version).
# --------------------------------------------------------------------------
@query(
    "x107_scd2_dimension",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment, DATE '1995-01-01' AS valid_from,
             DATE '9999-12-31' AS valid_to, TRUE AS is_current
      FROM customer
    ), upd AS (
      SELECT c_custkey, 'PROMO' AS new_seg FROM customer WHERE c_custkey % 7 = 3
      UNION ALL
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 7 = 5
    ), changed AS (
      SELECT d.c_custkey, d.c_mktsegment AS old_seg, u.new_seg
      FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
      WHERE d.is_current AND d.c_mktsegment <> u.new_seg
    )
    SELECT c_custkey, c_mktsegment, valid_from, valid_to, is_current
    FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
    UNION ALL
    SELECT c_custkey, old_seg, DATE '1995-01-01', DATE '2000-06-01', FALSE FROM changed
    UNION ALL
    SELECT c_custkey, new_seg, DATE '2000-06-01', DATE '9999-12-31', TRUE FROM changed
    ORDER BY c_custkey, valid_from
    """,
    certifies="SCD Type 2 versioned-dimension maintenance (close-and-open with no-op suppression; SURVEY §4 warehouse)",
    tags=("warehouse", "scale"),
)
def x107(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.merge import scd2_apply

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit("9999-12-31").cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        cust.filter(F.col("c_custkey") % 7 == 3)
        .select("c_custkey", F.lit("PROMO").alias("c_mktsegment"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 7 == 5).select("c_custkey", "c_mktsegment")
        )
    )
    return scd2_apply(
        dim, updates, "c_custkey", ["c_mktsegment"], effective_date="2000-06-01"
    )  # no final orderBy (the x82 discipline, r15)


# --------------------------------------------------------------------------
# x108 — point-in-time (AS OF) lookup against the SCD2 dimension
#
# The consumer side of x107: each order picks the dimension VERSION that
# was valid on its order date (pre-2000-06 orders see the original
# segment, later ones see PROMO for changed customers). Equi-join on the
# key with the validity range as a join-side filter — the dim broadcasts,
# so the planner keeps a hash join (never a nested loop) and the range
# check rides along for free.
# --------------------------------------------------------------------------
@query(
    "x108_scd2_asof_lookup",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment, DATE '1995-01-01' AS valid_from,
             DATE '9999-12-31' AS valid_to, TRUE AS is_current
      FROM customer
    ), changed AS (
      SELECT c_custkey, c_mktsegment AS old_seg, 'PROMO' AS new_seg
      FROM customer WHERE c_custkey % 7 = 3 AND c_mktsegment <> 'PROMO'
    ), versions AS (
      SELECT c_custkey, c_mktsegment, valid_from, valid_to
      FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
      UNION ALL
      SELECT c_custkey, old_seg, DATE '1995-01-01', DATE '2000-06-01' FROM changed
      UNION ALL
      SELECT c_custkey, new_seg, DATE '2000-06-01', DATE '9999-12-31' FROM changed
    )
    SELECT v.c_mktsegment AS segment,
           CAST(strftime(o.o_orderdate, '%Y') AS INT) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN versions v
      ON o.o_custkey = v.c_custkey
     AND CAST(o.o_orderdate AS DATE) >= v.valid_from
     AND CAST(o.o_orderdate AS DATE) < v.valid_to
    GROUP BY segment, o_year ORDER BY segment, o_year
    """,
    certifies="point-in-time (AS OF) dimension lookup over SCD2 versions (temporal join; composes x107)",
    tags=("warehouse", "join", "scale"),
)
def x108(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.merge import scd2_apply

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit("9999-12-31").cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = cust.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey", F.lit("PROMO").alias("c_mktsegment")
    )
    versions = scd2_apply(dim, updates, "c_custkey", ["c_mktsegment"], "2000-06-01")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("o_date")
    )
    joined = orders.join(
        F.broadcast(versions),
        (orders.o_custkey == versions.c_custkey)
        & (F.col("o_date") >= F.col("valid_from"))
        & (F.col("o_date") < F.col("valid_to")),
    )
    return (
        joined.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_date").cast("int").alias("o_year"),
        )
        .agg(F.count("*").cast("long").alias("n_orders"))
        # no final orderBy (the x82 discipline, r15): determinism-only sort
    )


# --------------------------------------------------------------------------
# x109 — TPC-H Q21 shape: suppliers who shipped last in shared orders
#
# The benchmark's hardest decorrelation pattern: TWO correlated subqueries
# on the same fact table (EXISTS another supplier in the order, NOT EXISTS
# a later-shipping other supplier), plus dimension joins and a grouped
# top-k. Catalyst must turn the EXISTS into a left-semi and the NOT EXISTS
# into a left-anti self-join of lineitem on l_orderkey — three passes over
# the fact co-partitioned on the SAME join key, so at 100 TB the three
# scans share one exchange footprint (AQE reuses the l_orderkey shuffle),
# never a per-row subquery loop. Identical statement text on both engines
# (reference has no subqueries at all — SURVEY §2.10 gap map; adapted from
# TPC-H Q21 with l_shipdate standing in for the receipt/commit delay, as
# the test schema carries no receiptdate).
# --------------------------------------------------------------------------
_X109_SQL = """
    SELECT n_name, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s, lineitem l1, orders o, nation n
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
      AND s.s_nationkey = n.n_nationkey
    GROUP BY n_name, s_name ORDER BY numwait DESC, s_name LIMIT 25
"""


@query(
    "x109_waiting_supplier",
    oracle=_X109_SQL,
    certifies="TPC-H Q21 shape: double correlated subquery (EXISTS + NOT EXISTS) over the fact table — the DuckDB oracle runs the statement; the Spark side is a single-scan window-aggregate decorrelation (one lineitem pass, one order-key shuffle; plan-asserted Window, no semi/anti self-joins)",
    tags=("sql", "tpch"),
)
def x109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan window decorrelation (VERDICT r4 item 4).

    Catalyst decorrelates the statement's EXISTS/NOT EXISTS into semi/anti
    self-joins — three passes over lineitem. Both quantifiers only depend
    on per-order extrema, so ONE pass over lineitem (pre-filtered to
    F-orders — the subqueries are correlated on the same l_orderkey, so
    the status filter commutes) evaluates them as CODEGEN window
    aggregates over the l_orderkey partition — max/min/conditional-max,
    no collect_list objects (an array-HOF variant measured 1.3 s in the
    ObjectHashAggregate alone):

    - EXISTS other-supplier line  ⟺  min(suppkey) ≠ max(suppkey);
    - NOT EXISTS later-shipping other supplier  ⟺  shipdate ≥ other_max,
      where other_max = the order's global max shipdate m1 when some
      OTHER supplier attains it (this row's supplier differs from a
      max-attaining one, or two different suppliers attain m1), else the
      max shipdate over the remaining suppliers (m2).

    lineitem scans once and shuffles once on the 8-byte order key (the
    stacked windows share one partitioning/sort); dims broadcast; the
    orders filter prunes ~half the fact before the shuffle. The SQL
    oracle keeps the identical correlated-subquery text.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    f_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    w = Window.partitionBy("l_orderkey")
    x = (
        li.join(f_orders, "l_orderkey")
        .withColumn("m1", F.max("l_shipdate").over(w))
        .withColumn(
            "multi_supp", F.min("l_suppkey").over(w) != F.max("l_suppkey").over(w)
        )
    )
    at_max = F.when(F.col("l_shipdate") == F.col("m1"), F.col("l_suppkey"))
    x = x.withColumn("s1min", F.min(at_max).over(w)).withColumn(
        "s1max", F.max(at_max).over(w)
    )
    x = x.withColumn(
        "m2",
        F.max(F.when(F.col("l_suppkey") != F.col("s1min"), F.col("l_shipdate"))).over(w),
    )
    other_max = F.when(
        (F.col("l_suppkey") != F.col("s1min")) | (F.col("s1min") != F.col("s1max")),
        F.col("m1"),
    ).otherwise(F.col("m2"))
    waiters = x.filter(
        F.col("multi_supp") & (F.col("l_shipdate") >= other_max)
    ).select("l_suppkey")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name", "n_name")
    )
    return (
        waiters.join(F.broadcast(sup), "l_suppkey")
        .groupBy("n_name", "s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


# --------------------------------------------------------------------------
# x110 — TPC-H Q22 shape: dormant high-balance customers
#
# Scalar aggregate subquery as a filter threshold + NOT EXISTS anti-join +
# aggregation on a derived code. The classic float trap is engineered out:
# "balance above the positive-balance average" is evaluated in exact
# integer cents as bal_cents * COUNT > SUM(bal_cents) — multiplication
# instead of division, so no engine ever compares against a rounded
# average (the q60/q63 money discipline applied to a threshold). Both
# scalar subqueries are one-row broadcasts; the anti-join's build side is
# the filtered orders projection. Identical statement text both engines.
# --------------------------------------------------------------------------
_X110_SQL = """
    WITH pos AS (SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
                 FROM customer WHERE c_acctbal > 0.0)
    SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS totacctbal_cents
    FROM customer c
    WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) * (SELECT COUNT(*) FROM pos)
          > (SELECT CAST(SUM(bal_cents) AS BIGINT) FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND CAST(o.o_orderdate AS DATE) >= DATE '1999-01-01')
    GROUP BY 1 ORDER BY 1
"""


@query(
    "x110_dormant_customers",
    oracle=_X110_SQL,
    certifies="TPC-H Q22 shape: scalar aggregate subquery as filter threshold + NOT EXISTS, exact-integer average comparison — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x110(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X110_SQL)


# --------------------------------------------------------------------------
# x111 — TPC-H Q20 shape: suppliers with bulk part shipments
#
# Membership in a grouped-HAVING subquery: the inner aggregate groups the
# fact by (supplier, part) with a date-bounded scan and keeps groups over a
# quantity threshold; the outer IN becomes a left-semi join against the
# DISTINCT supplier side of that aggregate. The date filter sits INSIDE
# the subquery, so predicate pushdown prunes the fact scan before the
# group-by — the aggregate's shuffle carries only the date-window rows
# (the test schema has no partsupp, so availability is expressed directly
# over lineitem; the IN-over-HAVING shape is what this certifies).
# --------------------------------------------------------------------------
_X111_SQL = """
    SELECT s.s_suppkey, s.s_name FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 90
    )
    ORDER BY s_suppkey
"""


@query(
    "x111_bulk_suppliers",
    oracle=_X111_SQL,
    certifies="TPC-H Q20 shape: IN over a grouped-HAVING aggregate subquery (semi-join against an aggregate) — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x111(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X111_SQL)


# --------------------------------------------------------------------------
# x113 — declarative data-quality constraint audit (Deequ/dbt-test shape)
#
# A whole constraint suite — completeness, key uniqueness, accepted value
# sets, numeric and date ranges — evaluated in ONE scan of the table:
# every row predicate folds into the same partial aggregate and
# uniqueness rides it as COUNT(*) − COUNT(DISTINCT key). N checks cost
# one scan, not N scans; the gate result is one bounded row per check.
# The oracle spells each aggregate out per check (multi-scan SQL — same
# values, which is the point: the operator's fused pass must equal the
# straightforward per-check formulation).
# --------------------------------------------------------------------------
@query(
    "x113_constraint_audit",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                      CAST(o_orderdate AS DATE) AS o_date FROM orders),
         base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM t)
    SELECT c.check_name, base.n_rows, c.n_violations,
           c.n_violations = 0 AS passed
    FROM base, (
      SELECT 'accepted_values(o_orderstatus:F,O,P)' AS check_name,
             CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('F','O','P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM t
      UNION ALL
      SELECT 'between(o_date:1995-01-01..2000-12-31)',
             CAST(SUM(CASE WHEN o_date IS NOT NULL
                            AND (o_date < DATE '1995-01-01' OR o_date > DATE '2000-12-31')
                           THEN 1 ELSE 0 END) AS BIGINT) FROM t
      UNION ALL
      SELECT 'between(o_totalprice:0..400000)',
             CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                            AND (o_totalprice < 0 OR o_totalprice > 400000)
                           THEN 1 ELSE 0 END) AS BIGINT) FROM t
      UNION ALL
      SELECT 'not_null(o_custkey)',
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM t
      UNION ALL
      SELECT 'unique(o_orderkey)',
             CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM t
    ) c ORDER BY check_name
    """,
    certifies="declarative data-quality constraint audit (Deequ/dbt-test shape): N checks in one fused scan — completeness, uniqueness, domain, ranges",
    tags=("warehouse", "quality"),
)
def x113(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators import constraints as C

    t = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_date"),
    )
    return C.audit(
        t,
        [
            C.accepted_values("o_orderstatus", ["F", "O", "P"]),
            C.between("o_date", "1995-01-01", "2000-12-31"),
            C.between("o_totalprice", 0, 400000),
            C.not_null("o_custkey"),
            C.unique("o_orderkey"),
        ],
    )


# --------------------------------------------------------------------------
# x116 — TPC-H Q2 shape: correlated scalar-aggregate subquery
#
# The last classic subquery form next to x87/x88/x109-x111: a correlated
# scalar MIN in the WHERE clause ("the supplier line AT the per-part
# minimum price" — Q2's ps_supplycost = (SELECT MIN ...) pattern over the
# test schema). Catalyst must decorrelate it to a per-key aggregate
# joined back on the correlation key — never a per-row subquery loop; the
# outer p_partkey < 200 bound also has to reach BOTH the outer scan and
# (via the join) keep the inner aggregate bounded. Identical statement
# text on both engines; price surfaces in exact integer cents, the float
# equality itself compares stored values (no arithmetic → no rounding
# divergence).
# --------------------------------------------------------------------------
_X116_SQL = """
    SELECT p.p_partkey, p.p_name, l.l_suppkey,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS best_price_cents
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_partkey < 200
      AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)
    ORDER BY p_partkey, l_suppkey
"""


@query(
    "x116_cheapest_supplier",
    oracle=_X116_SQL,
    certifies="TPC-H Q2 shape: correlated scalar-aggregate subquery decorrelated to aggregate + join on the correlation key — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x116(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X116_SQL)


# --------------------------------------------------------------------------
# x118 — TPC-H Q14 shape: conditional-aggregate share over a date window
#
# Promo revenue share: a one-month pushed-down date window on the fact,
# one broadcast dim join, and a CASE-conditional sum next to the total in
# the SAME aggregate (one pass — never two scans for numerator and
# denominator). Money in exact integer cents: FLOOR(x*100 + 0.5) of the
# IEEE double product is bit-identical across engines, and the cent sums
# are order-free BIGINTs. Identical statement text on both engines; the
# share itself stays a display-layer division (the q60/q63 discipline —
# emitting both cent sums certifies everything the ratio would, with no
# cross-engine rounding surface).
# --------------------------------------------------------------------------
_X118_SQL = """
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_rev_cents,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1995-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1995-10-01'
"""


@query(
    "x118_promo_revenue",
    oracle=_X118_SQL,
    certifies="TPC-H Q14 shape: conditional aggregate (CASE share) over a pushed-down date window + dim join, exact integer cents — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x118(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X118_SQL)


# --------------------------------------------------------------------------
# x119 — TPC-H Q19 shape: disjunctive multi-attribute predicates
#
# OR-of-ANDs across BOTH join sides (brand+size on the dim, quantity on
# the fact). The planner test for this shape is predicate decomposition:
# Catalyst must extract the common conjuncts it CAN push (each disjunct
# constrains p_brand to a literal, so a brand IN-list reaches the part
# scan; quantity bounds reach lineitem) while evaluating the full
# disjunction as the join's residual filter — a per-disjunct UNION plan
# would scan the fact three times instead. Identical statement text.
# --------------------------------------------------------------------------
_X119_SQL = """
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@query(
    "x119_disjunctive_revenue",
    oracle=_X119_SQL,
    certifies="TPC-H Q19 shape: OR-of-ANDs predicates spanning both join sides, common-conjunct extraction + residual join filter — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x119(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X119_SQL)


# --------------------------------------------------------------------------
# x120 — TPC-H Q15 shape: argmax against a reused aggregate CTE
#
# The revenue view is referenced TWICE — as the join input and inside the
# scalar MAX subquery. Both engines must compute one grouped aggregate
# and compare each group against its global max (ties keep every
# achiever — Q15's "the top supplier(s)"). Spark INLINES a CTE into both
# references, so running the statement text would scan the fact twice
# (measured 0.69 s); the Spark side is therefore the DataFrame twin that
# aggregates ONCE and compares against a broadcast 1-row max — one fact
# scan, one shuffle — while the WITH text stays the DuckDB oracle.
# Exact integer cents as in x118.
# --------------------------------------------------------------------------
_X120_SQL = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_rev_cents
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev_cents
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev_cents = (SELECT MAX(total_rev_cents) FROM revenue)
    ORDER BY s_suppkey
"""


@query(
    "x120_top_supplier",
    oracle=_X120_SQL,
    certifies="TPC-H Q15 shape: aggregate CTE reused by a scalar-MAX argmax filter (ties kept) — single-scan DataFrame twin vs the WITH-text oracle",
    tags=("sql", "tpch"),
)
def x120(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    rev = (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents).cast("long").alias("total_rev_cents"))
    )
    # global-max via an empty-frame window, NOT a rejoined scalar agg — a
    # second reference to `rev` would recompute its fact-scan lineage; the
    # window sees the aggregated (supplier-count-sized) relation once
    top = rev.withColumn(
        "__mx", F.max("total_rev_cents").over(Window.partitionBy(F.lit(1)))
    ).filter(F.col("total_rev_cents") == F.col("__mx"))
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.col("s_suppkey").alias("supplier_no")
    )
    return (
        top.join(F.broadcast(sup), "supplier_no")
        .select("s_suppkey", "s_name", "total_rev_cents")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# x121 — TPC-H Q7 shape: symmetric nation-pair volume over a double-aliased
# dimension
#
# The one classic join shape the suite lacked: nation joins TWICE under
# different aliases (supplier's nation, customer's nation) with a
# SYMMETRIC disjunctive pair predicate — the planner must broadcast the
# 25-row dim into both legs (never self-join nation against itself
# first), EXTRACT the common nation IN-list conjuncts from the
# disjunction down to BOTH nation scans (plan-verified: PushedFilters
# carries the Or), and keep the full pair predicate as a cheap post-join
# filter while the fact date window pushes to the scan. The statement
# lists supplier⋈nation FIRST: without CBO stats Catalyst joins in
# syntactic order, so the nation-pruned supplier side (~2/19 of
# suppliers) semi-reduces the fact before the orders/customer legs — the
# order a stats-driven planner would pick. EXTRACT(YEAR ...) is
# portable; cents discipline as in x118. Identical statement text on
# both engines (DuckDB reorders on its own statistics).
# --------------------------------------------------------------------------
_X121_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume_cents) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM CAST(l.l_shipdate AS DATE)) AS INT) AS l_year,
             CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS volume_cents
      FROM supplier s
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND CAST(l.l_shipdate AS DATE) >= DATE '1995-01-01'
        AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query(
    "x121_nation_volume",
    oracle=_X121_SQL,
    certifies="TPC-H Q7 shape: double-aliased dimension join with a symmetric disjunctive pair predicate — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x121(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem", "orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X121_SQL)


# --------------------------------------------------------------------------
# x124 — TPC-H Q4 shape: EXISTS semi-join with a cross-table correlation
#
# Q4 counts orders (per priority) having at least one "late" line. The
# test schema has no l_commitdate/l_receiptdate, so "late" is shipped
# more than 60 days after the order date — which makes the EXISTS
# correlate on BOTH the join key and an order-side column
# (o_orderdate), the part Catalyst must pull into the semi-join
# condition. Identical statement text; the date window prunes orders
# before the join.
# --------------------------------------------------------------------------
_X124_SQL = """
    SELECT o.o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND CAST(l.l_shipdate AS DATE) >
                        CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
    GROUP BY priority ORDER BY priority
"""


@query(
    "x124_priority_late_orders",
    oracle=_X124_SQL,
    certifies="TPC-H Q4 shape: EXISTS decorrelated to a semi-join whose condition spans both relations (join key + outer date column) — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x124(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X124_SQL)


# --------------------------------------------------------------------------
# x125 — TPC-H Q12 shape: two-way conditional counts over a fact join
#
# Q12 splits line counts by order priority class per ship mode; the test
# schema has no l_shipmode, so l_returnflag plays the mode. The shape
# certified is the CASE-pivoted double count in ONE pass over the joined
# relation (a per-class UNION would scan the fact twice) with the date
# window pushed to the lineitem scan.
# --------------------------------------------------------------------------
_X125_SQL = """
    SELECT l.l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY returnflag ORDER BY returnflag
"""


@query(
    "x125_priority_class_lines",
    oracle=_X125_SQL,
    certifies="TPC-H Q12 shape: CASE-pivoted dual conditional counts in one fact pass — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x125(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X125_SQL)


# --------------------------------------------------------------------------
# x126 — TPC-H Q17 shape: correlated scalar AVG against the same fact
#
# "Small-quantity" lines: quantity below half the part's average
# quantity. The correlated scalar aggregate must decorrelate into a
# per-partkey aggregate joined back to the fact (never a per-row
# subquery). Quantities are small exact integers stored as doubles, so
# AVG = exact-int-sum / count is the same IEEE division in both engines
# — the 0.5× threshold comparison cannot diverge. Q17's scaled yearly
# average becomes exact integer cents via FLOOR(· / 7.0).
# --------------------------------------------------------------------------
_X126_SQL = """
    SELECT CAST(FLOOR(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) / 7.0) AS BIGINT) AS avg_yearly_cents,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@query(
    "x126_small_quantity_revenue",
    oracle=_X126_SQL,
    certifies="TPC-H Q17 shape: correlated scalar AVG subquery decorrelated to a per-key aggregate + join — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x126(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X126_SQL)


# --------------------------------------------------------------------------
# x127 — TPC-H Q18 shape: IN over a grouped-HAVING aggregate of the fact
#
# Large-volume orders: the IN subquery groups the WHOLE fact table by
# order key and keeps heavy orders (sum qty > 150), then the outer query
# re-joins those keys through customer/orders/lineitem and re-aggregates.
# The certified plan shape: the HAVING aggregate runs ONCE as a
# semi-join build side (not per outer row), and both engines keep the
# exact integer quantity sums. Top 20 by totalprice with a unique-key
# tie-break so the LIMIT set is deterministic.
# --------------------------------------------------------------------------
_X127_SQL = """
    SELECT c.c_name AS c_name,
           CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_date,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
           CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_date, totalprice_cents
    ORDER BY totalprice_cents DESC, o_orderkey LIMIT 20
"""


@query(
    "x127_large_volume_orders",
    oracle=_X127_SQL,
    certifies="TPC-H Q18 shape: IN over a grouped-HAVING fact aggregate as a semi-join, then re-join + re-aggregate — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x127(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X127_SQL)


# --------------------------------------------------------------------------
# x128 — TPC-H Q10 shape: returned-item revenue, top customers
#
# The classic 4-table star probe: lineitem filtered to returns streams
# through orders (date window) into customer/nation dims, grouped by
# customer, top 20 by lost revenue. Certifies the join ordering under
# syntactic order (dims broadcast; the fact never builds a hash table)
# and exact integer cents through the revenue sum.
# --------------------------------------------------------------------------
_X128_SQL = """
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
           c.c_name AS c_name,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           n.n_name AS n_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey LIMIT 20
"""


@query(
    "x128_returned_item_customers",
    oracle=_X128_SQL,
    certifies="TPC-H Q10 shape: return-filtered fact through date-windowed orders into broadcast dims, top-k by aggregated revenue — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x128(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "nation", "orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X128_SQL)


# --------------------------------------------------------------------------
# x129 — TPC-H Q6 shape: pure scan-aggregate, every predicate pushed down
#
# No join at all — the certificate is the SCAN: all four predicates are
# plain column comparisons (timestamp literals, NOT date-casts, exactly
# so they can reach the parquet reader as PushedFilters — a CAST wrapper
# would disable pushdown), and the aggregate is a single map-side
# partial + 1-row final. At 100 TB this is the shape whose entire cost
# is I/O after row-group pruning; test_plans pins the pushed filters.
# --------------------------------------------------------------------------
_X129_SQL = """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.02 AND l_discount <= 0.04
      AND l_quantity < 24
"""


@query(
    "x129_forecast_revenue",
    oracle=_X129_SQL,
    certifies="TPC-H Q6 shape: joinless filter-aggregate with every predicate as a parquet PushedFilter (plan-asserted) — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x129(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_X129_SQL)


# --------------------------------------------------------------------------
# x133 — bag-semantics set operations (EXCEPT ALL / INTERSECT ALL)
#
# q42/q43 certify the DISTINCT set ops; the ALL variants are different
# operators (multiset difference/intersection — duplicates carry
# multiplicity: per key, max(n_a - n_b, 0) and min(n_a, n_b)). Spark
# plans them as aggregate+generate replication rather than hash
# de-duplication, which is exactly what this certifies. Identical
# statement text both engines; counts keep the result 2 cells.
# --------------------------------------------------------------------------
_X133_SQL = """
    WITH ex AS (SELECT l_orderkey AS k FROM lineitem
                EXCEPT ALL
                SELECT o_orderkey AS k FROM orders),
         ia AS (SELECT l_orderkey AS k FROM lineitem
                INTERSECT ALL
                SELECT o_orderkey AS k FROM orders)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_except_all,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ia) AS n_intersect_all
"""


@query(
    "x133_bag_set_ops",
    oracle=_X133_SQL,
    certifies="EXCEPT ALL / INTERSECT ALL bag semantics: multiset difference and intersection with multiplicities — identical statement text both engines",
    tags=("sql", "setops"),
)
def x133(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X133_SQL)


# --------------------------------------------------------------------------
# x134 — TPC-H Q11 shape: group aggregate vs a scalar total of the SAME
# relation ("important stock").
#
# The testdata has no partsupp table, so lineitem restricted to two
# supplier nations plays the part-supplier value fact (the join/agg
# topology is Q11's: fact → supplier → nation dim filter, group by part,
# HAVING against a scalar aggregate of the whole filtered relation).
# TPC-H's literal `> SUM(...) * FRACTION` threshold is scale-DEPENDENT
# (the spec scales FRACTION by 1/SF; a fixed 0.0001 returns the whole
# table at sf0.001 and nothing at sf0.1), so the certificate uses the
# scale-free form "value > 2x the mean part value", cross-multiplied
# into pure integer/DECIMAL(38) math so the threshold comparison is
# exact on both engines — no double division, no tie ambiguity.
# At 100 TB: the CTE is scanned twice (group-by + scalar total); both
# passes reduce map-side, and the dim legs broadcast. Identical
# statement text both engines.
# --------------------------------------------------------------------------
_X134_SQL = """
    WITH supplied AS (
      SELECT l.l_partkey AS partkey,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_7', 'NATION_13')
    )
    SELECT CAST(partkey AS BIGINT) AS p_partkey,
           CAST(SUM(value_cents) AS BIGINT) AS value_cents
    FROM supplied
    GROUP BY partkey
    HAVING CAST(SUM(value_cents) AS DECIMAL(38,0))
             * (SELECT CAST(COUNT(DISTINCT partkey) AS DECIMAL(38,0)) FROM supplied)
           > (SELECT CAST(SUM(value_cents) AS DECIMAL(38,0)) * 2 FROM supplied)
    ORDER BY value_cents DESC, p_partkey
"""


@query(
    "x134_important_parts",
    oracle=_X134_SQL,
    certifies="TPC-H Q11 shape: per-group aggregate HAVING-compared to a scalar aggregate of the same filtered relation, exact cross-multiplied threshold — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x134(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X134_SQL)


# --------------------------------------------------------------------------
# x135 — TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
# with a NOT IN exclusion subquery ("parts/supplier relationship").
#
# Adapted to the schema at hand (no partsupp; lineitem is the
# part-supplier fact and s_acctbal < 0 stands in for the complaints
# predicate — 6 of 100 suppliers at sf0.01). The certificate is the
# NOT IN: Spark must plan a null-aware anti join (s_suppkey could in
# principle be NULL, so NOT IN is not a plain anti join — the planner
# proves the single-column build side and emits
# BroadcastHashJoin ... LeftAnti, buildSide with NAAJ) feeding a
# two-level distinct aggregate. At 100 TB the exclusion set is a tiny
# broadcast and the distinct is the only shuffle. Identical statement
# text both engines.
# --------------------------------------------------------------------------
_X135_SQL = """
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, CAST(p.p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query(
    "x135_supplier_part_counts",
    oracle=_X135_SQL,
    certifies="TPC-H Q16 shape: NOT IN exclusion (null-aware anti join) + per-attribute COUNT DISTINCT — identical statement text both engines",
    tags=("sql", "tpch"),
)
def x135(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part", "supplier"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_X135_SQL)


# --------------------------------------------------------------------------
# x136 — distribution window family: NTILE / PERCENT_RANK / CUME_DIST
#
# q46 certifies rank/dense_rank/lag; these three are the remaining
# analytic-window primitives (bucketing and distribution statistics —
# the quantile-binning building blocks for per-group curation cutoffs).
# PERCENT_RANK and CUME_DIST are double-valued ((rank-1)/(n-1), n_le/n)
# but both engines derive them from the SAME exact integers, so the
# doubles are bit-identical; the output still quantizes to micro-units
# (FLOOR(x*1e6+0.5) — the repo's no-raw-float output rule). The window
# ORDER BY carries the unique-key tie-break so every rank is
# deterministic. One shuffle (partition by nation), identical statement
# text both engines.
# --------------------------------------------------------------------------
_X136_SQL = """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(c_nationkey AS INT) AS c_nationkey,
           CAST(NTILE(4) OVER w AS INT) AS balance_quartile,
           CAST(FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) AS BIGINT) AS pct_rank_micro,
           CAST(FLOOR(CUME_DIST() OVER w * 1000000 + 0.5) AS BIGINT) AS cume_dist_micro
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, c_custkey
"""


@query(
    "x136_window_distribution_family",
    oracle=_X136_SQL,
    certifies="NTILE / PERCENT_RANK / CUME_DIST analytic windows (the distribution-function family q46 leaves out) — identical statement text both engines",
    tags=("sql", "window"),
)
def x136(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_X136_SQL)


# --------------------------------------------------------------------------
# x137 — explicit NULLS FIRST / NULLS LAST ordering
#
# The engines DISAGREE on default null placement (Spark ASC sorts nulls
# first, DuckDB ASC sorts them last) — a portable query must spell the
# placement out, and this certificate pins both spellings against both
# engines. The ordering is materialized into row_number() VALUES
# (the driver's canonicalizer sorts rows before hashing, so a bare
# ORDER BY would be invisible to the gate). NULLIF synthesizes the
# nullable column; the unique-key tie-break keeps every row number
# deterministic. The UNPARTITIONED window is deliberate and confined to
# a dim table (supplier — the certificate needs a global order; at
# 100 TB a global row_number over a fact would be the anti-pattern this
# repo's per-group windows avoid).
# --------------------------------------------------------------------------
_X137_SQL = """
    WITH t AS (
      SELECT s_suppkey,
             CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS bal
      FROM supplier
    )
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
           CAST(ROW_NUMBER() OVER (ORDER BY bal ASC NULLS LAST, s_suppkey) AS BIGINT) AS rn_nulls_last,
           CAST(ROW_NUMBER() OVER (ORDER BY bal DESC NULLS FIRST, s_suppkey) AS BIGINT) AS rn_nulls_first
    FROM t
    ORDER BY s_suppkey
"""


@query(
    "x137_null_ordering",
    oracle=_X137_SQL,
    certifies="explicit NULLS FIRST/LAST sort placement (engine defaults disagree: Spark ASC=nulls first, DuckDB ASC=nulls last) materialized into row numbers — identical statement text both engines",
    tags=("sql", "window"),
)
def x137(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_X137_SQL)


# --------------------------------------------------------------------------
# x140 — market-basket co-occurrence mining (frequent item PAIRS)
#
# The naive relational form is the fact-vs-fact self-join on the basket
# key; the engine form collects each basket's bounded item set once and
# expands canonical a<b pairs with array HOFs, so pair generation is
# map-side on the grouped row and only (a, b) keys shuffle into the
# count (operators/itemsets.py scale note). The oracle IS the naive
# self-join — same result, deliberately different plan.
# --------------------------------------------------------------------------
@query(
    "x140_market_basket_pairs",
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pr AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
      FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(item_a AS BIGINT) AS item_a, CAST(item_b AS BIGINT) AS item_b,
           CAST(COUNT(*) AS BIGINT) AS n_baskets
    FROM pr GROUP BY item_a, item_b
    ORDER BY n_baskets DESC, item_a, item_b
    LIMIT 100
    """,
    certifies="frequent-itemset pair mining: bounded-basket HOF pair expansion (map-side C(n,2)) vs the oracle's quadratic self-join — no fact-vs-fact shuffle in the engine plan",
    tags=("llm", "itemsets", "scale"),
)
def x140(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.itemsets import co_occurrence_pairs

    return co_occurrence_pairs(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        top_k=100,
        # partkeys are surrogate ints: pack each pair into one BIGINT
        # shuffle key (operators/itemsets.py — ~12% off the whole query)
        pack_pairs=True,
    )


# --------------------------------------------------------------------------
# x141 — first-order Markov transition matrix over event sequences
# --------------------------------------------------------------------------
@query(
    "x141_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      FROM events
    ), c AS (
      SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE from_type IS NOT NULL GROUP BY from_type, event_type
    )
    SELECT from_type, to_type, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
    FROM c ORDER BY from_type, to_type
    """,
    certifies="sequence mining: per-user lag pairs -> Markov transition counts + exact integer ppm probabilities (one user_id shuffle, then a tiny |types|^2 count relation)",
    tags=("events", "window"),
)
def x141(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.timeseries import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# x142 — dense-grid gap fill with forward carry (sensor downsample+ffill)
# --------------------------------------------------------------------------
@query(
    "x142_gap_fill_forward",
    oracle="""
    WITH span AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
    ), grid AS (
      SELECT s.series, unnest(generate_series(sp.lo, sp.hi, INTERVAL 1 HOUR)) AS hour_ts
      FROM (SELECT DISTINCT event_type AS series FROM events) s CROSS JOIN span sp
    ), hourly AS (
      SELECT series, hour_ts, reading FROM (
        SELECT event_type AS series, date_trunc('hour', ts) AS hour_ts, value AS reading,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT g.series AS series, strftime(g.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           last_value(h.reading IGNORE NULLS) OVER (PARTITION BY g.series ORDER BY g.hour_ts) AS reading
    FROM grid g LEFT JOIN hourly h ON g.series = h.series AND g.hour_ts = h.hour_ts
    ORDER BY g.series, g.hour_ts
    """,
    certifies="time-series gap fill: hourly last-reading downsample + dense sequence() grid + forward carry via last(ignore nulls) window; pre-first-reading hours stay NULL (no back-fill)",
    tags=("events", "timeseries", "window"),
)
def x142(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.timeseries import gap_fill_forward

    return gap_fill_forward(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# x143 — robust outlier audit: exact median / MAD / k·MAD flags
# --------------------------------------------------------------------------
@query(
    "x143_mad_outliers",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type, AVG(value) AS med FROM ranked
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ), rdev AS (
      SELECT event_type, adev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ), mad AS (
      SELECT event_type, AVG(adev) AS mad FROM rdev
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(CAST(MAX(d.med) AS DOUBLE), 6) AS med,
           ROUND(CAST(MAX(m.mad) AS DOUBLE), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    certifies="robust anomaly audit: exact order-statistic median + MAD (outlier-immune scale estimate), |dev| > 3*MAD flag counts — order-invariant middle-value math so both engines agree on doubles",
    tags=("events", "stats"),
)
def x143(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.timeseries import mad_outliers

    return mad_outliers(_t(spark, sf_dir, "events"), group_col="event_type", value_col="value", k=3.0)


@query(
    "x168_touch_attribution",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, ts, event_type,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
      FROM events
    ),
    att AS (
      SELECT event_id, user_id, event_type,
             FIRST_VALUE(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id, seg ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_touch,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id, seg ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_touch,
             CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id, seg) AS BIGINT) AS n_touches
      FROM seq
    )
    SELECT event_id AS purchase_id, user_id, first_touch, last_touch, n_touches
    FROM att WHERE event_type = 'purchase' AND first_touch IS NOT NULL
    ORDER BY purchase_id
    """,
    certifies="event analytics: first/last-touch conversion attribution — running-conversion segments + per-segment touch ranks, all windows served by ONE user_id exchange (subset partitioning)",
    tags=("events", "window"),
)
def x168(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.timeseries import touch_attribution

    return touch_attribution(_t(spark, sf_dir, "events"))


@query(
    "x169_timed_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 1 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_step1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_step2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_step3
    """,
    certifies="strict sequential timed funnel (each step after AND within 1h of the previous step's earliest completion) — the ordering q67's conditional-min form cannot express; per-stage co-partitioned user joins",
    tags=("events", "agg", "window"),
)
def x169(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.timeseries import timed_funnel

    return timed_funnel(_t(spark, sf_dir, "events"), gap_seconds=3600)
