"""Flagship visits-consolidation query + event-stream-shaped queries.

The flagship re-expresses the reference's core business output — the
consolidated ``visitantes`` table (reference database/schema.sql:6-15,
README.md:55 "Registro consolidado por visitante") — over the driver's
star schema: orders play the role of visit rows, o_custkey the visitor key.
Counter semantics mirror the MERGE (utils/utils_load.py:50-81 with D21/D22
rulings) pinned to a fixed reference date for determinism.

The events queries certify the streaming-shaped operators (tumbling window,
sessionization) in their batch form; the same transformations run under
Structured Streaming in pipeline_etl_website_visits_spark.streaming.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pipeline_etl_website_visits_spark.queries.registry import query
from pipeline_etl_website_visits_spark.tables import load_table

# Fixed "processing date" for deterministic year/month counters (the data's
# max order date is 1998-08-01 at every SF).
_REF_DATE = "1998-08-01"
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@query(
    "q00_flagship_visitantes",
    oracle=f"""
    SELECT o_custkey AS visitor_key,
           CAST(COUNT(*) AS BIGINT) AS visitas_totales,
           CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = EXTRACT(YEAR FROM DATE '{_REF_DATE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS visitas_anio_actual,
           CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = EXTRACT(YEAR FROM DATE '{_REF_DATE}')
                          AND EXTRACT(MONTH FROM o_orderdate) = EXTRACT(MONTH FROM DATE '{_REF_DATE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS visitas_mes_actual,
           MIN(CAST(o_orderdate AS DATE)) AS fecha_primera_visita,
           MAX(CAST(o_orderdate AS DATE)) AS fecha_ultima_visita
    FROM orders GROUP BY o_custkey ORDER BY visitor_key
    """,
    certifies="A1+A3+J2 visitantes consolidation (utils/utils_transform.py:229-235, utils/utils_load.py:50-81)",
    tags=("flagship",),
)
def flagship_visitantes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated per-visitor record: total/year/month counters + first/last dates."""
    orders = load_table(spark, sf_dir, "orders")
    ref = F.lit(_REF_DATE).cast("date")
    d = F.col("o_orderdate")
    in_year = F.year(d) == F.year(ref)
    in_month = in_year & (F.month(d) == F.month(ref))
    return (
        orders.groupBy(F.col("o_custkey").alias("visitor_key"))
        .agg(
            F.count("*").alias("visitas_totales"),
            F.sum(F.when(in_year, 1).otherwise(0)).alias("visitas_anio_actual"),
            F.sum(F.when(in_month, 1).otherwise(0)).alias("visitas_mes_actual"),
            F.min(d.cast("date")).alias("fecha_primera_visita"),
            F.max(d.cast("date")).alias("fecha_ultima_visita"),
        )
    )


@query(
    "x32_events_tumbling_hour",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS value_sum
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    certifies="event-time tumbling window agg (SURVEY §2.10 streaming gap; batch twin of streaming/visits_stream.py)",
    tags=("events", "streaming-shaped"),
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # F.window is the streaming-native form; its start equals date_trunc for
    # epoch-aligned hourly windows.
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


@query(
    "x33_events_sessionize",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM lagged
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions GROUP BY user_id, session_seq ORDER BY user_id, session_seq
    """,
    certifies="gap-based sessionization (stateful-streaming shape, SURVEY §2.10)",
    tags=("events", "streaming-shaped"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    us = F.unix_micros(F.col("ts"))
    prev_us = F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(prev_us.isNull() | ((us - prev_us) > _SESSION_GAP_US), 1).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    sessions = events.withColumn("is_new", is_new).withColumn(
        "session_seq", F.sum("is_new").over(wsum).cast("long")
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )


@query(
    "x34_events_user_daily",
    oracle="""
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS value_sum
    FROM events GROUP BY user_id, day ORDER BY user_id, day
    """,
    certifies="per-user daily rollup (README.md:170-174 dashboard shape)",
    tags=("events",),
)
def events_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            # 2-dp values sum exactly as integer cents (LONG) — see q60
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / F.lit(100.0))
            .cast("double")
            .alias("value_sum"),
        )
    )


@query(
    "x104_session_window_native",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) >= {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM lagged
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_seq ORDER BY user_id, session_start
    """,
    certifies="native session_window dynamic-gap aggregation in batch (x33's lag/cumsum twin; boundary = half-open windows, diff >= gap splits)",
    tags=("events", "streaming-shaped"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same sessionization as x33 expressed with the NATIVE
    ``session_window`` operator (the one the streaming path uses) instead
    of lag+cumsum windows — certifying that the stateful operator's merge
    semantics match the portable SQL formulation value-for-value. NOTE the
    boundary: session_window is half-open ([start, last+gap)), so a gap of
    EXACTLY 30min starts a new session — the oracle uses >= where x33's
    cumsum form uses >.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
        # no ORDER BY: the result set is deterministic without it (no LIMIT)
        # and the global sort would be the single most expensive node here
    )


# --------------------------------------------------------------------------
# x158 — OHLC time-bucket resample of the event stream
#
# The standard downsample (metrics rollups, market bars, sensor
# decimation): per (event_type, hour), open/high/low/close over value in
# integer CENTS (FLOOR(value*100) — IEEE double multiply is bit-identical
# across engines; raw double SUMs are order-dependent and deliberately
# not emitted). Open/close via the min/max-of-struct argmin trick — ONE
# exchange, no window (the oracle's ROW_NUMBER formulation needs two).
# --------------------------------------------------------------------------
@query(
    "x158_ohlc_resample",
    oracle="""
    WITH e AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
             ts, event_id, CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events
    ), r AS (
      SELECT event_type, bucket_ts, v,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, bucket_ts,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_c,
           CAST(MAX(v) AS BIGINT) AS high_c,
           CAST(MIN(v) AS BIGINT) AS low_c,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_c,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY event_type, bucket_ts ORDER BY event_type, bucket_ts
    """,
    certifies="time-series OHLC downsample per (key, bucket): integer-cent quantization, struct-argmin open/close in ONE exchange (SURVEY §2.10 temporal gap map)",
    tags=("events", "temporal", "timeseries"),
)
def x158(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_etl_website_visits_spark.operators.timeseries import ohlc_resample

    events = load_table(spark, sf_dir, "events")
    return ohlc_resample(events, "ts", "value", "event_type", "event_id", unit="hour")
