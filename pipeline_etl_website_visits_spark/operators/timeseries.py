"""Event-sequence and time-series operators.

The reference's ETL is batch row-at-a-time with no notion of ordering
(SURVEY §2.10 — no window functions at all); these operators cover the
sequence-analytics family a production visits pipeline grows into:
Markov transition matrices over event streams, dense-grid gap filling
with forward carry (the sensor/gauge downsample), and robust
median/MAD outlier flagging.

Scale notes (100 TB):
- ``event_transitions``: one shuffle on ``user_id`` for the lag window,
  then a map-side-combined count on the (from, to) pairs — the pair
  domain is |event_type|², tiny, so the second exchange moves almost
  nothing. No driver state.
- ``gap_fill_forward``: the hourly downsample is one shuffle on
  (series, hour); the dense grid is |series| × n_hours rows built from
  a 1-row global span aggregate (a benign scalar collect, same
  discipline as the q65/x110 scalar joins) — at 100 TB the grid is
  still millions of rows, dwarfed by the raw events it summarizes. The
  forward fill is one window per series, and series count bounds the
  parallelism exactly as it would on a real cluster.
- ``mad_outliers``: two exact-median passes + one flag pass, all
  shuffled on the same group key; each pass is a window/aggregate over
  the grouped rows. Exact medians at this shape are sort-based by
  nature; at 100 TB one switches the median to approx_percentile with
  a documented tolerance — the flag pass is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition counts + probabilities (integer ppm).

    For each user's event sequence (ordered by ``order_cols`` — the tie
    key must be total for determinism), count consecutive
    ``from_type → to_type`` pairs, then derive the per-``from_type``
    transition probability in exact integer parts-per-million
    (``n·1e6 DIV row_total`` — integer algebra so both engines agree
    digit-for-digit; the x139 quantization discipline).
    """
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(type_col).over(w)
    pairs = (
        events.select(prev.alias("from_type"), F.col(type_col).alias("to_type"))
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000L DIV sum(n) OVER (PARTITION BY from_type)")
        .cast("long")
        .alias("prob_ppm"),
    )  # no final orderBy (the x82 discipline, r15)


def gap_fill_forward(
    events: DataFrame,
    *,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """Downsample to an hourly gauge per series and forward-fill gaps.

    The classic sensor shape: per (series, hour) keep the LAST reading
    (by ``ts, tie_col`` — total order), build the dense hour grid
    spanning [min, max] of the whole table, and carry the last known
    reading across silent hours. Hours before a series' first reading
    stay NULL (no back-fill — fabricating pre-first readings is wrong).

    Returns ``(series, hour_ts string, reading double)`` with the
    reading untouched (no arithmetic) so cross-engine bits agree.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    wlast = Window.partitionBy("series", "hour_ts").orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    hourly = (
        events.select(
            F.col(series_col).alias("series"),
            hour.alias("hour_ts"),
            F.col(ts_col),
            F.col(tie_col),
            F.col(value_col).alias("reading"),
        )
        .withColumn("rn", F.row_number().over(wlast))
        .where(F.col("rn") == 1)
        .select("series", "hour_ts", "reading")
    )
    span = events.select(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    grid = (
        events.select(F.col(series_col).alias("series"))
        .distinct()
        .crossJoin(span)  # 1-row span: benign broadcast-nested-loop (docs/PLANS.md preamble)
        .select(
            "series",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour_ts"),
        )
    )
    wf = (
        Window.partitionBy("series")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["series", "hour_ts"], "left")
        .select(
            "series",
            F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            F.last("reading", ignorenulls=True).over(wf).alias("reading"),
        )
        # no final orderBy (the x82 discipline, r15): determinism-only sort
    )


def _exact_median(df: DataFrame, group_col: str, value_col: str, out_col: str) -> DataFrame:
    """Exact per-group median: mean of the two middle order statistics.

    Sort-based by construction (row_number over the group) — the
    portable exact form both engines agree on bit-for-bit when the
    inputs are identical doubles (q65 precedent).
    """
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("n"),
    )
    mid = ranked.where(
        (F.col("rn") == F.expr("(n + 1) DIV 2")) | (F.col("rn") == F.expr("(n + 2) DIV 2"))
    )
    return mid.groupBy(group_col).agg(F.avg(value_col).alias(out_col))


def _approx_median(df: DataFrame, group_col: str, value_col: str, out_col: str) -> DataFrame:
    """Sketch-based per-group median: ``approx_percentile`` (KLL-style),
    one map-side-combinable aggregation — no per-group global sort. The
    100 TB form of :func:`_exact_median`: at real scale the exact
    order-statistic median is a full shuffle + window sort per pass,
    while the sketch folds in a single exchange with bounded state."""
    return df.groupBy(group_col).agg(
        F.expr(f"approx_percentile({value_col}, 0.5, 10000)").alias(out_col)
    )


def mad_outliers(
    df: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Robust outlier audit per group: median / MAD / |dev| > k·MAD count.

    Median absolute deviation is the robust scale estimate — unlike
    stddev it doesn't let the outliers it is hunting inflate the
    threshold. With ``exact=True`` (default, the certificate form) both
    medians are exact order statistics; the deviation and comparison are
    single IEEE ops on identical inputs, so the whole audit is
    engine-exact. ``exact=False`` swaps both medians for
    ``approx_percentile`` sketches — the documented 100 TB escape hatch
    (the exact path costs two sort-based passes over the fact table;
    the sketch path is two map-side-combinable aggregations), at the
    price of a small, accuracy-bounded deviation in med/mad and
    therefore in the borderline outlier counts.
    """
    _median = _exact_median if exact else _approx_median
    med = _median(df, group_col, value_col, "med")
    dev = df.join(med, group_col).select(
        F.col(group_col),
        F.col(value_col),
        F.col("med"),
        F.abs(F.col(value_col) - F.col("med")).alias("adev"),
    )
    mad = _median(dev, group_col, "adev", "mad")
    flagged = dev.join(mad, group_col).groupBy(group_col, "med", "mad").agg(
        F.sum(F.when(F.col("adev") > F.lit(k) * F.col("mad"), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        F.count("*").cast("long").alias("n_rows"),
    )
    return flagged.select(
        F.col(group_col),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
        "n_rows",
    )  # no final orderBy (the x82 discipline, r15)


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    tiebreak_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Downsample an event stream into per-(key, time-bucket) OHLC bars —
    open/high/low/close over ``value_col`` with event count; the standard
    time-series resample (metrics rollups, market bars, sensor
    decimation).

    Exactness discipline: values are quantized to integer CENTS
    (``FLOOR(value*100)`` — IEEE double multiply is bit-identical across
    engines, the x34 rule) so min/max/first/last compare exactly; sums
    of raw doubles are deliberately NOT emitted (order-dependent).
    Open/close come from ONE aggregate each via the min/max-of-struct
    argmin trick (the x120 discipline): ``min(struct(ts, tiebreak, v))``
    picks the earliest event with a deterministic tiebreak — no window,
    no second shuffle, so the whole bar is ONE exchange on
    (key, bucket) with map-side partial aggregation. Output timestamps
    surface as formatted strings (dialect rule).
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    v = F.floor(F.col(value_col) * 100).cast("long")
    tagged = df.select(
        F.col(key_col),
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.struct(F.col(ts_col), F.col(tiebreak_col), v.alias("v")).alias("__s"),
        v.alias("__v"),
    )
    return tagged.groupBy(key_col, "bucket_ts").agg(
        F.min("__s")["v"].cast("long").alias("open_c"),
        F.max("__v").cast("long").alias("high_c"),
        F.min("__v").cast("long").alias("low_c"),
        F.max("__s")["v"].cast("long").alias("close_c"),
        F.count("*").cast("long").alias("n_events"),
    )


def touch_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
) -> DataFrame:
    """First/last-touch attribution: credit every conversion event to the
    first and last touch event by the same user SINCE their previous
    conversion — the standard product-analytics attribution shape.

    Segments: a running count of PRIOR conversions per user (window sum
    over rows unbounded-preceding..1-preceding) splits each user's
    timeline into attribution segments; first/last touch then come from
    IGNORE-NULLS first/last windows over the full (user, segment) frame
    — no join at all, so the whole operator is ONE user_id exchange (the
    (user, seg) windows are subset-partitioned by the user hash; only
    sorts are added). Conversions with no touch in their segment are
    excluded (unattributable — first_touch IS NULL marks them upstream).
    Determinism: all orderings are (ts, event_id) with the unique id as
    tiebreak.
    """
    w_seg = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*touch_types)
    seq = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == conversion_type, 1).otherwise(0)).over(w_seg),
            F.lit(0),
        ).alias("seg"),
    )
    w_full = (
        Window.partitionBy("user_id", "seg")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_cnt = Window.partitionBy("user_id", "seg")
    touch_type = F.when(is_touch, F.col("event_type"))
    att = seq.select(
        "event_id",
        "user_id",
        "event_type",
        F.first(touch_type, ignorenulls=True).over(w_full).alias("first_touch"),
        F.last(touch_type, ignorenulls=True).over(w_full).alias("last_touch"),
        F.sum(F.when(is_touch, 1).otherwise(0)).over(w_cnt).cast("long").alias("n_touches"),
    )
    return (
        att.where(
            (F.col("event_type") == conversion_type) & F.col("first_touch").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "first_touch",
            "last_touch",
            "n_touches",
        )
        # no final orderBy (the x82 discipline, r15): determinism-only sort
    )


def timed_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    gap_seconds: int = 3600,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict sequential funnel with a per-step time bound: step k must
    happen strictly AFTER the user's step k-1 completion and within
    ``gap_nanos`` of it (the product-analytics funnel q67's
    conditional-min form cannot express — min(click) may precede
    min(view) there). Earliest-completion semantics: each stage keeps
    the MINIMUM qualifying timestamp, which maximizes downstream
    conversion counts (the canonical funnel definition).

    Returns one row: n_step1, n_step2, ... (users reaching each step).

    Scale shape: one filtered aggregation per step, each joined to the
    previous stage on the user key — all stages hash-partition on
    ``user_col``, so Catalyst plans co-partitioned joins with no extra
    exchange beyond the per-stage aggregations; event rows are scanned
    once per step with the type filter pushed down. ``ts`` may be a
    native timestamp (gap applied as an INTERVAL) or raw int64 nanos
    (the nanosAsLong ingest shape; gap applied as nanos) — detected
    from the column type, identical comparison semantics either way.
    """
    if len(steps) < 2:
        raise ValueError("timed_funnel needs at least two steps")
    base = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t"), F.col(type_col).alias("e")
    )
    if dict(base.dtypes)["t"].startswith("timestamp"):
        gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    else:
        gap = F.lit(int(gap_seconds) * 1_000_000_000)
    stage = (
        base.where(F.col("e") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t1"))
    )
    stages = [stage]
    for i, step in enumerate(steps[1:], start=2):
        prev = stages[-1].select("u", F.col(f"t{i - 1}").alias("__prev"))
        nxt = (
            base.where(F.col("e") == step)
            .join(prev, "u")
            .where((F.col("t") > F.col("__prev")) & (F.col("t") <= F.col("__prev") + gap))
            .groupBy("u")
            .agg(F.min("t").alias(f"t{i}"))
        )
        stages.append(nxt)
    counts = [s.agg(F.count("*").cast("long").alias(f"n_step{i + 1}")) for i, s in enumerate(stages)]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out
