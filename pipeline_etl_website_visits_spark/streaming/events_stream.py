"""Event-time streaming aggregation over the events stream (SURVEY §7 phase 5).

The batch twins of these transformations are declared queries
``x32_events_tumbling_hour`` / ``x34_events_user_daily``; this module runs
the same logic under Structured Streaming with watermark-based late-data
handling — the capability gap called out in SURVEY §2.10 (the reference has
streaming *shape* but no event-time semantics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def read_events_stream(spark: SparkSession, events_dir: str, schema) -> DataFrame:
    """File-source stream of event rows (parquet drops into ``events_dir``)."""
    return spark.readStream.schema(schema).parquet(events_dir)


def tumbling_hour_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling windows per event_type with late-data tolerance.

    Same output columns as the batch twin (x32): window_start string,
    event_type, n_events, value_sum.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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


def start_tumbling_to_memory(
    spark: SparkSession,
    events_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "events_tumbling",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """AvailableNow drain into an in-memory sink (used by tests/demos)."""
    agg = tumbling_hour_counts(read_events_stream(spark, events_dir, schema), watermark)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys state by event_id and evicts
    entries once the watermark passes — bounded state, unlike a plain
    ``dropDuplicates`` on a stream (which must keep every key forever).
    This is the at-least-once → effectively-once repair stage a 100 TB
    event pipeline puts in front of its aggregations: upstream replays
    (Kafka redeliveries, file re-drops) land inside the lateness horizon,
    so keying state by id + horizon is both sufficient and bounded.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def start_dedup_to_memory(
    spark: SparkSession,
    events_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "events_dedup",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """AvailableNow run of the streaming dedup into an in-memory sink."""
    deduped = dedup_events_stream(read_events_stream(spark, events_dir, schema), watermark)
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sliding_window_value_sums(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour windows sliding every 15 minutes (the streaming twin of the
    declared batch query ``x72_sliding_windows``): each event lands in 4
    overlapping windows; the watermark bounds state exactly as for tumbling
    windows — window count scales the state, not the correctness story.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
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


def enriched_segment_counts(events: DataFrame, users: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-static enrichment join: each event picks up its user's market
    segment from a STATIC dimension, then aggregates per (segment, type).

    The canonical streaming-enrichment shape (SURVEY §2.10 streaming gap
    map): the static side is re-planned per micro-batch — Spark re-reads it
    each trigger, so a dimension refreshed in place is picked up without
    restarting the query — and the broadcast keeps the join map-side, so
    the stream never shuffles before its aggregation. State is bounded by
    the watermark exactly as in the pure-aggregation queries; the join
    itself is stateless (static side is never late).
    """
    joined = events.withWatermark("ts", watermark).join(
        F.broadcast(users.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")),
        "user_id",
    )
    return (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
    )


def start_enriched_to_memory(
    spark: SparkSession,
    events_dir: str,
    schema,
    users: DataFrame,
    checkpoint_dir: str,
    query_name: str = "events_enriched",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """AvailableNow drain of the stream-static enrichment into memory."""
    agg = enriched_segment_counts(read_events_stream(spark, events_dir, schema), users, watermark)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream join: attribute each purchase to the same user's
    click(s) within ``horizon`` before it.

    ``join_type="left_outer"`` additionally emits unmatched clicks (null
    purchase columns) — but only once the watermark proves no matching
    purchase can still arrive, i.e. in a LATER micro-batch than the click:
    un-attributed clicks surface with watermark delay, the canonical
    streaming outer-join semantics.

    The canonical two-stream shape: BOTH sides carry a watermark and the
    join condition bounds event-time distance, so state for either side is
    evictable once the other side's watermark passes the horizon — without
    the time bound Spark would have to buffer both streams forever. State
    is keyed by user_id (the equi-part of the condition), so it shuffles
    once per side and scales with active users × horizon, not history.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
        join_type,
    ).select(
        "purchase_id",
        "click_id",
        F.col("c_user").alias("user_id"),
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long")).alias("lag_seconds"),
    )


def start_attribution_to_memory(
    spark: SparkSession,
    events_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "events_attr",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """AvailableNow drain of the click→purchase stream-stream join.

    ``max_files_per_trigger`` splits the drain into several micro-batches —
    required for observing left-outer null emissions, which only flush
    after a subsequent batch advances the watermark."""
    ev = read_events_stream(spark, events_dir, schema)
    if max_files_per_trigger is not None:
        ev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(events_dir)
        )
    joined = click_purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon,
        watermark,
        join_type,
    )
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_window_user_stats(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Event-time SESSION windows per user: activity bursts separated by
    ``gap``-long silences collapse into one dynamic-width window (the
    streaming twin of the batch sessionize x33, expressed with the native
    ``session_window`` stateful operator instead of a lag/cumsum window).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def start_sessions_to_memory(
    spark: SparkSession,
    events_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "events_sessions",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """AvailableNow drain of the session-window aggregation into memory."""
    agg = session_window_user_stats(read_events_stream(spark, events_dir, schema), gap, watermark)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Idle-timeout sessionization with state EVICTION (EventTimeTimeout).
#
# x33/x104 certify sessionization as window logic / session_window; this is
# the custom-stateful formulation whose point is the TIMEOUT surface: a
# user's open session lives in the state store only until the WATERMARK
# passes its idle horizon, then the finalized session is emitted and the
# state REMOVED. Without eviction, per-key state grows with the key
# cardinality forever — at 100 TB of events the timeout is what keeps the
# state store bounded to the working set of currently-active users.
# ---------------------------------------------------------------------------
SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# ALL of a user's not-yet-sealed sessions live in state (parallel arrays):
# a gap between two sessions is proven by event time, but the EARLIER one
# is only safe to emit once the watermark passes its idle horizon — until
# then a late-but-admissible event could still bridge the gap (the round-7
# review's 10:00/10:31-then-late-10:25 counterexample), and append-mode
# output can never be retracted.
_SESSION_STATE_SCHEMA = "starts array<timestamp>, ends array<timestamp>, ns array<long>"


_SESSION_GAP_MIN = 30


def _session_fold(key, pdfs, state):
    import pandas as pd  # local: runs inside the Arrow worker

    (user_id,) = key
    gap = pd.Timedelta(minutes=_SESSION_GAP_MIN)
    gap_ms = _SESSION_GAP_MIN * 60 * 1000
    # One unified path for data batches AND event-time timeouts: fold any
    # arriving events into the stored session set, then emit exactly the
    # sessions the WATERMARK has sealed (end + gap <= watermark — no
    # admissible event can extend them: anything later is a new session,
    # anything earlier is watermark-dropped before reaching us).
    intervals = []
    if state.exists:
        starts, ends, ns = state.get
        intervals.extend(
            [pd.Timestamp(s), pd.Timestamp(e), int(c)]
            for s, e, c in zip(starts, ends, ns)
        )
    ts_parts = [] if state.hasTimedOut else [
        pd.to_datetime(pdf["ts"]) for pdf in pdfs if len(pdf)
    ]
    ts_parts = [t for t in ts_parts if len(t)]
    if ts_parts:
        # Vectorized intra-batch sessionization: sort event times, a diff
        # > gap starts a new session id, groupby id gives (start, end, n)
        # per session — the Python loops below run over SESSIONS, not
        # events.
        ts = pd.concat(ts_parts).sort_values().reset_index(drop=True)
        sess_id = (ts.diff() > gap).cumsum()
        per = ts.groupby(sess_id).agg(["min", "max", "count"])
        intervals.extend(
            [row["min"], row["max"], int(row["count"])] for _, row in per.iterrows()
        )
    if not intervals:
        # defensive: no stored state and only empty Arrow batches — nothing
        # to fold, nothing to time out (Spark shouldn't call us like this,
        # but an IndexError inside the state fold would kill the query)
        yield pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )
        return
    # merge (stored sessions may interleave with late-but-within-watermark
    # events, so sort then coalesce on the same gap)
    intervals.sort(key=lambda iv: (iv[0], iv[1]))
    merged = [intervals[0]]
    for s, e, n in intervals[1:]:
        if s - merged[-1][1] <= gap:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += n
        else:
            merged.append([s, e, n])
    # seal against the CURRENT watermark. `Timestamp.value` treats the
    # naive timestamps as UTC; correct because timeout_sessions asserts
    # the session timezone is UTC — a non-UTC session would shift this
    # epoch against the watermark's.
    wm_ms = state.getCurrentWatermarkMs()
    # STRICT seal (horizon < watermark, not <=): at exact equality an
    # admissible event with ts == watermark == end + gap would still
    # satisfy the merge condition (ts - end <= gap) against a session the
    # <= rule had already emitted — the boundary case of the same
    # bridge-after-emit bug. Strictness makes "sealed" and "mergeable-by-
    # an-admissible-event" provably disjoint under either watermark
    # boundary convention.
    # epochs via EXACT integer ns->ms (`Timestamp.value`), never
    # `.timestamp()*1000`: the float64 round-trip truncates some whole-ms
    # epochs 1 ms low (verified: 1077395016271 -> ...270), which would
    # re-admit at the boundary precisely the bridge-after-emit bug the
    # strict seal exists to exclude
    sealed = [iv for iv in merged if iv[1].value // 1_000_000 + gap_ms < wm_ms]
    kept = [iv for iv in merged if iv[1].value // 1_000_000 + gap_ms >= wm_ms]
    if kept:
        state.update(
            (
                [iv[0] for iv in kept],
                [iv[1] for iv in kept],
                [iv[2] for iv in kept],
            )
        )
        # wake at the EARLIEST unsealed idle horizon; a kept horizon may
        # now EQUAL the watermark (strict seal), and setTimeoutTimestamp
        # requires a value strictly above it — bump by 1ms, sealing that
        # session on the next firing. Event-time timeout — wall clock
        # plays no part, so replays are deterministic.
        state.setTimeoutTimestamp(
            max(
                min(iv[1].value // 1_000_000 for iv in kept) + gap_ms,
                wm_ms + 1,
            )
        )
    else:
        state.remove()
    if sealed:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": s,
                    "session_end": e,
                    "n_events": cnt,
                }
                for s, e, cnt in sealed
            ]
        )
    else:
        yield pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )


def timeout_sessions(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events: streaming (user_id, ts, ...). Emits ONLY finalized sessions:
    a session is emitted once the WATERMARK passes its idle horizon
    (last event + 30 minutes) — the point after which no admissible event
    can extend or bridge it. A later event proves a gap, but the earlier
    session is held in state until the watermark seals it (append-mode
    output can never retract a session a late event would have merged).
    Each session appears exactly once.

    Requires a UTC session timezone: the state-fold converts the naive
    session-end timestamp to an epoch for setTimeoutTimestamp assuming UTC,
    and a non-UTC session would silently shift eviction against the
    watermark. Fail fast rather than drift."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"timeout_sessions requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): the event-time timeout epoch is computed from a "
            f"naive timestamp assuming UTC and would shift otherwise"
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fold,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def ohlc_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of :func:`operators.timeseries.ohlc_resample`:
    per-(event_type, 1-hour tumbling window) OHLC bars with watermarked
    late-data handling. Identical exactness discipline — integer CENTS,
    open/close via min/max-of-struct (works inside a streaming agg where
    a window-function formulation would not: ranking needs the whole
    partition, struct-argmin folds incrementally in state), so a drained
    stream is BIT-IDENTICAL to the batch operator over the same rows
    (the parity golden pins it)."""
    v = F.floor(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .select(
            "event_type",
            "ts",
            F.struct(F.col("ts"), F.col("event_id"), v.alias("v")).alias("__s"),
            v.alias("__v"),
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min("__s")["v"].cast("long").alias("open_c"),
            F.max("__v").cast("long").alias("high_c"),
            F.min("__v").cast("long").alias("low_c"),
            F.max("__s")["v"].cast("long").alias("close_c"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            "n_events",
        )
    )


def start_ohlc_to_memory(
    spark: SparkSession,
    events_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "events_ohlc",
    watermark: str = "1 hour",
) -> StreamingQuery:
    """AvailableNow drain into an in-memory sink (tests/demos)."""
    agg = ohlc_stream(read_events_stream(spark, events_dir, schema), watermark)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
