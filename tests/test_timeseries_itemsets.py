"""Unit tests for the sequence/time-series/itemset operators (round 6).

Each operator gets a hand-computable golden case (the oracle checks at
sf0.001/0.01/0.1 cover the at-scale values); the plan tests pin the
scale-relevant shapes: pair mining must not self-join the fact, and the
UDTF fan-out must not introduce a shuffle.
"""

import datetime

import pyspark.sql.functions as F

from pipeline_etl_website_visits_spark.operators.itemsets import co_occurrence_pairs
from pipeline_etl_website_visits_spark.operators.timeseries import (
    event_transitions,
    gap_fill_forward,
    mad_outliers,
)
from pipeline_etl_website_visits_spark.operators.text import register_chunk_udtf


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_co_occurrence_pairs_counts_each_basket_once(spark):
    lines = spark.createDataFrame(
        # basket 1: items 3,1,2 (+ dup line for 1) -> pairs (1,2),(1,3),(2,3)
        # basket 2: items 1,2            -> pair (1,2)
        # basket 3: single item          -> no pairs
        [(1, 3), (1, 1), (1, 2), (1, 1), (2, 2), (2, 1), (3, 9)],
        "l_orderkey long, l_partkey long",
    )
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in co_occurrence_pairs(lines).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # the packed-key fast path (one BIGINT shuffle key) is value-identical
    packed = {
        (r.item_a, r.item_b): r.n_baskets
        for r in co_occurrence_pairs(lines, pack_pairs=True).collect()
    }
    assert packed == got


def test_co_occurrence_pairs_plan_has_no_join_and_two_exchanges(spark):
    lines = spark.createDataFrame([(1, 1), (1, 2)], "l_orderkey long, l_partkey long")
    for pack in (False, True):
        plan = (
            co_occurrence_pairs(lines, pack_pairs=pack)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan  # the whole point vs the oracle's self-join
        # minimal-exchange shape: basket hash (reused by the basket agg via
        # subset partitioning) + pair-count hash — nothing else may shuffle
        # (Spark's self-join twin of the oracle measures ~1.5x slower here)
        assert plan.count("Exchange hashpartitioning") == 2


def test_event_transitions_counts_and_ppm(spark):
    rows = [
        (1, _ts(0), 10, "a", 0.0, None),
        (2, _ts(1), 10, "b", 0.0, None),
        (3, _ts(2), 10, "a", 0.0, None),
        (4, _ts(3), 10, "b", 0.0, None),
        (5, _ts(0), 20, "a", 0.0, None),
        (6, _ts(1), 20, "c", 0.0, None),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {(r.from_type, r.to_type): (r.n, r.prob_ppm) for r in event_transitions(events).collect()}
    # from 'a': 2x ->b, 1x ->c ; integer ppm floors
    assert got[("a", "b")] == (2, 666666)
    assert got[("a", "c")] == (1, 333333)
    assert got[("b", "a")] == (1, 1000000)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "a")}


def test_gap_fill_forward_carries_and_leaves_prefix_null(spark):
    rows = [
        # series 'x': readings in hours 0 and 3; hours 1,2 carry 1.5; hour 4 carries 4.0
        (1, _ts(0, 30), 1, "x", 1.5, None),
        (2, _ts(3, 10), 1, "x", 4.0, None),
        # series 'y': first reading at hour 2 -> hours 0,1 stay NULL
        # hour 2 has two readings; later (ts, id) wins -> 9.0
        (3, _ts(2, 5), 1, "y", 7.0, None),
        (4, _ts(2, 50), 1, "y", 9.0, None),
        # global span extends to hour 4
        (5, _ts(4, 0), 1, "x", 4.0, None),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {(r.series, r.hour_ts): r.reading for r in gap_fill_forward(events).collect()}
    assert len(out) == 10  # 2 series x 5 hours
    assert out[("x", "2024-01-01 01:00:00")] == 1.5
    assert out[("x", "2024-01-01 02:00:00")] == 1.5
    assert out[("x", "2024-01-01 03:00:00")] == 4.0
    assert out[("y", "2024-01-01 00:00:00")] is None
    assert out[("y", "2024-01-01 01:00:00")] is None
    assert out[("y", "2024-01-01 02:00:00")] == 9.0
    assert out[("y", "2024-01-01 04:00:00")] == 9.0


def test_mad_outliers_flags_planted_outlier(spark):
    # group 'g': values 1..9 plus a wild 1000 -> med 5.5, MAD 2.5, one flag
    rows = [(i, _ts(0), 1, "g", float(v), None) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    (r,) = mad_outliers(events, group_col="event_type", value_col="value", k=3.0).collect()
    assert (r.event_type, r.med, r.mad, r.n_outliers, r.n_rows) == ("g", 5.5, 2.5, 1, 10)


def test_mad_outliers_approx_knob_within_tolerance(spark):
    """exact=False (the 100 TB approx_percentile path) must agree with the
    exact path within sketch accuracy — identical here, where n is far
    below the sketch's 1/accuracy resolution."""
    rows = [
        (i, _ts(0), 1, "g" if i % 2 else "h", float(v), None)
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000] * 4)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    exact = {
        r.event_type: r
        for r in mad_outliers(events, group_col="event_type", value_col="value", k=3.0).collect()
    }
    approx = {
        r.event_type: r
        for r in mad_outliers(
            events, group_col="event_type", value_col="value", k=3.0, exact=False
        ).collect()
    }
    assert set(exact) == set(approx) == {"g", "h"}
    for g in exact:
        # approx_percentile returns a true order statistic (not the
        # two-middle mean), so allow half an inter-value step of drift
        assert abs(exact[g].med - approx[g].med) <= 1.0, (g, exact[g], approx[g])
        assert abs(exact[g].mad - approx[g].mad) <= 1.0, (g, exact[g], approx[g])
        # the planted 1000s are far beyond any borderline: flags identical
        assert exact[g].n_outliers == approx[g].n_outliers
        assert exact[g].n_rows == approx[g].n_rows


def test_chunk_udtf_ragged_and_empty(spark):
    register_chunk_udtf(spark, "split_chunks_t")
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, ""), (4, None)], "doc_id long, nt string"
    ).createOrReplaceTempView("chunk_udtf_t")
    rows = spark.sql(
        "SELECT doc_id, c.chunk_ix, c.n_words, c.chunk"
        " FROM chunk_udtf_t, LATERAL split_chunks_t(nt, 2) c ORDER BY doc_id, chunk_ix"
    ).collect()
    got = [(r.doc_id, r.chunk_ix, r.n_words, r.chunk) for r in rows]
    assert got == [
        (1, 0, 2, "a b"),
        (1, 1, 2, "c d"),
        (1, 2, 1, "e"),
        (2, 0, 1, "x"),
        # doc 3: empty text -> string_split semantics, one [''] token ->
        # one (0, 1, '') chunk (matches the x146 DuckDB oracle exactly)
        (3, 0, 1, ""),
        # doc 4: NULL text -> zero rows (lateral drops it, as does the
        # oracle's generate_series over a NULL length)
    ]


def test_pack_pairs_domain_contract_is_enforced(spark):
    """pack_pairs=True packs (a, b) as a*2^32+b in one signed BIGINT —
    sound only for ids in [0, 2^31). The contract is enforced (ADVICE
    r7), not docstring-only: non-integral item columns fail at plan
    time; an out-of-domain id fails the job instead of silently
    wrapping the key and colliding distinct pairs."""
    import pytest

    with pytest.raises(TypeError, match="integral"):
        co_occurrence_pairs(
            spark.createDataFrame(
                [(1, "a"), (1, "b")], "l_orderkey int, l_partkey string"
            ),
            pack_pairs=True,
        )
    for bad_id in (-5, 2**31):
        with pytest.raises(Exception, match="pack_pairs"):
            co_occurrence_pairs(
                spark.createDataFrame(
                    [(1, bad_id), (1, 3)], "l_orderkey int, l_partkey long"
                ),
                pack_pairs=True,
            ).collect()
    # the guard costs O(1) per basket (sorted-array endpoints) and does
    # not disturb valid input: packed == struct counts
    ok = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (2, 30)],
        "l_orderkey int, l_partkey int",
    )
    assert (
        co_occurrence_pairs(ok, pack_pairs=True).collect()
        == co_occurrence_pairs(ok, pack_pairs=False).collect()
    )


def test_touch_attribution_semantics(spark):
    """First/last touch per conversion segment; unattributable conversions
    (no touch since the previous purchase) are excluded; touches after a
    purchase credit the NEXT one."""
    from pipeline_etl_website_visits_spark.operators.timeseries import touch_attribution

    rows = [
        # (event_id, ts, user_id, event_type)
        (1, 100, 7, "view"),
        (2, 200, 7, "click"),
        (3, 300, 7, "purchase"),   # seg 0: first=view last=click n=2
        (4, 400, 7, "purchase"),   # seg 1: no touches -> excluded
        (5, 500, 7, "click"),
        (6, 600, 7, "purchase"),   # seg 2: first=last=click n=1
        (7, 700, 9, "error"),
        (8, 800, 9, "purchase"),   # other user, error is not a touch -> excluded
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    got = {r["purchase_id"]: r for r in touch_attribution(events).collect()}
    assert set(got) == {3, 6}
    assert (got[3]["first_touch"], got[3]["last_touch"], got[3]["n_touches"]) == ("view", "click", 2)
    assert (got[6]["first_touch"], got[6]["last_touch"], got[6]["n_touches"]) == ("click", "click", 1)


def test_timed_funnel_strict_sequencing(spark):
    """The gap bound and strict after-ordering both bite: a click BEFORE
    the first view doesn't count, a purchase outside the gap doesn't
    count, and earliest-completion semantics pick the qualifying
    minimum."""
    from pipeline_etl_website_visits_spark.operators.timeseries import timed_funnel

    rows = [
        # user 1: click(50) precedes view(100) -> not a funnel click;
        # click(150) qualifies; purchase at 150+3601s -> outside gap
        (1, 50, 1, "click"),
        (2, 100, 1, "view"),
        (3, 150, 1, "click"),
        (4, 150 + 3_601, 1, "purchase"),
        # user 2: full funnel within gaps
        (5, 10, 2, "view"),
        (6, 20, 2, "click"),
        (7, 30, 2, "purchase"),
        # user 3: view only
        (8, 5, 3, "view"),
    ]
    events = spark.createDataFrame(
        [(e, t * 1_000_000_000, u, ty) for e, t, u, ty in rows],
        "event_id long, ts long, user_id long, event_type string",
    )
    out = timed_funnel(events, gap_seconds=3600).collect()[0]
    assert (out["n_step1"], out["n_step2"], out["n_step3"]) == (3, 2, 1)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="two steps"):
        timed_funnel(events, steps=("view",))
