"""Golden tests for the visitantes merge (FIXTURES.md §F-C seed rows).

Every MERGE branch of reference utils/utils_load.py:50-81 (with the
SURVEY D21/D22 rulings): matched same-month, matched new-month, matched
new-year, matched older-incoming-last-visit, and not-matched insert.
"""

import datetime

import pytest

from pipeline_etl_website_visits_spark.etl.load import VISITANTES_SCHEMA
from pipeline_etl_website_visits_spark.operators.merge import merge_upsert, visitantes_merge
import pyspark.sql.functions as F

D = datetime.date
PROCESS_DATE = "2026-08-28"  # fixes "current" year/month = 2026-08


@pytest.fixture()
def target(spark):
    rows = [
        ("match-same-month@example.com", D(2026, 7, 1), D(2026, 8, 2), 10, 6, 2),
        ("match-prev-month@example.com", D(2025, 1, 1), D(2026, 7, 30), 20, 8, 8),
        ("match-prev-year@example.com", D(2024, 5, 5), D(2025, 12, 31), 30, 30, 5),
        ("match-older-last@example.com", D(2026, 1, 1), D(2026, 8, 20), 5, 5, 5),
    ]
    return spark.createDataFrame(rows, VISITANTES_SCHEMA)


@pytest.fixture()
def source(spark):
    # one batch: every target email gets 3 visits on 2026-08-15, plus a new
    # visitor; match-older-last's batch dates are *earlier* than its target
    # fechaUltimaVisita.
    rows = [
        ("match-same-month@example.com", D(2026, 8, 10), D(2026, 8, 15), 3, 3, 3),
        ("match-prev-month@example.com", D(2026, 8, 10), D(2026, 8, 15), 3, 3, 3),
        ("match-prev-year@example.com", D(2026, 8, 10), D(2026, 8, 15), 3, 3, 3),
        ("match-older-last@example.com", D(2026, 8, 10), D(2026, 8, 15), 3, 3, 3),
        ("new-visitor@example.com", D(2026, 8, 12), D(2026, 8, 14), 2, 2, 2),
    ]
    return spark.createDataFrame(rows, VISITANTES_SCHEMA)


def test_merge_branches(spark, target, source):
    out = {r["email"]: r for r in visitantes_merge(target, source, PROCESS_DATE).collect()}
    assert len(out) == 5

    r = out["match-same-month@example.com"]  # same year+month: all add
    assert (r["visitasTotales"], r["visitasAnioActual"], r["visitasMesActual"]) == (13, 9, 5)
    assert r["fechaPrimeraVisita"] == D(2026, 7, 1)  # D22 keep-first
    assert r["fechaUltimaVisita"] == D(2026, 8, 15)

    r = out["match-prev-month@example.com"]  # same year, new month: mes resets
    assert (r["visitasTotales"], r["visitasAnioActual"], r["visitasMesActual"]) == (23, 11, 3)

    r = out["match-prev-year@example.com"]  # new year: anio+mes reset
    assert (r["visitasTotales"], r["visitasAnioActual"], r["visitasMesActual"]) == (33, 3, 3)

    r = out["match-older-last@example.com"]  # greatest(): keep target last-visit
    assert r["fechaUltimaVisita"] == D(2026, 8, 20)
    # target last visit is in current year+month => counters add
    assert (r["visitasTotales"], r["visitasAnioActual"], r["visitasMesActual"]) == (8, 8, 8)

    r = out["new-visitor@example.com"]  # not matched: insert
    assert (r["visitasTotales"], r["visitasAnioActual"], r["visitasMesActual"]) == (2, 2, 2)
    assert r["fechaPrimeraVisita"] == D(2026, 8, 12)


def test_merge_empty_target(spark, source):
    empty = spark.createDataFrame([], VISITANTES_SCHEMA)
    out = visitantes_merge(empty, source, PROCESS_DATE)
    assert out.count() == 5
    r = out.filter(F.col("email") == "new-visitor@example.com").first()
    assert r["visitasTotales"] == 2


def test_merge_idempotent_shape(spark, target, source):
    """Merging twice adds counters twice (reference semantics); row count stays keyed."""
    once = visitantes_merge(target, source, PROCESS_DATE)
    twice = visitantes_merge(once, source, PROCESS_DATE)
    assert twice.count() == 5
    r = twice.filter(F.col("email") == "match-same-month@example.com").first()
    assert r["visitasTotales"] == 16


def test_generic_merge_upsert(spark):
    from pipeline_etl_website_visits_spark.operators.merge import add_counters, greatest_of, keep_target

    t = spark.createDataFrame([("a", 1, D(2020, 1, 1)), ("b", 2, D(2021, 1, 1))], "k string, n int, d date")
    s = spark.createDataFrame([("b", 5, D(2022, 2, 2)), ("c", 7, D(2023, 3, 3))], "k string, n int, d date")
    out = {
        r["k"]: r
        for r in merge_upsert(t, s, "k", {"n": add_counters, "d": greatest_of}).collect()
    }
    assert out["a"]["n"] == 1 and out["b"]["n"] == 7 and out["c"]["n"] == 7
    assert out["b"]["d"] == D(2022, 2, 2)
