"""Source-module tests."""

from pipeline_etl_website_visits_spark.sources import read_report
from pipeline_etl_website_visits_spark.sources.generic import read_csv, read_json

from tests import fixtures as FX


def test_generic_csv_reader_schema_enforced(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    FX.make_allvalid(str(d), n=5)
    df = read_csv(
        spark, str(d), "email string, jyv string", glob="report_*.txt"
    )
    assert df.columns[:2] == ["email", "jyv"]
    assert df.count() == 5


def test_generic_json_reader(spark, tmp_path):
    p = tmp_path / "j"
    p.mkdir()
    (p / "a.json").write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = read_json(spark, str(p), "a long, b string")
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_reports_reexport(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    FX.make_allvalid(str(d), n=3)
    assert read_report(spark, str(d / "report_allvalid.txt")).count() == 3
