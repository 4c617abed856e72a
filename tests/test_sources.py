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


def test_text_source_line_and_wholefile_modes(spark, tmp_path):
    from pipeline_etl_website_visits_spark.sources.generic import read_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("single doc body\nsecond line\n")

    lines = read_text(spark, str(d), glob="*.txt")
    assert lines.count() == 4

    docs = read_text(spark, str(d), glob="*.txt", whole_file=True, with_path=True).collect()
    assert len(docs) == 2
    by_name = {r["source_path"].rsplit("/", 1)[-1]: r["value"] for r in docs}
    assert by_name["a.txt"] == "line one\nline two\n"
    assert "second line" in by_name["b.txt"]


def test_orc_round_trip(spark, tmp_path):
    from pipeline_etl_website_visits_spark.sources.generic import read_orc
    from pipeline_etl_website_visits_spark.tables import load_table
    from tests.conftest import SF_DIR

    nation = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_orc")
    nation.write.orc(path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
