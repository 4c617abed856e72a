"""Source connectors.

- :mod:`reports` — the visits ``report_*.txt`` CSV source (batch + stream).
- :mod:`generic` — schema-enforced CSV/JSON/parquet readers and the
  binaryFile media source.
- :mod:`jdbc` — JDBC source/sink wrappers (availability-gated: the test
  container ships no database driver; the code path is the standard
  ``spark.read.jdbc`` surface).
"""

from pipeline_etl_website_visits_spark.sources.reports import read_report, read_report_stream  # noqa: F401
