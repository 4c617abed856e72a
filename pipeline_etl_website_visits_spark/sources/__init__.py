"""Source connectors.

- visits ``report_*.txt`` CSV source (batch + stream) — re-exported here;
  the batch reader lives with the batch pipeline, the stream reader with the
  streaming module (reference tasks/pre_processing.py:8-21 listing +
  utils/utils_transform.py:65-74 scan, rebuilt on Spark sources).
- :mod:`generic` — schema-enforced CSV/JSON/parquet readers and the
  binaryFile media source.
- :mod:`jdbc` — JDBC source/sink wrappers (availability-gated: the test
  container ships no database driver; the code path is the standard
  ``spark.read.jdbc`` surface).
"""

from pipeline_etl_website_visits_spark.etl.pipeline import (  # noqa: F401
    list_report_files,
    read_header,
    read_report,
)
from pipeline_etl_website_visits_spark.streaming.visits_stream import read_report_stream  # noqa: F401
