"""The visits report_*.txt CSV source (reference tasks/pre_processing.py:8-21
listing + utils/utils_transform.py:65-74 scan, rebuilt on Spark sources).

Thin re-exports: the batch reader lives with the batch pipeline, the stream
reader with the streaming module — this module is the stable import point.
"""

from pipeline_etl_website_visits_spark.etl.pipeline import (  # noqa: F401
    list_report_files,
    read_header,
    read_report,
)
from pipeline_etl_website_visits_spark.streaming.visits_stream import read_report_stream  # noqa: F401
