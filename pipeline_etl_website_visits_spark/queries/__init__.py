"""Declared-query inventory (SURVEY.md §2.12 + north-star extensions).

Importing this package populates the registry in
:mod:`pipeline_etl_website_visits_spark.queries.registry`.
"""

from pipeline_etl_website_visits_spark.queries.registry import REGISTRY, QuerySpec, query  # noqa: F401

# Populate the registry.
from pipeline_etl_website_visits_spark.queries import relational  # noqa: E402,F401
from pipeline_etl_website_visits_spark.queries import llmops  # noqa: E402,F401
from pipeline_etl_website_visits_spark.queries import visits  # noqa: E402,F401
from pipeline_etl_website_visits_spark.queries import extended  # noqa: E402,F401
from pipeline_etl_website_visits_spark.queries import curation  # noqa: E402,F401
