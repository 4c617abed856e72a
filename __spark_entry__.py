"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared inventory from
``pipeline_etl_website_visits_spark.queries`` (SURVEY.md §2.12 + §2.11
extensions). Queries without an oracle entry (MinHash/SimHash/ANN-LSH) are
hash-family-based ops not expressible in DuckDB SQL; the driver records the
weaker rows-only check for them by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_etl_website_visits_spark.queries.registry import oracle_sqls, spark_queries
import pipeline_etl_website_visits_spark.queries  # noqa: F401  (populates the registry)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pipeline_etl_website_visits_spark.queries.visits import flagship_visitantes

    return flagship_visitantes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return oracle_sqls()
