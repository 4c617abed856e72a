"""Schema-enforced generic readers.

All readers take an explicit schema (inference is a full extra pass over
the data at scale and produces unstable types); globbing and partition
sizing are delegated to the Spark source so pushdown/pruning stay intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pipeline_etl_website_visits_spark.operators.multimodal import read_binary_dir  # noqa: F401


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    glob: str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("header", header).schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, glob: str | None = None, **options: str
) -> DataFrame:
    reader = spark.read.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
