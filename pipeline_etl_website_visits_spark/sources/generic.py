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


def read_text(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    whole_file: bool = False,
    with_path: bool = False,
) -> DataFrame:
    """Raw text source for corpus ingestion: one row per line (default) or
    per file (``whole_file`` — document-per-file corpora).

    ``with_path`` adds the source file path via the metadata column —
    lineage for per-file curation decisions (quota by source, provenance
    filtering) without a custom input format. Line mode splits large files
    across tasks; whole-file mode cannot (one row per file), which is the
    standard trade for document-granularity corpora.
    """
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    # NB: .text()'s own wholetext PARAMETER overrides any .option("wholetext")
    # set on the reader — the option form is silently ignored
    df = reader.text(path, wholetext=whole_file)
    if with_path:
        from pyspark.sql import functions as F

        df = df.select(F.col("_metadata.file_path").alias("source_path"), "value")
    return df


def read_orc(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Columnar ORC source — same pushdown/pruning surface as parquet."""
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.orc(path)
