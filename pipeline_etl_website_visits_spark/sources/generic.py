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


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    glob: str | None = None,
    **options: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """JSONL corpus ingestion with corrupt-record quarantine: returns
    ``(valid, quarantine, parsed)``.

    The practical reality of web-scale JSONL is that some fraction of
    lines are truncated, mis-encoded, or schema-violating; failing the
    job (FAILFAST) or silently nulling them (default PERMISSIVE with no
    corrupt column) both lose data. This reader applies the warehouse's
    V1 quarantine discipline to the corpus source: PERMISSIVE parse with
    an explicit ``_corrupt_record`` column, then one filter splits clean
    rows from quarantined raw lines (kept verbatim for repair/audit).

    Scale notes: the schema is explicit (inference would be a second full
    pass and is unstable across corpus shards); the split is a map-side
    filter over ONE parsed pass. Spark requires the corrupt column
    declared in the schema (appended here, never part of the caller's
    contract) and DISALLOWS projecting only the corrupt column straight
    off a raw file scan — the parsed frame is therefore cached (the
    exception's own prescribed remedy), which is also what you want: both
    branches consume the same parse. The third return value ``parsed`` IS
    the cached frame: call ``parsed.unpersist()`` once both branches are
    written (unpersisting a DERIVED frame like ``valid`` is a silent
    no-op — only the cached plan itself releases the entry).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    full = StructType(schema.fields[:]).add("_corrupt_record", StringType())
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.json(path).cache()
    valid = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return valid, quarantine, df


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_rows: int = 100_000,
    order_col: str | None = None,
    format: str = "parquet",
) -> None:
    """Export a curated corpus as size-bounded, deterministically-ordered
    shards — the last mile of a training-data pipeline (the files a
    data-loader consumes).

    - ``maxRecordsPerFile`` bounds every shard at ``shard_rows`` rows, so
      loader memory / sequence-packing buffers size against a constant
      regardless of corpus size;
    - with ``order_col``, rows are RANGE-partitioned then sorted within
      partitions: global order across the shard sequence with exactly one
      shuffle (a global ``orderBy`` costs the same exchange; doing it
      this way makes the intent explicit and keeps the sort spill-local);
    - without ``order_col``, the input partitioning is preserved
      (no shuffle — for corpora already shuffled/salted upstream, e.g.
      x50's deterministic shuffle keys).

    JSONL output (``format='json'``) is the interchange form most
    training stacks read; parquet keeps types and compresses ~5x better.
    """
    out = df
    if order_col is not None:
        out = df.repartitionByRange(order_col).sortWithinPartitions(order_col)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", shard_rows)
        .format(format)
        .save(path)
    )


def read_parquet_evolving(
    spark: SparkSession,
    path: str,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Parquet-on-read SCHEMA EVOLUTION: union the schemas of every file
    under ``path`` (``mergeSchema`` — per-file footers are merged, files
    missing a column yield NULLs for it) and optionally apply a
    rename map for columns that changed name across eras.

    The real-world shape this serves: a corpus directory written over
    months by an evolving pipeline — early files (doc_id, text), later
    ones add (lang, source) — must read as ONE relation without a
    backfill rewrite. ``mergeSchema`` costs one footer read per file at
    planning time (no data scan), so it stays cheap even at 100 TB where
    a rewrite would be the single most expensive operation available.

    ``renames`` maps old → new: a column that appears under its OLD name
    in old files and its NEW name in new files is coalesced into the new
    name (new-name value wins where both exist, which cannot happen in a
    disjoint-era layout). Rename maps are metadata the caller owns — the
    files are never touched.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if renames:
        from pyspark.sql import functions as F

        for old, new in renames.items():
            if old in df.columns and new in df.columns:
                df = df.withColumn(new, F.coalesce(F.col(new), F.col(old))).drop(old)
            elif old in df.columns:
                df = df.withColumnRenamed(old, new)
    return df
