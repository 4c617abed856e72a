"""Test-data table access (TESTDATA.md star schema + events/documents/embeddings).

All reads are plain ``spark.read.parquet`` so Catalyst gets full pushdown:
column pruning and predicate pushdown reach the parquet scan, and partition
sizing follows ``spark.sql.files.maxPartitionBytes``. At 100 TB these tables
would be date-partitioned / bucketed parquet or Delta; the loader API is the
same either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Per-session DataFrame memo: repeated loads of the same table re-list the
# directory and re-read parquet footers during analysis; reusing the analyzed
# DataFrame removes that fixed cost from every query (a DataFrame is an
# immutable lazy plan — safe to share).
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False) -> DataFrame:
    key = (id(spark), sf_dir, name, fan_out)
    df = _TABLE_CACHE.get(key)
    if df is None:
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(table_path(sf_dir, name))
        if fan_out:
            df = _fan_out(spark, sf_dir, name, df)
        _TABLE_CACHE[key] = df
    return df


def _fan_out(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> DataFrame:
    """Spread a single-split scan across the cluster before heavy per-row
    compute (explode/regex/vector math).

    A parquet file smaller than ``spark.sql.files.maxPartitionBytes`` scans
    as ONE task (and a single row group cannot split at all), so every
    downstream map-side stage serializes through one core. One cheap
    round-robin exchange of the pruned columns unlocks full parallelism.
    At real scale inputs arrive in thousands of splits, the condition is
    false, and this is a no-op — callers opt in only where per-row compute
    dominates, because the exchange changes nothing for scan-bound queries.

    Note: only safe where downstream aggregation is order-insensitive
    (integer/decimal sums, min/max, counts) — repartitioning permutes
    floating-point partial-sum order.
    """
    try:
        size = os.path.getsize(table_path(sf_dir, name))
    except OSError:
        return df
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    max_bytes = int(raw[:-1]) if raw.endswith("b") else int(raw)
    if size >= max_bytes:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the events ``ts`` column to session-zoned TIMESTAMP whatever
    physical type the parquet writer chose:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it — read nanos as
      long and truncate to microseconds with integer arithmetic (``div`` — no
      double round-trip, exact for any epoch), matching DuckDB's ns→us
      truncation.
    - plain ``timestamp[us]`` (no tz): Spark 4 infers TIMESTAMP_NTZ, which
      downstream ``unix_micros``/``cast("long")`` reject — cast to TIMESTAMP.
      The session tz is pinned to UTC (session.py), so wall-clock semantics
      match the naive DuckDB oracle exactly.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL entry points)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
