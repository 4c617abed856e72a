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
_TABLE_CACHE: dict[tuple[int, str, str, bool], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False) -> DataFrame:
    key = (id(spark), sf_dir, name, fan_out)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = _load_normalized(spark, sf_dir, name)
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

    Width is SIZE-DERIVED, not core-count-derived (r15, VERDICT r14 item
    4): fanning a sub-split input to every core schedules one task (and
    one Arrow/Python worker spin-up for the mapInPandas family) per core
    over kilobytes of work — measured 32 cores running up to 3.7x SLOWER
    than 8 on the multimodal codecs. One task per
    ``spark.graft.fanOutBytesPerTask`` input bytes (default 64 KiB —
    compressed parquet, so a task still carries hundreds of heavy rows),
    capped at defaultParallelism, makes the fan-out identical at every
    core count. In production the knob only matters for inputs smaller
    than one scan split; real multi-split inputs never reach this path.
    """
    try:
        size = os.path.getsize(table_path(sf_dir, name))
    except OSError:
        return df
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    max_bytes = int(raw[:-1]) if raw.endswith("b") else int(raw)
    if size >= max_bytes:
        return df
    per_task = int(spark.conf.get("spark.graft.fanOutBytesPerTask", "65536"))
    width = min(
        spark.sparkContext.defaultParallelism, max(1, -(-size // max(per_task, 1)))
    )
    return df.repartition(width)


def _parquet_timestamp_columns(path: str) -> dict[str, str]:
    """Footer-level timestamp inventory: column -> 'ns' | 'ntz' | 'tz'.

    Reads only the parquet schemas (no data). Directory tables union the
    inventory across ALL part files: schema-evolved or mixed-writer tables
    can carry a nanos/NTZ column only in later parts, and inspecting just the
    first part would silently skip normalization for those columns. On a
    conflict (same column, different physical flavor across parts) the
    "most in need of normalization" kind wins (ns > ntz > tz) so the fix-up
    is applied; footers are tiny, so even thousands of parts are cheap, and
    at real scale a catalog (Delta/Iceberg) would hold one logical schema.
    """
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    paths = [path]
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not paths:
            return {}
    rank = {"tz": 0, "ntz": 1, "ns": 2}
    out: dict[str, str] = {}
    for p in paths:
        for field in pq.read_schema(p):
            if pt.is_timestamp(field.type):
                if field.type.unit == "ns":
                    kind = "ns"
                elif field.type.tz is None:
                    kind = "ntz"
                else:
                    kind = "tz"
                if rank[kind] > rank.get(out.get(field.name), -1):
                    out[field.name] = kind
    return out


def _load_normalized(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table with every timestamp column normalized to session-zoned
    TIMESTAMP, whatever physical type the test-data generator chose.

    This generalizes the round-2 events lesson to ALL tables and columns:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright — set
      ``nanosAsLong`` and truncate to microseconds with integer arithmetic
      (``div`` — no double round-trip, exact for any epoch), matching
      DuckDB's ns→us truncation. Detection is footer-level (pyarrow schema):
      with nanosAsLong on, a nanos column surfaces as plain ``bigint``,
      indistinguishable from a true long column without the footer.
    - plain ``timestamp[us]`` (no tz): Spark 4 infers TIMESTAMP_NTZ, which
      ``unix_micros``/``cast("long")`` reject — cast to TIMESTAMP. The
      session tz is pinned to UTC (session.py), so wall-clock semantics
      match the naive DuckDB oracle exactly.
    """
    from pyspark.sql import functions as F

    path = table_path(sf_dir, name)
    # nanosAsLong set unconditionally (harmless when no nanos column exists):
    # if footer inspection below fails, a TIMESTAMP(NANOS) table must still
    # not hard-fail the vectorized reader.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_cols = _parquet_timestamp_columns(path)
    except Exception as e:
        import warnings

        warnings.warn(
            f"parquet footer inspection failed for {path} ({type(e).__name__}: {e}); "
            "timestamp normalization skipped — nanos columns will surface as "
            "bigint and NTZ columns as timestamp_ntz",
            stacklevel=2,
        )
        ts_cols = {}
    df = spark.read.parquet(path)
    for col, kind in ts_cols.items():
        if kind == "ns":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif kind == "ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL entry points)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
