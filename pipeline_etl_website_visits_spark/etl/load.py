"""Warehouse sinks for the visits ETL (SURVEY §2.8).

Reference sinks were MySQL tables (database/schema.sql); here they are
parquet table directories under a warehouse root:

- ``estadisticas/`` — valid rows, partitioned by nombreArchivo (K1)
- ``errores/``      — expanded error rows, partitioned by nombreArchivo (K2)
- ``visitantes/``   — consolidated per-email snapshot maintained by the
                      merge operator (J2)
- ``bitacora/``     — one control row per processed file (K3)

Atomicity (K4): Spark has no cross-table transactions; the protocol is
(1) per-file idempotent writes — estadisticas/errores use dynamic partition
overwrite keyed by nombreArchivo, so re-running a file replaces its own
output instead of duplicating it; (2) the bitacora row is written LAST as
the commit marker — a file is "processed" iff its bitacora row exists,
and every upstream write is safe to redo. At 100 TB the same layout holds
with date partitioning on top (partition by fechaProceso/nombreArchivo) or
Delta tables for real ACID; visitantes would be bucketed by email so the
merge join is shuffle-free.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pipeline_etl_website_visits_spark.etl import schema as S

BITACORA_SCHEMA = StructType(
    [
        StructField("nombreArchivo", StringType(), False),
        StructField("registrosExitosos", LongType(), True),
        StructField("registrosFallidos", LongType(), True),
        StructField("estatus", StringType(), False),
        StructField("fechaProceso", TimestampType(), False),
    ]
)

VISITANTES_SCHEMA = StructType(
    [
        StructField("email", StringType(), False),
        StructField("fechaPrimeraVisita", DateType(), True),
        StructField("fechaUltimaVisita", DateType(), True),
        StructField("visitasTotales", LongType(), True),
        StructField("visitasAnioActual", LongType(), True),
        StructField("visitasMesActual", LongType(), True),
    ]
)


class Warehouse:
    """Parquet-backed warehouse with the four ETL tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _exists(self, table: str) -> bool:
        p = self.path(table)
        # Local+HDFS-safe existence probe via Hadoop FS.
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.Path(p).getFileSystem(conf)
        return fs.exists(jvm.org.apache.hadoop.fs.Path(p))

    def read(self, table: str) -> DataFrame | None:
        if not self._exists(table):
            return None
        return self.spark.read.parquet(self.path(table))

    # -- append sinks (K1/K2), idempotent per file ---------------------------
    def append_partitioned(self, df: DataFrame, table: str) -> None:
        (
            df.write.mode("overwrite")
            .partitionBy("nombreArchivo")
            .parquet(self.path(table))
        )

    # -- visitantes snapshot (J2 target) -------------------------------------
    def read_visitantes(self) -> DataFrame:
        existing = self.read("visitantes")
        if existing is not None:
            return existing
        return self.spark.createDataFrame([], VISITANTES_SCHEMA)

    def write_visitantes(self, df: DataFrame) -> None:
        # Full-snapshot rewrite: materialize before overwriting the input
        # path (lazy plans must not read the dir they are deleting).
        tmp = self.path("visitantes_tmp")
        df.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path("visitantes"))
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(tmp)
        p.getFileSystem(conf).delete(p, True)

    # -- bitacora commit marker (K3, written last) ---------------------------
    def log_bitacora(self, filename: str, ok_count: int, err_count: int, status: str) -> None:
        row = self.spark.createDataFrame(
            [(filename, ok_count, err_count, status)],
            "nombreArchivo string, registrosExitosos long, registrosFallidos long, estatus string",
        ).withColumn("fechaProceso", F.current_timestamp())
        row.write.mode("append").parquet(self.path("bitacora"))

    def processed_files(self) -> set[str]:
        """Filenames with a completion marker (replaces the reference's
        missing already-processed filter, defect D13)."""
        b = self.read("bitacora")
        if b is None:
            return set()
        done = (
            b.filter(F.col("estatus").isin(S.STATUS_OK, S.STATUS_OK_WITH_ERRORS, S.STATUS_LAYOUT_FAIL))
            .select("nombreArchivo")
            .distinct()
            .collect()
        )
        return {r[0] for r in done}
