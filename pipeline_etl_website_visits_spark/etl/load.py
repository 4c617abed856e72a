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
output instead of duplicating it; (2) the visitantes merge is additive
(counters), NOT naturally redo-safe, so each snapshot version carries an
``_applied`` manifest of the batch keys merged into it — a redo whose key is
already in the manifest skips the merge instead of double-counting;
(3) the bitacora row is written LAST as the commit marker — a file is
"processed" iff its bitacora row exists, and with (1)+(2) every upstream
write is safe to redo. At 100 TB the same layout holds
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

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _fs(self, p: str):
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        return hpath.getFileSystem(conf), hpath, jvm

    def _exists(self, table: str) -> bool:
        fs, hpath, _ = self._fs(self.path(table))
        return fs.exists(hpath)

    def read(self, table: str) -> DataFrame | None:
        if not self._exists(table):
            return None
        return self.spark.read.parquet(self.path(table))

    # -- append sinks (K1/K2), idempotent per file ---------------------------
    def append_partitioned(self, df: DataFrame, table: str) -> None:
        # dynamic overwrite scoped to THIS write (session conf untouched):
        # re-running a file replaces only its own partition.
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("nombreArchivo")
            .parquet(self.path(table))
        )

    # -- visitantes snapshot (J2 target) -------------------------------------
    # Versioned snapshots + a pointer file: each merge writes a brand-new
    # directory, then atomically repoints ``visitantes_CURRENT``. A crash
    # mid-write leaves the previous version intact and referenced — the
    # poor-man's table format (Delta/Iceberg replace this wholesale at
    # production scale, docs/SCALE.md).
    _POINTER = "visitantes_CURRENT"

    def _current_visitantes_version(self) -> str | None:
        fs, hpath, jvm = self._fs(self.path(self._POINTER))
        if not fs.exists(hpath):
            return None
        stream = fs.open(hpath)
        try:
            reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
            return (reader.readLine() or "").strip() or None
        finally:
            stream.close()

    def read_visitantes(self) -> DataFrame:
        version = self._current_visitantes_version()
        if version is not None:
            return self.spark.read.parquet(self.path(version))
        return self.spark.createDataFrame([], VISITANTES_SCHEMA)

    def visitantes_applied(self) -> set[str]:
        """Batch keys (file names / stream batch ids) already merged into the
        CURRENT snapshot. The merge is additive, so redo-safety comes from
        checking this set: a crash after ``write_visitantes`` but before the
        bitacora marker must NOT re-apply the batch on the retry."""
        version = self._current_visitantes_version()
        if version is None:
            return set()
        fs, hpath, jvm = self._fs(os.path.join(self.path(version), "_applied"))
        if not fs.exists(hpath):
            return set()
        stream = fs.open(hpath)
        keys: set[str] = set()
        try:
            reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
            line = reader.readLine()
            while line is not None:
                if line.strip():
                    keys.add(line.strip())
                line = reader.readLine()
        finally:
            stream.close()
        return keys

    def write_visitantes(self, df: DataFrame, applied_key: str | None = None) -> None:
        applied = self.visitantes_applied()
        if applied_key is not None:
            applied = applied | {applied_key}
        prev = self._current_visitantes_version()
        n = int(prev.rsplit("_v", 1)[1]) + 1 if prev else 0
        version = f"visitantes_v{n}"
        df.write.mode("overwrite").parquet(self.path(version))
        # manifest goes INSIDE the version dir, before the pointer flips:
        # the pointer swap atomically publishes data + manifest together
        fs0, manifest_path, jvm0 = self._fs(os.path.join(self.path(version), "_applied"))
        mout = fs0.create(manifest_path, True)
        try:
            mout.write(bytearray(("\n".join(sorted(applied)) + "\n").encode("utf-8")))
        finally:
            mout.close()
        # repoint: write pointer to a temp file, then rename over (rename is
        # atomic on HDFS/local; on S3 a conditional-put would stand in)
        fs, pointer_path, jvm = self._fs(self.path(self._POINTER))
        tmp_path = jvm.org.apache.hadoop.fs.Path(self.path(self._POINTER + ".tmp"))
        out = fs.create(tmp_path, True)
        try:
            out.write(bytearray(version.encode("utf-8")))
        finally:
            out.close()
        if fs.exists(pointer_path):
            fs.delete(pointer_path, False)
        fs.rename(tmp_path, pointer_path)
        # retain only the previous version for post-crash inspection
        if prev is not None and n >= 2:
            old = jvm.org.apache.hadoop.fs.Path(self.path(f"visitantes_v{n - 2}"))
            if fs.exists(old):
                fs.delete(old, True)

    # -- per-file log trail (O6; reference utils/utils_flows.py:6-23 wrote
    #    logs/DDMMYY/<file>.log — here one structured parquet row per event,
    #    date-partitioned, so an operator debugging one bad file filters on
    #    nombreArchivo and gets the full stage trail) -----------------------
    def log_file_events(self, events: list[tuple[str, str, str, str]]) -> None:
        """Append (filename, stage, level, message) rows for one file's run.

        Buffered by the caller and written ONCE per file (one small parquet
        append, same cost profile as the bitacora marker — not one write per
        event). Partitioned by fecha (DDMMYY) mirroring the reference's
        per-day log directories.
        """
        if not events:
            return
        # explicit per-flush sequence: every row of a flush shares one
        # current_timestamp(), so the timestamp alone cannot order stages
        import time

        base_seq = int(time.time() * 1000) * 1000  # flush epoch-ms, 1000 slots
        rows = self.spark.createDataFrame(
            [(f, e, lv, m, base_seq + i) for i, (f, e, lv, m) in enumerate(events)],
            "nombreArchivo string, etapa string, nivel string, mensaje string, seq long",
        ).withColumn("fechaProceso", F.current_timestamp()).withColumn(
            "fecha", F.date_format(F.current_date(), "ddMMyy")
        )
        rows.write.mode("append").partitionBy("fecha").parquet(self.path("logs"))

    def file_log(self, filename: str) -> DataFrame | None:
        """The per-file trail (all stages, ordered) — the O6 debugging view."""
        logs = self.read("logs")
        if logs is None:
            return None
        return logs.filter(F.col("nombreArchivo") == filename).orderBy("seq")

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
