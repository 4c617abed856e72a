"""Streaming corpus ingestion into the stored dedup gram index.

The batch half of this story is ``dedup.save_gram_index`` (build once) +
``dedup.append_to_gram_index`` (fold a day's batch in); this module is
the streaming steady state: new document files land in a directory, each
micro-batch's grams are appended to the bucketed index table, and later
``containment_dedup_vs_stored`` calls see them immediately (same catalog
table, bucket-aligned files).

Redo discipline (the K4 / visits_stream contract): the file source's
checkpoint gives at-least-once ``foreachBatch`` invocations with a
STABLE ``batch_id``; the append's ``applied_key`` ledger (one write-once
marker per batch, ``operators/ledger.py``) makes a replay whose marker
landed a no-op. Keys are scoped ``<stream>_b<batch_id>`` where
``<stream>`` derives from the checkpoint location — batch ids are only
unique WITHIN one checkpoint lineage, so a rebuilt checkpoint (ids
restart at 0) or a second stream into the same table gets its own key
space instead of silently colliding with recorded markers and dropping
real batches. The honest crash-window statement (same as the batch
append's own contract): a crash BETWEEN the insert and the marker
re-appends that batch's grams on replay. The ungated path therefore
composes to effectively-once with that one documented window; the
``dedup_threshold`` gate closes it — see :func:`index_ingest_batch` —
because a replayed already-inserted doc is a perfect duplicate of
itself and gets gated out.

Scale: each micro-batch does one shingle pass + a bucket-aligned
``insertInto`` — the index side never rewrites, the batch's grams
shuffle once into the table's bucket layout. At 100 TB the index is the
big side and it is never touched beyond the appended files.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from pipeline_etl_website_visits_spark.operators.dedup import append_to_gram_index

DOCS_SCHEMA = "doc_id long, text string"
EMB_SCHEMA = "vec_id long, embedding array<float>"


def stream_key_prefix(checkpoint_dir: str) -> str:
    """Ledger key namespace for one stream lineage: derived from the
    checkpoint location, because ``batch_id`` is only unique within one
    checkpoint. New checkpoint → new namespace → a replayed batch id 0
    from a DIFFERENT lineage can never match an old marker."""
    return "s" + hashlib.md5(checkpoint_dir.encode()).hexdigest()[:10]


def read_docs_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 1,
    schema: str = DOCS_SCHEMA,
) -> DataFrame:
    """File-source stream of parquet drops (one file ≈ one crawl/embed
    shard); explicit schema — a streaming source cannot infer. Shared by
    the gram-index and vector-index sinks (``schema=EMB_SCHEMA``)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def index_ingest_batch(
    table: str,
    n: int = 3,
    dedup_threshold: float | None = None,
    key_prefix: str = "stream",
    quality_threshold_millis: int | None = None,
    dsir_weights_path: str | None = None,
    dsir_min_score_micro: int = 0,
):
    """The ``foreachBatch`` sink: append the micro-batch's grams under
    the ``<key_prefix>_b<batch_id>`` applied key. Exposed separately so
    tests can replay a batch id directly (simulating post-crash
    re-execution) — pass the SAME ``key_prefix`` the stream used
    (:func:`stream_key_prefix` of its checkpoint dir).

    ``quality_threshold_millis`` applies the certified quality kernel
    (``text.quality_score_millis`` — the same integer score x28/x154
    certify) as a map-only filter BEFORE anything else touches the
    batch, so low-quality documents never pay shingling or index writes
    — the streaming twin of ``curate_corpus``'s quality gate, with the
    fixed-threshold form a stream needs (per-source quantiles are a
    corpus-level decision; a micro-batch is not a corpus sample).

    ``dsir_weights_path`` applies the FROZEN-weights DSIR domain gate
    (``text.save_dsir_weights`` / ``dsir_scores_vs_weights`` — weights
    trained offline, so per-batch scoring is one hash pass + a broadcast
    lookup, no profile computation): documents scoring below
    ``dsir_min_score_micro`` never enter the index. Docs too short to
    have bigrams carry no domain evidence and pass the gate.

    ``dedup_threshold`` turns on the real production semantic —
    dedup-then-ingest: exact intra-batch duplicates collapse first
    (``dedup_exact`` keep-set — a shard containing a doc twice
    contributes it once), then the batch is scored against the CURRENT
    index (``containment_dedup_vs_stored``) and only documents below the
    containment threshold enter it, so re-crawled duplicates never bloat
    the index or vote in later decisions. Scope note: NEAR-duplicates
    that first meet inside one micro-batch are not cross-scored against
    each other — that is the batch pipeline's corpus-level dedup job
    (x86); the gate's contract is batch-vs-index plus exact-within-batch.

    The batch is persisted across the gate's two consumers (decision +
    append) so the normalize/shingle pass — the dominant per-batch cost —
    runs once, and the decision is materialized (``localCheckpoint``)
    before the insert so the append's plan never carries a live scan of
    the table it writes (a fused read+write of one table races the
    decision against the files the write is landing — observed dropping
    novel docs as self-duplicates mid-batch).

    Replay convergence with the gate on: a replay whose first run
    already recorded the marker no-ops outright; a replay into the
    crash window (insert committed, marker not yet) re-runs the decision
    against the post-insert index, where every already-inserted doc is a
    perfect duplicate OF ITSELF — dropped, so the re-append inserts
    nothing and the marker lands. Either way the state converges to the
    batch present exactly once. WITHOUT the gate, that crash window
    re-appends (the batch append's own documented contract).
    """
    from pipeline_etl_website_visits_spark.operators.dedup import (
        containment_dedup_vs_stored,
        dedup_exact,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        applied_key = f"{key_prefix}_b{batch_id}"
        if quality_threshold_millis is not None:
            from pipeline_etl_website_visits_spark.operators.text import quality_score_millis

            batch_df = batch_df.where(
                quality_score_millis(F.col("text")) >= quality_threshold_millis
            )
        if dsir_weights_path is not None:
            from pipeline_etl_website_visits_spark.operators.text import (
                dsir_scores_vs_weights,
            )

            low = (
                dsir_scores_vs_weights(batch_df, dsir_weights_path, "text", "doc_id")
                .where(F.col("score_micro") < dsir_min_score_micro)
                .select("doc_id")
            )
            batch_df = batch_df.join(low, "doc_id", "left_anti")
        if dedup_threshold is None:
            append_to_gram_index(
                batch_df, table, "text", "doc_id", n=n, applied_key=applied_key
            )
            return
        spark = batch_df.sparkSession
        # intra-batch exact dedup, both flavors: dropDuplicates collapses
        # re-delivered IDENTICAL rows (same id — a semi-join alone would
        # keep every copy), dedup_exact's keep-set collapses same-content
        # rows under DIFFERENT ids (the re-crawl case)
        batch_df = batch_df.dropDuplicates(["doc_id"]).persist()
        uniq = None
        try:
            keepers = dedup_exact(batch_df, "text", "doc_id").select(
                F.col("keeper_doc_id").alias("doc_id")
            )
            uniq = batch_df.join(keepers, "doc_id", "left_semi").persist()
            decisions = containment_dedup_vs_stored(
                uniq,
                spark.table(table),
                "text",
                "doc_id",
                n=n,
                threshold=dedup_threshold,
            )
            dropped = (
                decisions.filter("dropped")
                .select("doc_id")
                .localCheckpoint(eager=True)
            )
            append_to_gram_index(
                uniq.join(dropped, "doc_id", "left_anti"),
                table,
                "text",
                "doc_id",
                n=n,
                applied_key=applied_key,
            )
        finally:
            batch_df.unpersist()
            if uniq is not None:
                uniq.unpersist()

    return sink


def start_index_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    table: str,
    checkpoint_dir: str,
    n: int = 3,
    max_files_per_trigger: int = 1,
    dedup_threshold: float | None = None,
    quality_threshold_millis: int | None = None,
    dsir_weights_path: str | None = None,
    dsir_min_score_micro: int = 0,
):
    """Drain available document files into the stored gram index
    (``Trigger.AvailableNow`` — the bounded-backlog drain used across
    this repo's streaming surface). ``dedup_threshold`` enables the
    dedup-then-ingest gate (see :func:`index_ingest_batch`).

    Micro-batches run in a CLONED session; its appends refresh the
    clone's relation cache, but the DRIVING session may hold a stale
    pre-stream file listing for the table (per-session caches — a read
    before the stream pins the old file list and would silently miss
    every streamed gram afterwards). The sink therefore also refreshes
    the driving session's view after each batch; foreachBatch sinks run
    on the driver, so touching the captured session is safe.
    """
    docs = read_docs_stream(spark, input_dir, max_files_per_trigger)
    inner = index_ingest_batch(
        table,
        n=n,
        dedup_threshold=dedup_threshold,
        key_prefix=stream_key_prefix(checkpoint_dir),
        quality_threshold_millis=quality_threshold_millis,
        dsir_weights_path=dsir_weights_path,
        dsir_min_score_micro=dsir_min_score_micro,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        inner(batch_df, batch_id)
        spark.catalog.refreshTable(table)

    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_vector_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    index_kind: str = "ivfpq",
):
    """The vector-index twin of :func:`start_index_ingest_stream`: new
    embedding files drain into an EXISTING IVF-PQ index
    (``vector_index.append_to_ivfpq_index`` — frozen codebook, map-only
    encode, partitioned parquet append). Same redo composition:
    checkpoint dedupes re-delivered files, the checkpoint-scoped
    per-batch applied key (``<index>/applied`` sidecar ledger) dedupes
    re-executed batches whose marker landed; and ``skip_existing`` is ON
    (round 9) so a replay into the insert→marker crash window anti-joins
    its ids against its own coarse cells (partition-pruned) and
    re-inserts nothing — the stream composes to exactly-once, the same
    convergence the gram path's dedup gate provides. No relation-cache
    concern here — the index is path-based parquet, and path reads list
    files per query.

    ``index_kind`` selects the stored-index family: ``"ivfpq"`` (codes)
    or ``"ivfflat"`` (exact vectors) — both appends share the redo
    ladder, so the stream composition is identical (r12 lifecycle
    parity)."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
        append_to_ivfpq_index,
    )

    append = {"ivfpq": append_to_ivfpq_index, "ivfflat": append_to_ivfflat_index}[
        index_kind
    ]
    prefix = stream_key_prefix(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append(
            batch_df,
            index_path,
            applied_key=f"{prefix}_b{batch_id}",
            skip_existing=True,
        )

    vecs = read_docs_stream(
        spark, input_dir, max_files_per_trigger, schema=EMB_SCHEMA
    )
    return (
        vecs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_vector_search_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    nprobe: int = 2,
    max_files_per_trigger: int = 1,
):
    """The SERVING half of the stored-index story: query-vector files
    drain through ``ivfpq_search`` against the stored codes (pruned
    cells, no re-encode — the same plan the batch search certifies) and
    each micro-batch's ``(query_id, id, adc_dist)`` top-k lands in
    ``output_dir`` under its own ``batch_id=`` partition.

    Exactly-once WITHOUT a ledger: search is a deterministic pure read,
    so a replayed batch recomputes bit-identical rows, and the sink
    writes with dynamic partition OVERWRITE — the replay replaces its own
    partition instead of appending a duplicate (the estadisticas/K1
    idempotence protocol; no insert→marker crash window exists because
    nothing here is stateful). Downstream consumers read
    ``output_dir`` as a plain partitioned table.

    Scale: per micro-batch one tiny meta read + a pruned codes scan; the
    query set is driver-collected under ``ivfpq_search``'s documented
    64 MiB guard, which for a micro-batch of queries is the natural
    serving envelope (thousands of queries per trigger, never a corpus).
    """
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        ivfpq_search,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        res = ivfpq_search(
            batch_df.sparkSession,
            index_path,
            batch_df,
            id_col="vec_id",
            vec_col="embedding",
            k=k,
            nprobe=nprobe,
        )
        (
            res.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    queries = read_docs_stream(
        spark, input_dir, max_files_per_trigger, schema=EMB_SCHEMA
    )
    return (
        queries.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
