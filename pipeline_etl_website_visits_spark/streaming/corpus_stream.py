"""Streaming corpus ingestion into the stored dedup gram index.

The batch half of this story is ``dedup.save_gram_index`` (build once) +
``dedup.append_to_gram_index`` (fold a day's batch in); this module is
the streaming steady state: new document files land in a directory, each
micro-batch's grams are appended to the bucketed index table, and later
``containment_dedup_vs_stored`` calls see them immediately (same catalog
table, bucket-aligned files).

Exactly-once discipline (the K4 / visits_stream contract): the file
source's checkpoint gives at-least-once ``foreachBatch`` invocations
with a STABLE ``batch_id``; the append's ``applied_key`` ledger
(one write-once marker per batch, ``operators/ledger.py``) turns the
replay into a no-op, so a crash between the insert and the checkpoint
commit cannot double-append a batch (double-counted gram intersections
would push containment past 1.0 and flip best-match ties). The two
guards compose: checkpoint dedupes re-delivered FILES, the ledger
dedupes re-executed BATCHES.

Scale: each micro-batch does one shingle pass + a bucket-aligned
``insertInto`` — the index side never rewrites, the batch's grams
shuffle once into the table's bucket layout. At 100 TB the index is the
big side and it is never touched beyond the appended files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipeline_etl_website_visits_spark.operators.dedup import append_to_gram_index

DOCS_SCHEMA = "doc_id long, text string"
EMB_SCHEMA = "vec_id long, embedding array<float>"


def read_docs_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of document parquet drops (one file ≈ one
    crawl shard); explicit schema — a streaming source cannot infer."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def index_ingest_batch(table: str, n: int = 3, dedup_threshold: float | None = None):
    """The ``foreachBatch`` sink: append the micro-batch's grams under a
    batch-derived applied key. Exposed separately so tests can replay a
    batch id directly (simulating post-crash re-execution).

    ``dedup_threshold`` turns on the real production semantic —
    dedup-then-ingest: the batch is scored against the CURRENT index
    (``containment_dedup_vs_stored``) and only documents below the
    containment threshold enter it, so re-crawled duplicates never bloat
    the index or vote in later decisions. The decision and the append
    read the same index table, and the decision is computed BEFORE the
    insert (anti-join on the dropped set), so in a first execution a
    document is never compared against its own grams. Replay safety
    composes without a transaction: a replay whose first run already
    recorded the marker no-ops outright; a replay into the crash window
    (insert committed, marker not yet) re-runs the decision against the
    post-insert index, where every already-inserted doc is a perfect
    duplicate OF ITSELF — dropped, so the re-append inserts nothing and
    the marker lands. Either way the state converges to the batch
    present exactly once.
    """
    from pipeline_etl_website_visits_spark.operators.dedup import (
        containment_dedup_vs_stored,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        to_ingest = batch_df
        if dedup_threshold is not None:
            spark = batch_df.sparkSession
            decisions = containment_dedup_vs_stored(
                batch_df,
                spark.table(table),
                "text",
                "doc_id",
                n=n,
                threshold=dedup_threshold,
            )
            # MATERIALIZE the decision before the insert:
            # localCheckpoint cuts the lineage, so the append's plan
            # cannot carry a live scan of the very table it is inserting
            # into (a fused read+write of one table races the decision
            # against the files the write is landing — observed dropping
            # novel docs as self-duplicates mid-batch). The dropped set
            # is bounded by the batch's doc count.
            dropped = (
                decisions.filter("dropped")
                .select("doc_id")
                .localCheckpoint(eager=True)
            )
            to_ingest = batch_df.join(dropped, "doc_id", "left_anti")
        append_to_gram_index(
            to_ingest,
            table,
            "text",
            "doc_id",
            n=n,
            applied_key=f"stream_b{batch_id}",
        )

    return sink


def start_index_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    table: str,
    checkpoint_dir: str,
    n: int = 3,
    max_files_per_trigger: int = 1,
    dedup_threshold: float | None = None,
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
    inner = index_ingest_batch(table, n=n, dedup_threshold=dedup_threshold)

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
):
    """The vector-index twin of :func:`start_index_ingest_stream`: new
    embedding files drain into an EXISTING IVF-PQ index
    (``vector_index.append_to_ivfpq_index`` — frozen codebook, map-only
    encode, partitioned parquet append). Same exactly-once composition:
    checkpoint dedupes re-delivered files, the per-batch applied key
    (``<index>/applied`` sidecar ledger) dedupes re-executed batches. No
    relation-cache concern here — the index is path-based parquet, and
    path reads list files per query."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_to_ivfpq_index(
            batch_df, index_path, applied_key=f"stream_b{batch_id}"
        )

    vecs = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        vecs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
