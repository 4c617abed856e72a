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


def index_ingest_batch(table: str, n: int = 3):
    """The ``foreachBatch`` sink: append the micro-batch's grams under a
    batch-derived applied key. Exposed separately so tests can replay a
    batch id directly (simulating post-crash re-execution)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_to_gram_index(
            batch_df,
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
):
    """Drain available document files into the stored gram index
    (``Trigger.AvailableNow`` — the bounded-backlog drain used across
    this repo's streaming surface)."""
    docs = read_docs_stream(spark, input_dir, max_files_per_trigger)
    return (
        docs.writeStream.foreachBatch(index_ingest_batch(table, n=n))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
