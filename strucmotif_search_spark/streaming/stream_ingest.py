"""Structured Streaming ingest — micro-batch ADD over a document stream.

The reference's closest mechanism is the commit-interval chunk loop
(StrucmotifUpdate.java:195-221, StrucmotifConfig.java:92 — 200k docs per
commit): process a bounded chunk, commit the index, repeat.  In Spark that
protocol IS `foreachBatch`: each micro-batch is one commit interval, and
``add_documents`` gives every batch snapshot-atomic publication with
O(delta) posting rewrites.  Late/changed documents are handled exactly like
the reference handles re-adds: REMOVE + ADD (StrucmotifUpdate.java:157-161).

Two entry points:

- :func:`ingest_stream` — readStream from a directory of parquet/json files
  in the input_hint shape, ``foreachBatch`` -> incremental ADD,
  ``Trigger.AvailableNow`` for catch-up-then-stop or processingTime for
  continuous tailing.  Checkpointing is Spark's own (source offsets) plus
  the engine's lineage WAL (index-side idempotence: re-ADD of an already
  known doc is a no-op by the delta-plus anti-join).
- :func:`windowed_event_counts` — a watermarked tumbling-window aggregation
  over an event stream (the generic streaming-agg capability: readStream ->
  withWatermark -> window -> agg) used by tests to pin down the engine's
  late-data semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..build.index_store import IndexStore
from ..corpus import CORPUS_SCHEMA
from .incremental import add_documents


def ingest_stream(
    spark: SparkSession,
    store: IndexStore,
    source_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Stream documents from ``source_dir`` into the index, one incremental
    ADD (snapshot commit) per micro-batch."""
    stream = (
        spark.readStream.format(fmt)
        .schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(source_dir)
    )

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        gen = add_documents(spark, store, batch_df)
        store.log(gen=gen, stage="stream_batch", status="done", batch_id=batch_id)

    writer = stream.writeStream.foreachBatch(_commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type over a (streaming or
    batch) events table with columns (ts timestamp, event_type string,
    value double).  Works identically under readStream (late rows beyond the
    watermark are dropped; in-window state is bounded) and in batch mode
    (used by the oracle comparison)."""
    # watermarks require TIMESTAMP (with zone); parquet NTZ columns are cast
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
