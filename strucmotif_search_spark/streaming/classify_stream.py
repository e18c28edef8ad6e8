"""Streaming classification — continuous detectMotifs over a document feed.

The reference's second entry point (``detectMotifs``, Strucmotif.java:35-37)
scores ONE new document against every stored motif definition.  An ingestion
pipeline runs that continuously: every arriving document must be classified
against the stored-query library (routing, alerting, labeling) as it lands.

Spark-first shape: readStream over the document feed, ``foreachBatch`` ->
the batch :func:`~strucmotif_search_spark.query.classify.classify_documents`
operator (tokenize -> broadcast library join -> per-(doc, query) aggregate,
scored with the PUBLISHED index's global statistics) -> append matches to a
parquet sink.  Each micro-batch is embarrassingly parallel over its own
rows: the library is a broadcast constant, the engine's idf/avgdl resolve
once driver-side, and NO per-batch state accumulates — unlike the dedup
twins, classification is stateless per document, so the streaming twin is
the batch operator applied per trigger with exactly-once sink semantics
from the checkpoint.

Scale: a 10^12-doc backfill and a live tail run the SAME operator; the only
difference is the trigger (AvailableNow vs processingTime).  State: none.
Skew: none (row-parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..corpus import CORPUS_SCHEMA


def classify_stream(
    spark: SparkSession,
    engine,
    library: dict[str, str],
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    mode: str = "and",
    min_score: float = 0.0,
    available_now: bool = True,
    fmt: str = "parquet",
    doc_id_col: str = "path",
) -> StreamingQuery:
    """Classify a stream of corpus-shaped documents against ``library``
    (query_id -> query string), appending matches
    ``(doc_key, query_id, score, n_matched, batch_id)`` to ``sink_dir``.

    ``doc_id_col``: which corpus column identifies the document in the
    output (the feed's natural key; the stream mints no engine doc_ids —
    classification never touches the index's ledger).
    """
    from ..query.classify import classify_documents

    stream = (
        spark.readStream.format(fmt)
        .schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(source_dir)
    )

    def _classify_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # dense per-batch ids satisfy classify's (doc_id, content) contract;
        # the natural key rides along and is what the sink keeps.  PERSIST:
        # monotonically_increasing_id is nondeterministic per evaluation,
        # and `keyed` is consumed twice (inside classify and on the join's
        # right side) — unpinned, two evaluations could mint different ids
        # and silently mis-key the join
        keyed = batch_df.select(
            F.col(doc_id_col).alias("doc_key"), "content"
        ).withColumn(
            "doc_id", F.monotonically_increasing_id()
        ).persist()
        try:
            scored = classify_documents(
                engine,
                keyed.select("doc_id", "content"),
                library,
                mode=mode,
                min_score=min_score,
            )
            out = (
                scored.join(keyed.select("doc_id", "doc_key"), on="doc_id")
                .select(
                    "doc_key",
                    "query_id",
                    "score",
                    "n_matched",
                    F.lit(batch_id).alias("batch_id"),
                )
            )
            # idempotent per-batch sink: a batch replayed after a crash
            # between sink write and checkpoint commit OVERWRITES its own
            # batch_id partition instead of appending duplicates — this is
            # what makes the checkpoint's at-least-once redelivery
            # exactly-once at the sink
            out.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("batch_id").parquet(sink_dir)
        finally:
            keyed.unpersist()

    writer = stream.writeStream.foreachBatch(_classify_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()
