"""Streaming exact deduplication.

Two shapes of the same operator, mirroring the batch ``operators/dedup``:

1. :func:`exact_dedup_stream` — the BUILT-IN path: digest the content and
   ``dropDuplicatesWithinWatermark`` on the digest.  Catalyst's streaming
   dedup operator keeps one state-store entry per digest and EVICTS entries
   once the watermark passes (bounded state), which is exactly the
   "dedup a firehose within a horizon" contract an ingestion pipeline needs.
   Built-ins first: no custom state code.

2. :func:`canonical_map_stream` — the CUSTOM STATEFUL path when the job
   needs the batch operator's full output (every doc mapped to the
   canonical first-seen doc_id, not just survivors): per-digest state holds
   the canonical id; every event emits ``(doc_id, canonical_id, digest,
   is_first)``.  State is one int64 per distinct digest — the streaming
   twin of exact_dedup's groupBy(min), with first-seen (arrival order)
   replacing min(doc_id), which is the only total order an unbounded
   stream can honor.

Scale notes: state is keyed by a fixed-width 128-bit digest (uniformly
distributed — no skew), hash-partitioned by the state store; the text never
enters state.  The watermark horizon bounds variant 1's state exactly;
variant 2's state grows with DISTINCT content (the same footprint the batch
digest aggregation shuffles), evictable by restarting per corpus epoch.

Reference analogue: the update path's "known" ledger check that skips
already-indexed identifiers on ADD (update/StrucmotifUpdate.java:191-245,
io/DefaultStateRepository.java:41-61) is this operator's single-node form.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CANON_SCHEMA = StructType(
    [
        StructField("digest", StringType()),
        StructField("doc_id", LongType()),
        StructField("canonical_id", LongType()),
        StructField("is_first", BooleanType()),
    ]
)

_CANON_STATE = StructType([StructField("canonical_id", LongType())])


def exact_dedup_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """First-seen survivors of a streaming corpus, deduped by content digest
    within the watermark horizon.  Output: the input rows plus ``digest``,
    one row per distinct content per horizon."""
    keyed = docs.withColumn("digest", F.md5(F.col(text_col))).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["digest"]
    )


def _canon_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (canon,) = state.get
    else:
        canon = None
    # the group arrives as an ITERATOR of Arrow chunks — gather all chunks
    # before sorting, or the documented doc_id-ascending tie-break would
    # only hold within each chunk (groups larger than
    # arrow.maxRecordsPerBatch would pick the first chunk's min)
    doc_ids = sorted(
        int(d) for pdf in pdfs for d in pdf["doc_id"].tolist()
    )
    out = []
    for doc_id in doc_ids:
        first = canon is None
        if first:
            canon = doc_id
        out.append((key[0], doc_id, canon, first))
    state.update((canon,))
    yield pd.DataFrame(
        out, columns=["digest", "doc_id", "canonical_id", "is_first"]
    )


def canonical_map_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming (doc_id -> canonical_id) mapping keyed by content digest:
    the streaming twin of ``operators/dedup.exact_dedup``, canonical =
    first seen (doc_id-ascending within a micro-batch)."""
    keyed = docs.select(
        F.md5(F.col(text_col)).alias("digest"), F.col("doc_id")
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        _canon_fn,
        outputStructType=CANON_SCHEMA,
        stateStructType=_CANON_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
