"""Deterministic, scalable dense ID assignment (docIDs and termIDs).

The reference mints docIDs monotonically with free-list reuse
(io/DefaultStructureIndexProvider.java:36-89,114-122); runs must be
reproducible, so we mint IDs as the *global sort rank* of the natural key.
A single-partition ``row_number() over (order by ...)`` would serialize the
whole table through one task, so we use the classic scalable two-pass rank:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the key;
2. count rows per physical partition (tiny collect — one long per partition);
3. mapInPandas adds ``prefix_offset[pid] + local_running_index``.

The result equals the exact global rank for unique keys regardless of where
range boundaries fall, so it is deterministic and identical at any
parallelism level — which the rank-identical BM25 contract requires.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_sorted_rank(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    num_partitions: int | None = None,
    start: int = 0,
    return_count: bool = False,
    return_persisted: bool = False,
) -> DataFrame:
    """Add ``id_col`` = ``start`` + global lexicographic rank of ``key_cols``.

    Keys must be unique (enforced upstream; the doc key (repo,path,commit) and
    the term string both are).

    ``return_count=True`` returns ``(df, n_rows)`` — the total is a free
    byproduct of the per-partition counts pass, so callers that need the
    cardinality (broadcast decisions, stats) skip a whole extra count job.

    ``return_persisted=True`` additionally returns the internally persisted
    range-arranged DataFrame (appended last) so the caller can
    ``unpersist()`` it once the output is materialized — a targeted release
    instead of a session-wide ``clearCache()`` that would also evict
    unrelated caches (live engines' norms, a caller's persisted delta).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    arranged = df.repartitionByRange(num_partitions, *key_cols).sortWithinPartitions(
        *key_cols
    )
    # Persist so the counts job and the id job observe the SAME physical
    # partitioning: repartitionByRange samples boundaries per execution, so
    # without pinning, two runs of the lineage can split ranges differently
    # and the prefix offsets would not match the partitions they were
    # computed for.  (MEMORY_AND_DISK; spills at scale, still one pass.)
    arranged = arranged.persist()
    with_pid = arranged.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        with_pid.schema.fields[:-1] + [StructField(id_col, LongType(), False)]
    )

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cursor = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cursor is None:
                cursor = offsets[int(pdf["__pid"].iloc[0])]
            n = len(pdf)
            out = pdf.drop(columns="__pid")
            out[id_col] = range(cursor, cursor + n)
            cursor += n
            yield out

    out = with_pid.mapInPandas(add_ids, schema=out_schema)
    if return_count and return_persisted:
        return out, acc - start, arranged
    if return_count:
        return out, acc - start
    if return_persisted:
        return out, arranged
    return out
