"""Training-data pipeline operators — first-class components alongside the
inverted-index engine: deduplication, similarity search, text analysis, and
multimodal column plumbing, all DataFrame-first and shuffle-conscious.
"""

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_headroom: int = 2) -> DataFrame:
    """Widen a NARROW scan before map-heavy per-row work.

    A small parquet input (one file, one row group) scans as a single
    partition, serializing every downstream row expression — tokenize,
    shingle, md5 — onto one core no matter how many the session has.  When
    the input has at least ``min_headroom``x fewer partitions than the
    session's default parallelism, round-robin repartition to the default
    parallelism; otherwise return the input untouched.

    At corpus scale the guard never fires (a 100 TB table scans as
    thousands of splits already, and an extra full-text exchange would be
    exactly the wrong move); it exists for the small-file regime where the
    exchange costs milliseconds and buys core-count speedup.  The
    ``df.rdd`` probe compiles the physical plan once per operator call —
    milliseconds, paid only in the batch path (streaming inputs pass
    through untouched: no .rdd on unbounded plans, and a streaming source
    is already micro-batch-partitioned by the trigger).
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_headroom <= target:
        return df.repartition(target)
    return df
