"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N] (single JVM), but every config here is chosen
for the 1000-executor / 100 TB case and merely *also* works locally:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- Arrow execution for all pandas UDF exchange, bounded batch size so posting
  blocks never blow executor memory;
- shuffle partitions sized to cores locally; on a real cluster this is set to
  2-3x total cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "strucmotif-search-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # trade bytes for cycles: persisted RDD blocks + parquet outputs are
        # compressed, shrinking the disk/memory-bandwidth footprint that
        # caps multi-core scaling (CPU scales with cores; one disk doesn't)
        .config("spark.rdd.compress", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
