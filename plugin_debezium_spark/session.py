"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the same config block is what we'd
ship in ``spark-submit --py-files`` on a multi-executor cluster — AQE,
Arrow, skew-join handling and UTC timezone are cluster-size agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "plugin_debezium_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` only matters in local mode; on a real cluster the master
    URL comes from spark-submit and this becomes a no-op. Shuffle
    partitions default to the core count locally — at 100 TB you'd set
    this to ~2-3x total executor cores (or rely on AQE coalescing from
    a higher initial value, which we enable).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_MASTER", f"local[{cores}]")
        )
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # local mode = one JVM for everything; heap must scale with
        # concurrent tasks (floor 16g, 1g/core above that): N columnar
        # cache-building tasks each hold ColumnBuilder buffers OUTSIDE
        # the managed memory region, and a 64M-event soak at 32 threads
        # OOMed a 16g heap in exactly that path. On a cluster this is
        # ordinary per-executor memory sizing.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", f"{max(16, cores)}g"),
        )
        # fat rows (~1.5 KB envelopes): the default 10k-row columnar
        # cache batch is ~15 MB per builder per task — cap it so
        # transient builder memory stays bounded at high parallelism
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
