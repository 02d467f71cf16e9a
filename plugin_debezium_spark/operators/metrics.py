"""Per-stream counters + per-partition lineage (SURVEY.md §2.5 A1;
north rule: "per-partition lineage/metrics tables").

The reference emits Kestra Counter metrics per stream
(ChangeConsumer.java:48,184-190; AbstractDebeziumTask.java:270-279).
We compute the same counts as one grouped aggregate per micro-batch
and append them to a metrics table keyed by epoch — a tiny write that
rides on the micro-batch's cached input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.routing import SplitTable, stream_name


def stream_counts(df: DataFrame, split: SplitTable = SplitTable.TABLE) -> DataFrame:
    return (
        df.groupBy(stream_name(split).alias("stream"))
        .agg(F.count("*").alias("records_count"))
        .orderBy("stream")
    )


def epoch_lineage(df: DataFrame, epoch_id: int) -> DataFrame:
    """Lineage row per (epoch, op): counts + lsn watermark range —
    enough to audit exactly which slice of the log an epoch applied."""
    repo = F.col("repo") if "repo" in df.columns else F.col("key.repo")
    lsn = F.col("lsn") if "lsn" in df.columns else F.col("_lsn")
    return (
        df.groupBy("op")
        .agg(
            F.count("*").alias("n_events"),
            F.min(lsn).alias("lsn_lo"),
            F.max(lsn).alias("lsn_hi"),
            F.countDistinct(repo).alias("n_repos"),
        )
        .withColumn("epoch_id", F.lit(epoch_id))
    )
