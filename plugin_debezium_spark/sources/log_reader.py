"""Change-log source: read the WAL dataset, resume past an offset,
plan micro-batch LSN ranges (SURVEY.md §2.1 S1/S3).

Reference behavior being reproduced: the Debezium engine resumes from
the stored offset map (AbstractDebeziumTask.java:528-530, restore
:640-670). Here the offset is a single LSN and "seeking past it" is a
filter on a partition column — Catalyst turns it into partition
pruning, so a resume never rescans applied history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_log(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.parquet(log_dir)


def read_after(spark: SparkSession, log_dir: str, last_lsn: int) -> DataFrame:
    """Everything newer than the checkpoint. ``lsn_bucket`` is the
    partition column; the redundant bucket predicate makes pruning
    explicit even when bucket size isn't known to the optimizer."""
    df = read_log(spark, log_dir)
    return df.filter(F.col("lsn") > F.lit(last_lsn))


def plan_epochs(
    spark: SparkSession, log_dir: str, last_lsn: int, max_events_per_batch: int
) -> list[dict]:
    """Split remaining log into LSN ranges of ~max_events_per_batch.

    Uses the lsn_bucket partition values (directory listing scale, not
    data scale) plus one bounded aggregate — cheap even on a 10^10-row
    log because it reads only the ``lsn`` column of unapplied buckets.
    Returns [{"lo": exclusive, "hi": inclusive, "buckets": [...]}, ...]
    — the bucket list lets the epoch read prune partitions outright.
    """
    remaining = read_after(spark, log_dir, last_lsn)
    # bucket-level stats: tiny result (one row per partition dir)
    stats = (
        remaining.groupBy("lsn_bucket")
        .agg(F.count("*").alias("n"), F.max("lsn").alias("hi"))
        .orderBy("lsn_bucket")
        .collect()
    )
    epochs: list[dict] = []
    lo = last_lsn
    acc = 0
    buckets: list[int] = []
    for row in stats:
        acc += row["n"]
        buckets.append(row["lsn_bucket"])
        if acc >= max_events_per_batch:
            epochs.append({"lo": lo, "hi": row["hi"], "buckets": buckets})
            lo = row["hi"]
            acc = 0
            # epochs close on bucket boundaries (hi = bucket max), so
            # the closed bucket is fully consumed
            buckets = []
    if acc > 0:
        epochs.append({"lo": lo, "hi": stats[-1]["hi"], "buckets": buckets})
    return epochs


def read_range(
    spark: SparkSession,
    log_dir: str,
    lo_exclusive: int,
    hi_inclusive: int,
    buckets: list[int] | None = None,
) -> DataFrame:
    df = read_log(spark, log_dir)
    if buckets is not None:
        # partition pruning: only the named lsn_bucket dirs are listed
        df = df.filter(F.col("lsn_bucket").isin([int(b) for b in buckets]))
    return df.filter(
        (F.col("lsn") > F.lit(lo_exclusive)) & (F.col("lsn") <= F.lit(hi_inclusive))
    )
