"""Stream routing (SURVEY.md §2.4 R1) — the reference's splitTable
fan-out (ChangeConsumer.java:147-193, enum AbstractDebeziumTask.java:
819-823): route events to one stream per TABLE (`db.table`), per
DATABASE (`db`), or a single `data` stream (OFF).

Spark-first: routing is a derived column + partitioned write (or a
grouped count) — never a driver-side loop over streams.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SplitTable(str, Enum):
    TABLE = "TABLE"
    DATABASE = "DATABASE"
    OFF = "OFF"


def stream_name(split: SplitTable = SplitTable.TABLE):
    if split == SplitTable.TABLE:
        return F.concat_ws(".", F.col("source.db"), F.col("source.table"))
    if split == SplitTable.DATABASE:
        return F.col("source.db")
    return F.lit("data")


def route(df: DataFrame, split: SplitTable = SplitTable.TABLE) -> DataFrame:
    return df.withColumn("stream", stream_name(split))


def write_streams(
    df: DataFrame, out_dir: str, split: SplitTable = SplitTable.TABLE
) -> None:
    """One output per stream = one partition directory (the reference
    writes one Ion file per stream, ChangeConsumer.java:162-193; at
    lake scale a stream is a directory, not a file)."""
    route(df, split).write.mode("overwrite").partitionBy("stream").parquet(out_dir)
