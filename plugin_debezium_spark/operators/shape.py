"""Row-shaping operators — the reference's Format pipeline
(SURVEY.md §2.3 P1-P6; reference ChangeConsumer.java:215-308).

Everything is select/withColumn over struct columns: pure Catalyst
projections, zero shuffle, fused by whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.models import OP_DELETE
from plugin_debezium_spark.operators.filters import Deleted, is_tombstone


def raw(df: DataFrame) -> DataFrame:
    """P1 RAW — {key, value:<whole envelope>} untouched
    (ChangeConsumer.java:215-223). Non-envelope messages (op='m')
    keep their open-schema body via message_json — the RAW +
    ignoreDdl=false delivery path (ChangeConsumer.java:205-210,
    Message.java:24-36); structured formats never see these rows."""
    envelope = ["op", "ts_ms", "lsn", "before", "after", "source"] + (
        ["transaction"] if "transaction" in df.columns else []
    ) + (["message_json"] if "message_json" in df.columns else [])
    return df.select(F.col("key"), F.struct(*envelope).alias("value"))


def _image(deleted_policy: Deleted = Deleted.ADD_FIELD):
    """DELETE takes the before image, everything else after
    (ChangeConsumer.java:250-260); Deleted.NULL emits an all-null row
    for deletes (enum AbstractDebeziumTask.java:812-817)."""
    img = F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(
        F.col("after")
    )
    if deleted_policy == Deleted.NULL:
        img = F.when(F.col("op") == OP_DELETE, F.lit(None)).otherwise(img)
    return img


def _carried(df: DataFrame) -> list[str]:
    """Envelope columns shaped rows keep carrying (transaction rides
    along when the source provides it — Envelope.java:36-37)."""
    return ["op", "ts_ms", "lsn", "key", "source"] + (
        ["transaction"] if "transaction" in df.columns else []
    )


def inline(
    df: DataFrame, deleted_policy: Deleted = Deleted.ADD_FIELD
) -> DataFrame:
    """P2 INLINE — flatten chosen image to top-level row columns
    (ChangeConsumer.java:225-235)."""
    return df.withColumn("_row", _image(deleted_policy)).select(
        "_row.*", *_carried(df)
    )


def wrap(df: DataFrame, deleted_policy: Deleted = Deleted.ADD_FIELD) -> DataFrame:
    """P3 WRAP — INLINE payload nested under `record`
    (ChangeConsumer.java:237-248)."""
    return df.select(_image(deleted_policy).alias("record"), *_carried(df))


def add_deleted(df: DataFrame, field_name: str = "deleted") -> DataFrame:
    """P4 — boolean deleted column, true for DELETE/TRUNCATE
    (ChangeConsumer.java:262-274)."""
    return df.withColumn(field_name, is_tombstone())


def add_key(df: DataFrame, drop: bool = False) -> DataFrame:
    """P5 — merge primary-key fields into the row, or drop them
    (ChangeConsumer.java:276-280). Key fields win over same-named
    payload fields, like the reference's map merge."""
    if drop:
        return df.drop("key")
    key_fields = df.schema["key"].dataType.fieldNames()
    out = df
    for f in key_fields:
        out = out.withColumn(f, F.coalesce(F.col(f"key.{f}"), F.col(f)) if f in df.columns else F.col(f"key.{f}"))
    return out.drop("key")


def add_metadata(
    df: DataFrame,
    field_name: str = "metadata",
    properties: dict | None = None,
) -> DataFrame:
    """P6 — pack {operation, transaction, source, timestamp, lsn} into
    a metadata struct (ChangeConsumer.java:282-308: the reference emits
    operation + transaction + source + timestamp and merges any open
    stream properties into the same map — ``properties`` is that
    passthrough: extra name → Column/literal entries)."""
    fields = [
        F.col("op").alias("operation"),
        (
            F.col("transaction")
            if "transaction" in df.columns
            else F.lit(None).cast(
                "struct<id:string,total_order:bigint,data_collection_order:bigint>"
            )
        ).alias("transaction"),
        F.col("source").alias("source"),
        F.col("ts_ms").alias("timestamp"),
        F.col("lsn").alias("lsn"),
    ]
    for name, col in (properties or {}).items():
        fields.append((col if isinstance(col, Column) else F.lit(col)).alias(name))
    return df.withColumn(field_name, F.struct(*fields))
