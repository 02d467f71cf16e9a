"""Filter operators (SURVEY.md §2.2 F1-F4).

All are plain Column predicates so Catalyst pushes them into the
parquet scan (check: ``PushedFilters`` in .explain) — the Spark
analogue of the reference pushing include/exclude lists into the
database connector (AbstractDebeziumTask.java:567-589).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.models import DATA_OPS, OP_DELETE, OP_TRUNCATE


class Deleted(str, Enum):
    """Reference enum AbstractDebeziumTask.java:812-817."""

    ADD_FIELD = "ADD_FIELD"
    NULL = "NULL"
    DROP = "DROP"


def include_exclude(
    df: DataFrame,
    db_include: str | None = None,
    db_exclude: str | None = None,
    table_include: str | None = None,
    table_exclude: str | None = None,
) -> DataFrame:
    """F1 — regex include/exclude on source db/table
    (reference: AbstractDebeziumInterface.java:108-148)."""
    for col, inc, exc in (
        ("source.db", db_include, db_exclude),
        ("source.table", table_include, table_exclude),
    ):
        if inc:
            df = df.filter(F.col(col).rlike(inc))
        if exc:
            df = df.filter(~F.col(col).rlike(exc))
    return df


def drop_ddl(df: DataFrame, ignore_ddl: bool = True) -> DataFrame:
    """F2 — drop non-envelope (schema-change) events; default true
    (reference: ChangeConsumer.java:196-199)."""
    if ignore_ddl:
        df = df.filter(F.col("op").isin(*DATA_OPS))
    return df


def apply_deleted_policy(df: DataFrame, policy: Deleted) -> DataFrame:
    """F3 — DROP removes delete events entirely
    (reference: ChangeConsumer.java:200-202); NULL/ADD_FIELD handled
    downstream in shaping."""
    if policy == Deleted.DROP:
        df = df.filter(F.col("op") != OP_DELETE)
    return df


def column_projection(df: DataFrame, columns: list[str]) -> DataFrame:
    """F1 (column lists) — projection instead of connector-side column
    exclusion; Catalyst prunes the parquet ReadSchema."""
    return df.select(*columns)


def column_include_exclude(
    df: DataFrame,
    include: str | None = None,
    exclude: str | None = None,
) -> DataFrame:
    """F1 regex form — column.include/exclude.list semantics
    (AbstractDebeziumTask.java:567-589): project the columns whose
    names match the include regex (all, when absent) minus those
    matching exclude. Resolved at plan time, so the scan still prunes."""
    import re

    cols = df.columns
    if include:
        inc = re.compile(include)
        cols = [c for c in cols if inc.fullmatch(c)]
    if exclude:
        exc = re.compile(exclude)
        cols = [c for c in cols if not exc.fullmatch(c)]
    return df.select(*cols)


def is_tombstone(col="op"):
    return F.col(col).isin(OP_DELETE, OP_TRUNCATE)
