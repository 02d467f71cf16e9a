"""Incremental changelog OUT of the lake table (Iceberg's
changelog/incremental-scan shape, re-expressed over icelite snapshots).

The engine turns a change stream INTO table state; this closes the
loop: ``table_diff(table, from_id, to_id)`` returns the NET row-level
changes between two retained snapshots as (key, op c/u/d, new row) —
what a downstream consumer needs to follow the table without replaying
the source log (the reference has no analogue; its output IS the
stream. Public pattern: Iceberg create_changelog_view / Delta CDF).

Physical shape: two snapshot reads (each LWW-resolved, tombstones
dropped) + ONE full-outer join on the key columns. The old side is
projected to (key, _lsn) before the join — _lsn is unique per written
row version, so version equality needs no payload compare and the old
snapshot's payload bytes never move. Cost is O(|a| + |b|) with a
key-hash shuffle; at high bucket counts a bucket-pruned variant can
diff bucket-by-bucket, but the join already co-partitions both sides
on the same key hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.plans.lake import LakeTable


def table_diff(
    table: LakeTable,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Net changes from ``from_snapshot_id`` to ``to_snapshot_id``
    (default: current): one row per key whose visible version changed —
    op 'c' (absent→present), 'u' (version changed; _lsn is the
    comparator, unique per written row), 'd' (present→absent, payload
    columns null). Keys untouched between the snapshots are absent.

    Both snapshots must still be retained (expire_snapshots removes
    older read_at targets — diff within the retention window)."""
    to_id = (
        table.current().snapshot_id
        if to_snapshot_id is None
        else to_snapshot_id
    )
    key_cols = list(table.snapshot(to_id).key_cols)
    new = table.read_at(to_id)
    if "_lsn" not in new.columns:
        raise ValueError(
            "table_diff needs the engine's _lsn audit column to compare "
            "row versions"
        )
    old = table.read_at(from_snapshot_id).select(
        *key_cols, F.col("_lsn").alias("_old_lsn")
    )
    j = new.join(old, key_cols, "full_outer")
    op = (
        F.when(F.col("_old_lsn").isNull(), F.lit("c"))
        .when(F.col("_lsn").isNull(), F.lit("d"))
        .when(F.col("_lsn") != F.col("_old_lsn"), F.lit("u"))
    )
    # _deleted is an internal tombstone marker — read_at already
    # filtered tombstones, so it would be a dead always-false/null
    # column in the public changelog shape
    payload = [
        c for c in new.columns if c not in key_cols and c != "_deleted"
    ]
    return (
        j.withColumn("_diff_op", op)
        .filter(F.col("_diff_op").isNotNull())
        .select(*key_cols, F.col("_diff_op").alias("op"), *payload)
    )
