"""Key-partitioned last-writer-wins MERGE into the lake table
(SURVEY.md §2.6 K1/K3/K4).

Semantics = Iceberg's
    MERGE INTO tgt USING batch ON key
    WHEN MATCHED AND op='d' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND op!='d' THEN INSERT *
expressed as copy-on-write over hash buckets:

1. batch (already one row per key, see operators/dedupe) gets its
   bucket id; the touched-bucket set is a tiny collect (≤ n_buckets).
2. only touched buckets of the target are read (manifest-level file
   pruning — at 100 TB a micro-batch reads a sliver of the table),
3. survivors = target ⟕anti batch-keys; upserts = batch rows op≠'d';
   result = survivors ∪ upserts — one shuffle on the key, and the
   anti-join broadcasts whenever the deduped batch is small (AQE).
4. new bucket files written, snapshot committed atomically with the
   epoch id + offsets (exactly-once: replaying an applied epoch is a
   metadata no-op — the observable the reference tests as "re-run
   returns 0 records", mysql/CaptureTest.java:97-99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plugin_debezium_spark.models import OP_DELETE
from plugin_debezium_spark.plans.evolve import evolve_schema
from plugin_debezium_spark.plans.lake import LakeTable, _cast_to, bucket_expr


def merge_batch(
    table: LakeTable,
    batch_latest: DataFrame,
    epoch_id: int,
    last_lsn: int,
    op_col: str = "op",
) -> dict:
    """Apply one deduped micro-batch. ``batch_latest`` must have one
    row per key: key columns + payload columns + ``op``.

    Returns a small stats dict (for lineage/metrics).
    """
    prev = table.current()
    if prev.properties.get("last_epoch_id", -1) >= epoch_id:
        # idempotent replay: already committed (reference re-run==0)
        return {"skipped": True, "epoch_id": epoch_id}

    key_cols = list(prev.key_cols)
    payload_schema = T.StructType(
        [f for f in batch_latest.schema.fields if f.name != op_col]
    )
    new_schema, changes = evolve_schema(prev.schema(), payload_schema)

    nb = prev.n_buckets
    batch = batch_latest.withColumn("_bucket", bucket_expr(key_cols, nb))
    # Deduped batch is bounded by distinct keys per epoch — the collect
    # is ≤ n_buckets ints regardless of batch size.
    touched = sorted(
        r["_bucket"] for r in batch.select("_bucket").distinct().collect()
    )

    target = table._read_files(prev, prev.files, touched)
    target = _cast_to(target, new_schema)

    upserts = _cast_to(
        batch.filter(F.col(op_col) != OP_DELETE), new_schema
    ).withColumn("_bucket", bucket_expr(key_cols, nb))
    survivors = (
        target.join(batch.select(*key_cols), on=key_cols, how="left_anti")
        .withColumn("_bucket", bucket_expr(key_cols, nb))
    )
    # One shuffle keyed on the bucket so each task writes whole bucket
    # files: without this, partitionBy fans out tasks×buckets tiny
    # files and every later epoch pays the listing/open cost.
    result = survivors.unionByName(upserts).repartition(
        max(len(touched), 1), F.col("_bucket")
    )

    new_files = table.write_bucket_data(result, prev.snapshot_id + 1)
    snap = table.commit(
        new_files,
        replaced_buckets=set(touched),
        schema=new_schema,
        epoch_id=epoch_id,
        properties={"last_lsn": int(last_lsn)},
    )
    return {
        "skipped": False,
        "epoch_id": epoch_id,
        "snapshot_id": snap.snapshot_id,
        "touched_buckets": len(touched),
        "schema_changes": changes,
        "files_written": len(new_files),
        "rows_written": int(sum(f["rows"] for f in new_files)),
    }
