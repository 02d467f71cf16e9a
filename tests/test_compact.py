"""Compaction + tombstone expiry; driver-contract smoke."""

import pandas as pd
from pyspark.sql import types as T

from plugin_debezium_spark.plans.compact import compact
from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.plans.merge import merge_batch

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_ts_ms", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["repo", "path", "commit", "content", "_lsn", "_ts_ms", "op"],
        )
    )


def test_compact_reduces_files_and_keeps_state(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, n_buckets=2)
    for e in range(3):
        # disjoint key sets per epoch → prior keys survive as separate
        # files, fragmenting the buckets
        merge_batch(
            t,
            _batch(
                spark,
                [
                    ("r", f"p{e}_{i}", "c", f"v{e}", 10 * e + i, 0, "u")
                    for i in range(8)
                ],
            ),
            epoch_id=e,
            last_lsn=10 * e + 7,
        )
    before = t.read().orderBy("path").collect()
    n_files_before = len(t.current().files)
    out = compact(t, min_files_per_bucket=2)
    assert out["compacted_buckets"] > 0
    assert len(t.current().files) < n_files_before
    after = t.read().orderBy("path").collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]
    # offsets/epoch survive compaction (it's not an epoch)
    assert t.current().properties["last_epoch_id"] == 2
    assert t.current().properties["last_lsn"] == 27


def test_compact_expires_old_tombstones(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, n_buckets=2)
    merge_batch(
        t,
        _batch(spark, [("r", "a", "c", "x", 10, 10, "u"),
                       ("r", "b", "c", None, 20, 20, "d")]),
        epoch_id=0,
        last_lsn=20,
        lww_guard=True,
    )
    assert t.read(include_deleted=True).count() == 2
    compact(t, min_files_per_bucket=1, expire_tombstones_below_lsn=100)
    assert t.read(include_deleted=True).count() == 1
    assert t.read().count() == 1


def test_driver_contract_smoke(spark):
    """entry() + a sample of queries() run and return stable schemas
    (the driver's t1 check, kept in-suite so regressions fail fast)."""
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles) <= set(qs)
    for name in ("cdc_final_state", "dedup_exact", "text_token_counts"):
        out = qs[name](spark, "/root/testdata/sf0.001")
        assert out.count() > 0
