"""Shaping operators P1-P6 (reference ChangeConsumer.java:215-308;
delete-takes-before per :250-260; Mongo deleted-flag counts per
mongodb/CaptureTest.java:39-80)."""

import pandas as pd
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.filters import Deleted
from plugin_debezium_spark.operators.shape import (
    add_deleted,
    add_key,
    add_metadata,
    inline,
    raw,
    wrap,
)


def _env(spark):
    pdf = pd.DataFrame(
        {
            "lsn": [1, 2, 3],
            "ts_ms": [10, 20, 30],
            "op": ["c", "u", "d"],
            "key": [
                {"repo": "r", "path": "p1", "commit": "k1"},
                {"repo": "r", "path": "p2", "commit": "k2"},
                {"repo": "r", "path": "p3", "commit": "k3"},
            ],
            "before": [
                None,
                {"repo": "r", "path": "p2", "commit": "k2", "content": "old2"},
                {"repo": "r", "path": "p3", "commit": "k3", "content": "old3"},
            ],
            "after": [
                {"repo": "r", "path": "p1", "commit": "k1", "content": "new1"},
                {"repo": "r", "path": "p2", "commit": "k2", "content": "new2"},
                None,
            ],
            "source": [
                {"db": "d", "table": "t", "snapshot": "false", "connector": "x"}
            ]
            * 3,
        }
    )
    return spark.createDataFrame(pdf)


def test_inline_delete_takes_before(spark):
    out = inline(_env(spark)).select("op", "content").collect()
    got = {r["op"]: r["content"] for r in out}
    assert got == {"c": "new1", "u": "new2", "d": "old3"}


def test_inline_null_policy(spark):
    out = inline(_env(spark), Deleted.NULL).select("op", "content").collect()
    got = {r["op"]: r["content"] for r in out}
    assert got["d"] is None and got["c"] == "new1"


def test_wrap_nests_record(spark):
    out = wrap(_env(spark)).select("op", "record.content").collect()
    got = {r["op"]: r["content"] for r in out}
    assert got["d"] == "old3" and got["u"] == "new2"


def test_raw_keeps_envelope(spark):
    out = raw(_env(spark)).select("key", "value.op", "value.after").collect()
    assert len(out) == 3
    assert {r["op"] for r in out} == {"c", "u", "d"}


def test_add_deleted_counts(spark):
    out = add_deleted(_env(spark)).groupBy("deleted").count().collect()
    got = {r["deleted"]: r["count"] for r in out}
    assert got == {True: 1, False: 2}


def test_add_key_merges_and_drops(spark):
    flat = inline(_env(spark), Deleted.NULL)
    out = add_key(flat)
    assert "key" not in out.columns
    rows = {r["path"]: r for r in out.collect()}
    # delete row had null image -> key fields still populated from key
    assert rows["p3"]["commit"] == "k3"


def test_add_metadata(spark):
    out = add_metadata(_env(spark)).select(
        "metadata.operation", "metadata.timestamp"
    ).collect()
    assert {(r[0], r[1]) for r in out} == {("c", 10), ("u", 20), ("d", 30)}


def _env_with_truncate(spark):
    pdf = pd.DataFrame(
        {
            "lsn": [1, 2],
            "ts_ms": [10, 20],
            "op": ["c", "t"],
            "key": [
                {"repo": "r", "path": "p1", "commit": "k1"},
                {"repo": None, "path": None, "commit": None},
            ],
            "before": [None, None],
            "after": [
                {"repo": "r", "path": "p1", "commit": "k1", "content": "new1"},
                None,
            ],
            "source": [
                {"db": "d", "table": "t", "snapshot": "false", "connector": "x"}
            ]
            * 2,
        }
    )
    return spark.createDataFrame(pdf)


def test_truncate_flows_through_inline_with_deleted_flag(spark):
    """TRUNCATE envelopes are delivered (not dropped as DDL) and carry
    deleted=true (ChangeConsumer.java:262-274)."""
    from plugin_debezium_spark.operators.filters import drop_ddl

    shaped = add_deleted(inline(drop_ddl(_env_with_truncate(spark))))
    got = {r["op"]: r["deleted"] for r in shaped.collect()}
    assert got == {"c": False, "t": True}


def test_add_metadata_transaction_block(spark):
    """P6 carries the transaction block when the envelope has one
    (Envelope.java:36-37, ChangeConsumer.java:295) and open
    properties merge into the same struct."""
    env = _env(spark).withColumn(
        "transaction",
        F.struct(
            F.concat(F.lit("tx"), F.col("lsn")).alias("id"),
            F.col("lsn").cast("long").alias("total_order"),
            F.col("lsn").cast("long").alias("data_collection_order"),
        ),
    )
    out = add_metadata(env, properties={"tag": "s1"}).select("metadata").collect()
    m = {r["metadata"]["transaction"]["id"]: r["metadata"] for r in out}
    assert set(m) == {"tx1", "tx2", "tx3"}
    assert all(v["tag"] == "s1" for v in m.values())
    assert m["tx2"]["transaction"]["total_order"] == 2


def test_add_metadata_without_transaction_column_is_null(spark):
    out = add_metadata(_env(spark)).select("metadata.transaction").collect()
    assert all(r["transaction"] is None for r in out)
