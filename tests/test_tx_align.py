"""Transaction-aligned epoch boundaries (EngineConfig.tx_align).

The source contract: Debezium delivers committed transactions
contiguously (Envelope.java:36-37 carries the transaction block), so
each transaction is a contiguous LSN range. tx_align lowers epoch
boundaries so no transaction is split across two commits — every
committed table state is transactionally consistent with the source.

genlog's own transactions (id = lsn // 10) never straddle bucket
boundaries (bucket sizes are multiples of 10), so these tests rewrite
the transaction ids to (lsn + 5) // 10: tx ranges [10n-5, 10n+4]
straddle every multiple-of-1000 epoch boundary.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.sources.genlog import LogSpec, write_log
from plugin_debezium_spark.sources.log_reader import (
    align_epochs_to_transactions,
    plan_epochs,
)
from plugin_debezium_spark.streaming.engine import EngineConfig, run


def _straddling_log(spark, tmp: str, one_tx: bool = False) -> str:
    log0 = write_log(
        spark,
        f"{tmp}/log0",
        LogSpec(n_events=3000, n_keys=400, n_snapshot=0, lsn_buckets=3),
    )
    df = spark.read.parquet(log0)
    tx_id = (
        F.lit("tx_all")
        if one_tx
        else F.concat(
            F.lit("tx"), ((F.col("lsn") + 5) / 10).cast("long").cast("string")
        )
    )
    df = df.withColumn(
        "transaction",
        F.when(
            F.col("transaction").isNotNull(),
            F.struct(
                tx_id.alias("id"),
                F.col("transaction.total_order").alias("total_order"),
                F.col("transaction.data_collection_order").alias(
                    "data_collection_order"
                ),
            ),
        ),
    )
    out = f"{tmp}/log"
    df.write.partitionBy("lsn_bucket").parquet(out)
    return out


def _state(spark, table_dir: str) -> list[tuple]:
    return sorted(
        tuple(r)
        for r in LakeTable(spark, table_dir)
        .read()
        .select("repo", "path", "commit", "content")
        .collect()
    )


def _lww_state(spark, log: str, max_lsn: int) -> list[tuple]:
    env = spark.read.parquet(log).filter(
        (F.col("lsn") <= max_lsn) & (F.col("op") != "t")
    )
    w = Window.partitionBy("key.repo", "key.path", "key.commit").orderBy(
        F.desc("lsn")
    )
    return sorted(
        tuple(r)
        for r in env.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND op <> 'd'")
        .select(
            F.col("key.repo"),
            F.col("key.path"),
            F.col("key.commit"),
            F.get_json_object("after_json", "$.content"),
        )
        .collect()
    )


def test_align_lowers_boundaries_and_carries_buckets(spark, tmp_path):
    log = _straddling_log(spark, str(tmp_path))
    epochs = plan_epochs(spark, log, -1, 1000)
    assert [e["hi"] for e in epochs] == [999, 1999, 2999]
    aligned = align_epochs_to_transactions(spark, log, epochs)
    # tx100 spans [995, 1004], tx200 spans [1995, 2004]
    assert [e["hi"] for e in aligned] == [994, 1994, 2999]
    assert aligned[1]["lo"] == 994
    assert aligned[2]["lo"] == 1994
    # the partially-consumed closing bucket rides into the successor
    assert 0 in aligned[1]["buckets"]
    assert 1 in aligned[2]["buckets"]


def test_tx_align_mid_replay_state_is_tx_consistent(spark, tmp_path):
    log = _straddling_log(spark, str(tmp_path))
    cfg = EngineConfig(
        log_dir=log,
        table_dir=f"{tmp_path}/tbl",
        max_events_per_batch=1000,
        max_batches=1,
        tx_align=True,
    )
    out = run(spark, cfg)
    assert out["batches_applied"] == 1
    tbl = LakeTable(spark, cfg.table_dir)
    assert int(tbl.current().properties["last_lsn"]) == 994
    # the committed state is exactly LWW over the complete transactions
    assert _state(spark, cfg.table_dir) == _lww_state(spark, log, 994)


def test_tx_align_resume_merges_the_empty_epoch(spark, tmp_path):
    """Resuming past an aligned stop re-plans boundaries on the bucket
    edge (999); lowering again would leave the epoch (994, 999] empty,
    so alignment must merge it into its successor and the resumed run
    still applies everything exactly once."""
    log = _straddling_log(spark, str(tmp_path))
    cfg = EngineConfig(
        log_dir=log,
        table_dir=f"{tmp_path}/tbl",
        max_events_per_batch=1000,
        max_batches=1,
        tx_align=True,
    )
    run(spark, cfg)
    epochs = plan_epochs(spark, log, 994, 1000)
    aligned = align_epochs_to_transactions(spark, log, epochs)
    assert aligned[0]["lo"] == 994
    assert aligned[0]["hi"] == 1994  # merged (994,999] + (999,1999]
    assert 0 in aligned[0]["buckets"] and 1 in aligned[0]["buckets"]
    cfg_resume = EngineConfig(
        log_dir=log,
        table_dir=f"{tmp_path}/tbl",
        max_events_per_batch=1000,
        tx_align=True,
    )
    run(spark, cfg_resume)
    tbl = LakeTable(spark, f"{tmp_path}/tbl")
    assert int(tbl.current().properties["last_lsn"]) == 2999
    assert _state(spark, f"{tmp_path}/tbl") == _lww_state(spark, log, 2999)


def test_tx_align_final_state_matches_unaligned(spark, tmp_path):
    log = _straddling_log(spark, str(tmp_path))
    for name, tx_align in (("a", True), ("b", False)):
        run(
            spark,
            EngineConfig(
                log_dir=log,
                table_dir=f"{tmp_path}/{name}",
                max_events_per_batch=1000,
                tx_align=tx_align,
            ),
        )
    assert _state(spark, f"{tmp_path}/a") == _state(spark, f"{tmp_path}/b")


def test_tx_align_whole_log_transaction_collapses_to_one_epoch(
    spark, tmp_path
):
    """A transaction spanning the whole log can only commit atomically
    as ONE epoch: every boundary merges away (no warning — this is the
    correct alignment, not a failure)."""
    log = _straddling_log(spark, str(tmp_path), one_tx=True)
    epochs = plan_epochs(spark, log, -1, 1000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        aligned = align_epochs_to_transactions(spark, log, epochs)
    assert len(aligned) == 1
    assert aligned[0]["lo"] == -1 and aligned[0]["hi"] == 2999
    assert sorted(aligned[0]["buckets"]) == [0, 1, 2]


def test_tx_align_already_split_transaction_warns(spark, tmp_path):
    """A prior commit point MID-transaction (lo=997 inside tx100's
    [995, 1004]) cannot be realigned — the split already happened;
    alignment warns and leaves the boundary."""
    log = _straddling_log(spark, str(tmp_path))
    epochs = plan_epochs(spark, log, 997, 1000)
    assert epochs[0]["lo"] == 997 and epochs[0]["hi"] == 999
    with pytest.warns(UserWarning, match="spans the whole epoch"):
        aligned = align_epochs_to_transactions(spark, log, epochs)
    # the unalignable boundary stays; later boundaries still align
    assert aligned[0]["hi"] == 999
    assert aligned[1]["hi"] == 1994


def test_tx_align_noop_when_no_straddlers(spark, tmp_path):
    """genlog's native transactions never cross bucket boundaries —
    alignment must be an exact no-op (and emit no warnings)."""
    log = write_log(
        spark,
        f"{tmp_path}/log",
        LogSpec(n_events=3000, n_keys=400, n_snapshot=300, lsn_buckets=3),
    )
    epochs = plan_epochs(spark, log, -1, 1000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        aligned = align_epochs_to_transactions(spark, log, epochs)
    assert aligned == epochs
