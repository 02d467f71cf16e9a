"""CDC-delta-driven incremental curation (jobs/curate_incremental.py):
per-increment gating/dedup against persisted state, curated-table
convergence, monotone content-seen semantics, and crash idempotence."""

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.curate_incremental import _read_ptr, _write_ptr, curate_increment  # noqa: E402
from plugin_debezium_spark.plans.lake import LakeTable  # noqa: E402
from plugin_debezium_spark.plans.merge import merge_batch  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_ts_ms", T.LongType(), True),
    ]
)

GOOD_A = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the fence and the birds sing in the old oak tree"
)
GOOD_D = (
    "database replication change data capture snapshots offsets and "
    "exactly once delivery semantics for very large ingest pipelines"
)
GOOD_F = (
    "sequence packing quotas and mixing weights for training corpora "
    "assembled from many heterogeneous document sources at scale"
)
JUNK = "x y"


def _src(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, n_buckets=4
    )


_LSN = [0]


def _batch(spark, rows):
    """Rows are (repo, path, commit, content, op); unique _lsn/_ts_ms
    audit columns are minted here (table_diff compares versions by
    _lsn, like engine-written tables)."""
    full = []
    for r in rows:
        _LSN[0] += 1
        full.append(r[:4] + (_LSN[0], _LSN[0], r[4]))
    return spark.createDataFrame(
        pd.DataFrame(
            full,
            columns=["repo", "path", "commit", "content",
                     "_lsn", "_ts_ms", "op"],
        )
    )


def _curated_paths(spark, state):
    t = LakeTable(spark, os.path.join(state, "curated"))
    return {r["path"] for r in t.read().select("path").collect()}


KW = dict(min_words=3, max_rep_frac=0.9, lsh_perms=8, lsh_bands=2)


def test_two_increments_end_to_end(spark, tmp_path):
    src = _src(spark, tmp_path)
    state = str(tmp_path / "state")

    # epoch 0: A good, B near-dup of A, C junk, D good
    merge_batch(
        src,
        _batch(
            spark,
            [
                ("r", "A", "c1", GOOD_A, "c"),
                ("r", "B", "c1", GOOD_A.replace("lazy", "sleepy"), "c"),
                ("r", "C", "c1", JUNK, "c"),
                ("r", "D", "c1", GOOD_D, "c"),
            ],
        ),
        epoch_id=0,
        last_lsn=4,
    )
    s1 = curate_increment(spark, src, state, **KW)
    assert s1["candidates"] == 4
    assert s1["after_quality"] == 3          # C fails the gate
    assert s1["survivors"] == 2              # B is a near-dup of A
    assert _curated_paths(spark, state) == {"A", "D"}

    # epoch 1: E exact dup of D, F novel good, A updated to junk,
    # D deleted, G near-dup of the (now deleted) D content
    merge_batch(
        src,
        _batch(
            spark,
            [
                ("r", "E", "c1", GOOD_D, "c"),
                ("r", "F", "c1", GOOD_F, "c"),
                ("r", "A", "c1", JUNK, "u"),
                ("r", "D", "c1", None, "d"),
                ("r", "G", "c1", GOOD_D.replace("large", "big"), "c"),
            ],
        ),
        epoch_id=1,
        last_lsn=9,
    )
    s2 = curate_increment(spark, src, state, **KW)
    assert s2["after_exact"] <= s2["after_quality"] - 1  # E dropped vs state
    # G flagged against the monotone index even though D was deleted
    assert s2["survivors"] == 1  # only F
    assert _curated_paths(spark, state) == {"F"}

    # idempotence: same pointer → no-op
    assert curate_increment(spark, src, state, **KW)["skipped"] is True


def test_crash_replay_converges(spark, tmp_path):
    """Rolling the pointer back (simulating a crash before the swap)
    and re-running the increment reaches the same final state: the
    curated epoch guard skips, state subdirs overwrite themselves."""
    src = _src(spark, tmp_path)
    state = str(tmp_path / "state")
    merge_batch(
        src,
        _batch(spark, [("r", "A", "c1", GOOD_A, "c"),
                       ("r", "D", "c1", GOOD_D, "c")]),
        epoch_id=0,
        last_lsn=2,
    )
    s1 = curate_increment(spark, src, state, **KW)
    ptr = _read_ptr(state)
    curated_snap = LakeTable(
        spark, os.path.join(state, "curated")
    ).current().snapshot_id
    hashes_before = sorted(
        r[0]
        for r in spark.read.parquet(
            os.path.join(state, "hashes")
        ).select("text_sha256").collect()
    )

    _write_ptr(state, 0)  # crash happened before the pointer swap
    s2 = curate_increment(spark, src, state, **KW)
    assert s2["curated_skipped"] is True  # epoch guard absorbed replay
    assert _read_ptr(state) == ptr
    assert (
        LakeTable(spark, os.path.join(state, "curated")).current().snapshot_id
        == curated_snap
    )
    hashes_after = sorted(
        r[0]
        for r in spark.read.parquet(
            os.path.join(state, "hashes")
        ).select("text_sha256").collect()
    )
    assert hashes_after == hashes_before  # overwrite, never duplicate
    assert _curated_paths(spark, state) == {"A", "D"}


def test_insert_only_matches_single_shot(spark, tmp_path):
    """On an insert-only workload whose duplicates point backward
    (later batches duplicate earlier survivors), N increments produce
    the same curated set as one increment over everything."""
    rows1 = [("r", "A", "c1", GOOD_A, "c"), ("r", "D", "c1", GOOD_D, "c")]
    rows2 = [
        ("r", "F", "c1", GOOD_F, "c"),
        ("r", "X", "c1", GOOD_A, "c"),                      # exact dup of A
        # near-dup of F: a LAST-word edit touches only 1 of 16
        # shingles, so both LSH bands collide deterministically here
        ("r", "Y", "c1", GOOD_F.replace("scale", "bulk"), "c"),
    ]

    src_a = _src(spark, tmp_path / "a")
    state_a = str(tmp_path / "a" / "state")
    merge_batch(src_a, _batch(spark, rows1), epoch_id=0, last_lsn=2)
    curate_increment(spark, src_a, state_a, **KW)
    merge_batch(src_a, _batch(spark, rows2), epoch_id=1, last_lsn=5)
    curate_increment(spark, src_a, state_a, **KW)

    src_b = _src(spark, tmp_path / "b")
    state_b = str(tmp_path / "b" / "state")
    merge_batch(src_b, _batch(spark, rows1 + rows2), epoch_id=0, last_lsn=5)
    curate_increment(spark, src_b, state_b, **KW)

    assert _curated_paths(spark, state_a) == _curated_paths(spark, state_b)
    assert _curated_paths(spark, state_a) == {"A", "D", "F"}


def test_touch_update_does_not_evict_own_doc(spark, tmp_path):
    """A source UPDATE that re-presents a doc's own curated content
    (identical, or near-identical under LSH) is a survivor/no-op, not
    a duplicate: the content-keyed state must not tombstone the doc
    out of the curated table (r6 advice). True duplicates under a
    DIFFERENT doc identity still evict."""
    src = _src(spark, tmp_path)
    state = str(tmp_path / "state")
    merge_batch(
        src,
        _batch(spark, [("r", "A", "c1", GOOD_A, "c"),
                       ("r", "D", "c1", GOOD_D, "c")]),
        epoch_id=0,
        last_lsn=2,
    )
    curate_increment(spark, src, state, **KW)
    assert _curated_paths(spark, state) == {"A", "D"}

    # epoch 1: A touch-updated with IDENTICAL content (exact
    # self-match), D updated with a last-word edit (both LSH bands
    # still collide with D's own index rows — near-dup self-match),
    # E a true exact dup of A under a different identity
    merge_batch(
        src,
        _batch(spark, [
            ("r", "A", "c1", GOOD_A, "u"),
            ("r", "D", "c1", GOOD_D.replace("pipelines", "flows"), "u"),
            ("r", "E", "c1", GOOD_A, "c"),
        ]),
        epoch_id=1,
        last_lsn=5,
    )
    s2 = curate_increment(spark, src, state, **KW)
    assert s2["survivors"] == 2          # A and D survive their updates
    assert _curated_paths(spark, state) == {"A", "D"}  # E evicted
    # the curated D carries the NEW content
    d = (
        LakeTable(spark, os.path.join(state, "curated"))
        .read().filter("path = 'D'").select("content").collect()[0][0]
    )
    assert "flows" in d
    # the monotone state stayed a SET: re-presented (sha, _did) pairs
    # were not appended twice
    h = spark.read.parquet(os.path.join(state, "hashes")).select(
        "text_sha256", "_did"
    )
    assert h.count() == h.distinct().count()
