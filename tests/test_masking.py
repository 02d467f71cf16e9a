"""Column masking transforms (operators/masking.py) — Debezium's
column.truncate/column.mask/column.mask.hash property family
(reachable in the reference via the properties passthrough,
AbstractDebeziumTask.java:119,361-368)."""

import hashlib

from pyspark.sql import functions as F

from plugin_debezium_spark.operators.masking import (
    hash_mask_columns,
    mask_columns,
    mask_envelope_images,
    truncate_columns,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("a", "secret-value", "python"),
            ("b", "xy", None),
            ("c", None, "go"),
        ],
        "id string, content string, lang string",
    )


def test_truncate_keeps_short_and_null(spark):
    rows = {
        r["id"]: r["content"]
        for r in truncate_columns(_df(spark), {"content": 6}).collect()
    }
    assert rows == {"a": "secret", "b": "xy", "c": None}


def test_mask_fixed_length_null_passthrough(spark):
    rows = {
        r["id"]: (r["content"], r["lang"])
        for r in mask_columns(
            _df(spark), {"content": 4, "lang": 2}
        ).collect()
    }
    assert rows["a"] == ("****", "**")
    assert rows["b"] == ("****", None)
    assert rows["c"] == (None, "**")


def test_hash_mask_is_salted_sha256_hex(spark):
    rows = {
        r["id"]: r["content"]
        for r in hash_mask_columns(
            _df(spark), {"content": "pepper"}
        ).collect()
    }
    assert rows["a"] == hashlib.sha256(b"peppersecret-value").hexdigest()
    assert rows["c"] is None
    # stable pseudonymization: equal plaintexts hash equal
    assert rows["b"] == hashlib.sha256(b"pepperxy").hexdigest()


def test_envelope_images_masked_on_both_sides(spark):
    df = spark.createDataFrame(
        [
            (1, ("old-secret", "py"), ("new-secret", "go")),
            (2, None, ("only-after", None)),
        ],
        "lsn long, before struct<content:string,lang:string>, "
        "after struct<content:string,lang:string>",
    )
    out = {
        r["lsn"]: r
        for r in mask_envelope_images(
            df, truncate={"content": 3}, mask={"lang": 2}
        ).collect()
    }
    assert out[1]["before"]["content"] == "old"
    assert out[1]["after"]["content"] == "new"
    assert out[1]["before"]["lang"] == "**"
    assert out[2]["before"] is None  # NULL image stays NULL
    assert out[2]["after"]["content"] == "onl"
    assert out[2]["after"]["lang"] is None  # NULL field stays NULL


def test_engine_capture_side_masking(spark, tmp_path):
    """EngineConfig.column_truncate/mask/mask_hash apply post-decode,
    pre-merge on the replay path: the lake table never holds the
    plaintext, content_sha256 follows the TRUNCATED content, and a
    transform naming an evolved column (size_bytes, absent in early
    epochs) is ignored until the column exists — Debezium semantics."""
    from plugin_debezium_spark.plans.lake import LakeTable
    from plugin_debezium_spark.sources.genlog import LogSpec, write_log
    from plugin_debezium_spark.streaming.engine import EngineConfig, run
    from tests.golden import golden_final_state, read_log_pandas

    log = str(tmp_path / "log")
    write_log(
        spark,
        log,
        LogSpec(n_events=2_000, n_keys=300, n_snapshot=200, epoch_size=500),
    )
    cfg = EngineConfig(
        log_dir=log,
        table_dir=str(tmp_path / "tbl"),
        max_events_per_batch=500,
        column_truncate={"content": 8},
        column_mask={"lang": 3},
    )
    run(spark, cfg)
    t = LakeTable(spark, cfg.table_dir)
    rows = {
        (r["repo"], r["path"], r["commit"]): r
        for r in t.read().collect()
    }
    g = golden_final_state(read_log_pandas(log))
    assert len(rows) == len(g)
    for rec in g.to_dict("records"):
        row = rows[(rec["repo"], rec["path"], rec["commit"])]
        want = None if rec["content"] is None else rec["content"][:8]
        assert row["content"] == want
        assert row["lang"] == (None if rec["lang"] is None else "***")
        assert row["content_sha256"] == (
            None
            if want is None
            else hashlib.sha256(want.encode()).hexdigest()
        )


def test_ingest_transforms_tolerates_absent_and_refuses_nonstring(spark):
    import pytest

    from plugin_debezium_spark.operators.masking import ingest_transforms

    df = spark.createDataFrame(
        [("a", "text", 7)], "id string, content string, n long"
    )
    # strict=False: evolved-but-absent columns are skipped (Debezium
    # ignores transforms on columns a table lacks)
    out = ingest_transforms(
        df, truncate={"content": 2, "later_col": 4}, strict=False
    ).collect()[0]
    assert out["content"] == "te"
    with pytest.raises(ValueError, match="absent"):
        ingest_transforms(df, truncate={"later_col": 4})
    with pytest.raises(ValueError, match="string columns only"):
        ingest_transforms(df, mask={"n": 4})


def test_engine_masking_refuses_key_columns(spark, tmp_path):
    import pytest

    from plugin_debezium_spark.sources.genlog import LogSpec, write_log
    from plugin_debezium_spark.streaming.engine import EngineConfig, run

    log = str(tmp_path / "log")
    write_log(spark, log, LogSpec(n_events=200, n_keys=50, n_snapshot=50))
    with pytest.raises(ValueError, match="key columns"):
        run(
            spark,
            EngineConfig(
                log_dir=log,
                table_dir=str(tmp_path / "tbl"),
                column_mask={"repo": 4},
            ),
        )


def test_masked_values_never_reach_output(spark):
    df = _df(spark)
    out = hash_mask_columns(
        mask_columns(truncate_columns(df, {"content": 6}), {"lang": 4}),
        {"id": "s"},
    )
    collected = out.collect()
    blob = repr(collected)
    assert "secret-value" not in blob  # truncation removed the tail
    assert "python" not in blob and "go" not in blob
    assert out.filter(F.col("lang").isin("****")).count() == 2
