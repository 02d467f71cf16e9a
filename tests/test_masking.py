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
