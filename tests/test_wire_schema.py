"""Connect `$.schema` block plumbed from the wire into the decode
lattice: a schemas-enabled dump (Connect JSON converter with schemas
on — the shape MapConverter.java:38-252 consumes) must deliver TYPED
Decimal/Date/Interval/bytes columns, not inferred strings/longs."""

import base64
import datetime
import decimal
import json

import pytest
from pyspark.sql import functions as F

from plugin_debezium_spark.functions.connect import (
    connect_decode_json,
    connect_wire_type,
    decimal_from_bytes,
)
from plugin_debezium_spark.sources.debezium_json import typed_envelopes


def _dec_b64(unscaled: int, n_bytes: int) -> str:
    return base64.b64encode(
        unscaled.to_bytes(n_bytes, "big", signed=True)
    ).decode()


@pytest.mark.parametrize(
    "unscaled,n_bytes,scale,expected",
    [
        (12, 1, 0, decimal.Decimal("12")),
        (-1, 1, 0, decimal.Decimal("-1")),
        (1234, 2, 2, decimal.Decimal("12.34")),
        (-1234, 2, 2, decimal.Decimal("-12.34")),
        (5, 1, 3, decimal.Decimal("0.005")),  # fewer digits than scale
        (-5, 1, 3, decimal.Decimal("-0.005")),
        (2**55, 8, 0, decimal.Decimal(2**55)),  # >int32, 8-byte wire
    ],
)
def test_decimal_from_bytes(spark, unscaled, n_bytes, scale, expected):
    out = (
        spark.range(1)
        .select(decimal_from_bytes(F.lit(_dec_b64(unscaled, n_bytes)), scale).alias("d"))
        .collect()[0]["d"]
    )
    assert out == expected


def test_decimal_wider_than_8_bytes_raises(spark):
    wide = _dec_b64(10**30, 16)
    with pytest.raises(Exception, match="wider than"):
        spark.range(1).select(
            decimal_from_bytes(F.lit(wide), 0).alias("d")
        ).collect()


def test_wire_type_rejects_nonstring_key_map():
    with pytest.raises(ValueError, match="non-string-key"):
        connect_wire_type(
            {"type": "map", "keys": {"type": "int32"}, "values": {"type": "string"}}
        )


AFTER_SCHEMA = {
    "field": "after",
    "type": "struct",
    "optional": True,
    "fields": [
        {"field": "repo", "type": "string"},
        {"field": "path", "type": "string"},
        {"field": "commit", "type": "string"},
        {"field": "lang", "type": "string"},
        {"field": "content", "type": "string"},
        {
            "field": "price",
            "type": "bytes",
            "name": "org.apache.kafka.connect.data.Decimal",
            "parameters": {"scale": "2"},
        },
        {"field": "added_on", "type": "int32", "name": "io.debezium.time.Date"},
        {"field": "blob", "type": "bytes"},
        {"field": "sz", "type": "int64"},
        {"field": "tags", "type": "array", "items": {"type": "string"}},
        {
            "field": "attrs",
            "type": "map",
            "keys": {"type": "string"},
            "values": {"type": "int32"},
        },
        {
            "field": "created",
            "type": "string",
            "name": "io.debezium.time.ZonedTimestamp",
        },
        {
            "field": "lease",
            "type": "string",
            "name": "io.debezium.time.Interval",
        },
        {"field": "opt_def", "type": "int32", "optional": True, "default": 32},
    ],
}


def _envelope_schema():
    return {
        "type": "struct",
        "fields": [
            {**AFTER_SCHEMA, "field": "before"},
            AFTER_SCHEMA,
            {"field": "op", "type": "string"},
            {"field": "ts_ms", "type": "int64"},
        ],
    }


def _wire_line(lsn, after):
    return json.dumps(
        {
            "schema": _envelope_schema(),
            "payload": {
                "op": "c",
                "ts_ms": 1700000000000 + lsn,
                "before": None,
                "after": after,
                "source": {
                    "connector": "postgresql",
                    "db": "kestra",
                    "table": "repofiles",
                    "snapshot": "false",
                    "lsn": lsn,
                },
            },
        }
    )


def test_typed_envelopes_end_to_end(spark, tmp_path):
    after = {
        "repo": "org/a",
        "path": "x.py",
        "commit": "c1",
        "lang": "python",
        "content": "body",
        "price": _dec_b64(1234, 2),  # 12.34
        "added_on": 18175,  # 2019-10-06
        "blob": base64.b64encode(b"test").decode(),
        "sz": 64,
        "tags": ["a", "b"],
        "attrs": {"x": 1},
        "created": "2019-10-06T18:27:49Z",
        "lease": "P2Y",
        "opt_def": None,  # schema default must fill
    }
    p = tmp_path / "typed.jsonl"
    p.write_text(_wire_line(10, after) + "\n")
    env = typed_envelopes(spark, str(p))
    row = env.collect()[0]
    a = row["after"]
    assert a["price"] == decimal.Decimal("12.34")
    assert a["added_on"] == datetime.date(2019, 10, 6)
    assert bytes(a["blob"]) == b"test"
    assert a["sz"] == 64 and a["tags"] == ["a", "b"] and a["attrs"] == {"x": 1}
    # session TZ pinned UTC
    assert a["created"] == datetime.datetime(2019, 10, 6, 18, 27, 49)
    assert a["lease"]["years"] == 2 and a["lease"]["months"] == 0
    assert a["opt_def"] == 32  # default filled per MapConverter.java:39-53
    assert a["repo"] == "org/a" and row["key"]["repo"] == "org/a"
    assert row["before"] is None  # null image stays null, no Row(None,..)


def test_typed_envelopes_schema_evolution_unions(spark, tmp_path):
    """Two schema versions in one dump: each decodes with its own
    plan; the union null-fills the added column on older rows."""
    v1_after = dict(AFTER_SCHEMA)
    v2_fields = AFTER_SCHEMA["fields"] + [
        {"field": "stars", "type": "int64", "optional": True}
    ]
    v2_after = {**AFTER_SCHEMA, "fields": v2_fields}

    def line(lsn, after_schema, after):
        return json.dumps(
            {
                "schema": {
                    "type": "struct",
                    "fields": [after_schema, {"field": "op", "type": "string"}],
                },
                "payload": {
                    "op": "c",
                    "ts_ms": 1700000000000 + lsn,
                    "after": after,
                    "source": {"db": "d", "table": "t", "lsn": lsn},
                },
            }
        )

    base = {
        "repo": "org/a",
        "path": "x.py",
        "commit": "c1",
        "lang": "go",
        "content": "b",
        "price": _dec_b64(100, 1),
        "added_on": 1,
        "blob": base64.b64encode(b"z").decode(),
        "sz": 1,
        "tags": [],
        "attrs": {},
        "created": "2020-01-01T00:00:00Z",
        "lease": "P1D",
        "opt_def": 1,
    }
    p = tmp_path / "evolve.jsonl"
    p.write_text(
        line(1, v1_after, base)
        + "\n"
        + line(2, v2_after, {**base, "commit": "c2", "stars": 7})
        + "\n"
    )
    env = typed_envelopes(spark, str(p))
    rows = {r["lsn"]: r for r in env.collect()}
    assert rows[2]["after"]["stars"] == 7
    assert "stars" not in rows[1]["after"].asDict() or rows[1]["after"]["stars"] is None


def test_connect_decode_json_required_null_raises(spark):
    schema = {
        "type": "struct",
        "fields": [{"field": "a", "type": "string", "optional": False}],
    }
    with pytest.raises(Exception, match="required"):
        spark.range(1).select(
            connect_decode_json(F.lit('{"a": null}'), schema).alias("v")
        ).collect()


def test_decimal_negative_scale(spark):
    """Connect Decimal permits negative scales (BigDecimal): value =
    unscaled * 10^-scale, not a silent scale-0 misread."""
    out = (
        spark.range(1)
        .select(decimal_from_bytes(F.lit(_dec_b64(123, 1)), -2).alias("d"))
        .collect()[0]["d"]
    )
    assert out == decimal.Decimal("12300")


def test_typed_envelopes_combined_wire(spark, tmp_path):
    """wire='combined' ({key, value} record pairs): the value doc's
    schema block drives typing and the key doc drives key columns."""
    after = {
        "repo": "org/c",
        "path": "k.py",
        "commit": "c7",
        "lang": "py",
        "content": "x",
        "price": _dec_b64(777, 2),  # 7.77
        "added_on": 2,
        "blob": base64.b64encode(b"k").decode(),
        "sz": 9,
        "tags": ["t"],
        "attrs": {"a": 2},
        "created": "2021-06-01T00:00:00Z",
        "lease": "P3D",
        "opt_def": 5,
    }
    line = json.dumps(
        {
            "key": {"payload": {"repo": "org/c", "path": "k.py", "commit": "c7"}},
            "value": json.loads(_wire_line(3, after)),
        }
    )
    p = tmp_path / "combined_typed.jsonl"
    p.write_text(line + "\n")
    env = typed_envelopes(spark, str(p), wire="combined")
    row = env.collect()[0]
    assert row["key"]["repo"] == "org/c"
    assert row["after"]["price"] == decimal.Decimal("7.77")
    assert row["after"]["lease"]["days"] == 3
