"""Connect-schema conversion parity matrix (reference
MapConverterTest.java:27-86 — all Spark-expressible cases, plus the
null-policy rows MapConverter.java:39-53 enforces).

The reference's MicroDuration case encodes `value*1000 ms` (a unit
quirk of MapConverter.java:72-76); we keep the documented Debezium
semantics (value = microseconds) instead of reproducing the quirk.
"""

import base64
import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plugin_debezium_spark.functions.connect import (
    apply_field_spec,
    bytes_base64,
    connect_cast,
    map_pairs,
)


def _one(spark, col, value, value_type="string"):
    df = spark.createDataFrame(
        [Row(v=value)], schema=T.StructType([T.StructField("v", value_type, True)])
        if not isinstance(value_type, str)
        else f"v {value_type}",
    )
    return df.select(col.alias("out")).collect()[0]["out"]


CASES = [
    # (connect schema, input value, input spark type, expected)
    ({"type": "int8"}, 8, "int", 8),
    ({"type": "int16"}, 16, "int", 16),
    ({"type": "int32"}, 32, "long", 32),
    ({"type": "int64"}, 64, "long", 64),
    ({"type": "float32"}, 32.0, "double", 32.0),
    ({"type": "float64"}, 64.0, "double", 64.0),
    ({"type": "boolean"}, True, "boolean", True),
    ({"type": "string"}, "test", "string", "test"),
    # BYTES: Debezium JSON ships base64 (MapConverter.java:174-180)
    (
        {"type": "bytes"},
        base64.b64encode(b"test").decode(),
        "string",
        bytearray(b"test"),
    ),
    # Date: epoch days (2019-10-06 = 18175)
    (
        {"type": "int32", "name": "io.debezium.time.Date"},
        18175,
        "int",
        datetime.date(2019, 10, 6),
    ),
    # Interval P2Y (MapConverter.java:66-70 → Period.parse)
    (
        {"type": "string", "name": "io.debezium.time.Interval"},
        "P2Y",
        "string",
        Row(years=2, months=0, days=0, micros=0),
    ),
    (
        {"type": "string", "name": "io.debezium.time.Interval"},
        "P1Y2M3W4DT5H6M7.5S",
        "string",
        Row(
            years=1,
            months=2,
            days=25,
            micros=5 * 3_600_000_000 + 6 * 60_000_000 + 7_500_000,
        ),
    ),
    # MicroTime: µs of day for 18:27:49
    (
        {"type": "int64", "name": "io.debezium.time.MicroTime"},
        66469000000,
        "long",
        "18:27:49.000000",
    ),
    (
        {"type": "int64", "name": "io.debezium.time.MicroTimestamp"},
        1570386469000000,
        "long",
        datetime.datetime(2019, 10, 6, 18, 27, 49),
    ),
    # NanoDuration 5s (MapConverter.java:90-94 → Duration.ofNanos)
    (
        {"type": "int64", "name": "io.debezium.time.NanoDuration"},
        5_000_000_000,
        "long",
        datetime.timedelta(seconds=5),
    ),
    (
        {"type": "int64", "name": "io.debezium.time.NanoTime"},
        66469000000000,
        "long",
        "18:27:49.000000",
    ),
    (
        {"type": "int64", "name": "io.debezium.time.NanoTimestamp"},
        1570386469000000000,
        "long",
        datetime.datetime(2019, 10, 6, 18, 27, 49),
    ),
    (
        {"type": "int32", "name": "io.debezium.time.Time"},
        66469000,
        "long",
        "18:27:49.000",
    ),
    (
        {"type": "int64", "name": "io.debezium.time.Timestamp"},
        1570386469000,
        "long",
        datetime.datetime(2019, 10, 6, 18, 27, 49),
    ),
    (
        {"type": "int32", "name": "io.debezium.time.Year"},
        2020,
        "int",
        datetime.date(2020, 1, 1),
    ),
    (
        {"type": "string", "name": "io.debezium.time.ZonedTime"},
        "18:27:49Z",
        "string",
        "18:27:49.000000",
    ),
    (
        {"type": "string", "name": "io.debezium.time.ZonedTimestamp"},
        "2019-10-06T18:27:49Z",
        "string",
        datetime.datetime(2019, 10, 6, 18, 27, 49),
    ),
    # default fills null (MapConverterTest's last row)
    ({"type": "int32", "default": 32}, None, "int", 32),
    # time.precision.mode=connect emits the Kafka Connect logical
    # names; identical wire semantics (aliases in DEBEZIUM_CONVERTERS)
    (
        {"type": "int32", "name": "org.apache.kafka.connect.data.Date"},
        18175,
        "int",
        datetime.date(2019, 10, 6),
    ),
    (
        {"type": "int64", "name": "org.apache.kafka.connect.data.Time"},
        66469000,
        "long",
        "18:27:49.000",
    ),
    (
        {"type": "int64", "name": "org.apache.kafka.connect.data.Timestamp"},
        1570386469000,
        "long",
        datetime.datetime(2019, 10, 6, 18, 27, 49),
    ),
]


@pytest.mark.parametrize("schema,value,vtype,expected", CASES)
def test_connect_cast_matrix(spark, schema, value, vtype, expected):
    assert _one(spark, connect_cast("v", schema), value, vtype) == expected


def test_connect_cast_array(spark):
    df = spark.createDataFrame([Row(v=[1, 2, 3])], "v array<long>")
    out = df.select(
        connect_cast("v", {"type": "array", "items": {"type": "int32"}}).alias(
            "out"
        )
    ).collect()[0]["out"]
    assert out == [1, 2, 3]


def test_connect_cast_struct(spark):
    df = spark.createDataFrame([Row(v=Row(a="test", b=32))], "v struct<a:string,b:long>")
    sch = {
        "type": "struct",
        "fields": [
            {"field": "a", "type": "string"},
            {"field": "b", "type": "int32"},
        ],
    }
    out = df.select(connect_cast("v", sch).alias("out")).collect()[0]["out"]
    assert out == Row(a="test", b=32)


def test_connect_cast_null_struct(spark):
    """MapConverter null policy on STRUCTS: an optional null struct
    converts to NULL (not a row of nulls), its required inner fields do
    not spuriously raise, and a REQUIRED null struct raises."""
    df = spark.createDataFrame(
        [Row(v=Row(a="x", b=1)), Row(v=None)], "v struct<a:string,b:long>"
    )
    sch = {
        "type": "struct",
        "optional": True,
        "fields": [
            {"field": "a", "type": "string", "optional": False},
            {"field": "b", "type": "int32"},
        ],
    }
    got = [r["out"] for r in df.select(connect_cast("v", sch).alias("out")).collect()]
    assert got == [Row(a="x", b=1), None]
    req = dict(sch, optional=False)
    with pytest.raises(Exception, match="required"):
        df.select(connect_cast("v", req).alias("out")).collect()


def test_connect_cast_string_key_map(spark):
    df = spark.createDataFrame(
        [Row(v={"a": 1, "b": 2})], "v map<string,long>"
    )
    sch = {"type": "map", "keys": {"type": "string"}, "values": {"type": "int32"}}
    out = df.select(connect_cast("v", sch).alias("out")).collect()[0]["out"]
    assert out == {"a": 1, "b": 2}


def test_connect_cast_nonstring_key_map_array_encodes(spark):
    """Non-string keys → [key, value] pair list
    (MapConverter.java:191-226 objectMode=false)."""
    df = spark.createDataFrame([Row(v={1: "a", 2: "b"})], "v map<long,string>")
    sch = {"type": "map", "keys": {"type": "int32"}, "values": {"type": "string"}}
    out = df.select(connect_cast("v", sch).alias("out")).collect()[0]["out"]
    assert sorted((r["key"], r["value"]) for r in out) == [(1, "a"), (2, "b")]


def test_map_pairs_plain(spark):
    df = spark.createDataFrame([Row(v={1: "a"})], "v map<long,string>")
    out = df.select(map_pairs("v").alias("out")).collect()[0]["out"]
    assert [(r["key"], r["value"]) for r in out] == [(1, "a")]


def test_bytes_roundtrip(spark):
    payload = base64.b64encode(b"\x00\x01binary").decode()
    df = spark.createDataFrame([Row(v=payload)], "v string")
    out = df.select(bytes_base64("v").alias("out")).collect()[0]["out"]
    assert bytes(out) == b"\x00\x01binary"


def test_required_null_without_default_raises(spark):
    df = spark.createDataFrame([Row(v=None)], "v int")
    with pytest.raises(Exception, match="required"):
        df.select(
            apply_field_spec("v", optional=False).alias("out")
        ).collect()


def test_required_null_with_default_fills(spark):
    df = spark.createDataFrame([Row(v=None)], "v int")
    out = df.select(
        apply_field_spec("v", optional=False, default=7).alias("out")
    ).collect()[0]["out"]
    assert out == 7
