"""Connect-schema-driven value conversion (SURVEY.md §2.3 P7).

The reference walks a Kafka-Connect Schema recursively and converts
each value (MapConverter.java:38-252): logical names dispatch to the
Debezium temporal converters, BYTES unwraps byte[]/ByteBuffer,
non-string-key MAPs become [key, value] pair lists, schema defaults
fill nulls, and a required field that is null with no default raises.

This module is the Spark-first equivalent: a Connect schema is a plain
dict (the JSON shape Connect's converter embeds under "schema"), and
``connect_cast`` compiles it into ONE Column expression — everything
stays JVM-side in whole-stage codegen; the recursion happens once at
plan-build time, not per row.

Connect schema dict shape (subset we model):
    {"type": "int32"|"int64"|...|"bytes"|"string"|"boolean"|
             "array"|"map"|"struct",
     "name": optional logical name (dispatches DEBEZIUM_CONVERTERS),
     "optional": bool (default True),
     "default": optional default value,
     "items": element schema        (arrays),
     "keys"/"values": schemas       (maps),
     "fields": [{"field": name, **schema}]  (structs)}
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from plugin_debezium_spark.functions.temporal import DEBEZIUM_CONVERTERS

# Connect primitive type → Spark cast target (MapConverter.java:157-173)
_PRIMITIVE_CAST = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
}


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bytes_base64(col) -> Column:
    """BYTES — Debezium's JSON converter ships byte[]/ByteBuffer as
    base64 text (MapConverter.java:174-180); decode to BinaryType."""
    return F.unbase64(_c(col))


def map_pairs(col) -> Column:
    """Non-string-key MAP → array-encoded [key, value] pair list
    (MapConverter.java:191-226's objectMode=false branch). For a Spark
    MapType column this is exactly map_entries."""
    return F.map_entries(_c(col))


def apply_field_spec(col, optional: bool = True, default=None) -> Column:
    """Null policy of MapConverter.java:39-53: default fills a null;
    a required field that is null with no default raises (JVM-side
    raise_error — same per-row failure the reference throws)."""
    c = _c(col)
    if default is not None:
        return F.coalesce(c, F.lit(default))
    if optional:
        return c
    return F.when(
        c.isNull(),
        F.raise_error(
            F.lit(
                "Conversion error: null value for field that is "
                "required and has no default value"
            )
        ),
    ).otherwise(c)


def connect_cast(col, schema: dict) -> Column:
    """Compile a Connect schema dict into one Column over ``col``.

    Mirrors MapConverter.convert's dispatch order: null policy →
    logical name → primitive/bytes/array/map/struct. The entire
    conversion is built-in expressions (transform / map_entries /
    casts) — no Python in the row path.
    """
    c = _c(col)
    name = schema.get("name")
    stype = schema.get("type")

    if name in DEBEZIUM_CONVERTERS:
        out = DEBEZIUM_CONVERTERS[name](c)
    elif stype in _PRIMITIVE_CAST:
        out = c.cast(_PRIMITIVE_CAST[stype])
    elif stype == "bytes":
        out = bytes_base64(c)
    elif stype == "array":
        items = schema.get("items")
        if items:
            out = F.transform(c, lambda x: connect_cast(x, items))
        else:
            out = c
    elif stype == "map":
        keys = schema.get("keys", {"type": "string"})
        values = schema.get("values", {})
        if keys.get("type", "string") == "string":
            # objectMode: string keys stay a JSON-object-shaped map
            out = (
                F.transform_values(c, lambda _k, v: connect_cast(v, values))
                if values
                else c
            )
        else:
            # array-encoding: [[key, value], ...] pair list
            out = F.transform(
                map_pairs(c),
                lambda e: F.struct(
                    connect_cast(e["key"], keys).alias("key"),
                    connect_cast(e["value"], values).alias("value")
                    if values
                    else e["value"].alias("value"),
                ),
            )
    elif stype == "struct":
        fields = schema.get("fields", [])
        built = F.struct(
            *[
                connect_cast(c[f["field"]], f).alias(f["field"])
                for f in fields
            ]
        )
        # F.struct over a NULL struct's fields builds Row(None, ...),
        # not NULL — guard so an optional null struct stays null and a
        # required inner field doesn't spuriously raise for it (CASE
        # short-circuits per row; the raise branch never evaluates)
        out = F.when(c.isNull(), F.lit(None)).otherwise(built)
    else:
        out = c

    return apply_field_spec(
        out, optional=schema.get("optional", True), default=schema.get("default")
    )
