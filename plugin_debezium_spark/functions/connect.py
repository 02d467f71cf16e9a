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
from pyspark.sql import types as T

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


def decimal_from_bytes(col, scale: int = 0, precision: int = 38) -> Column:
    """Connect's precise Decimal wire form: base64 text of the
    UNSCALED value's big-endian two's-complement bytes, scale carried
    in the schema's ``parameters`` (org.apache.kafka.connect.data
    .Decimal; the reference receives it pre-decoded as BigDecimal,
    MapConverterTest.java:82). All JVM-side: base64 → hex →
    sign-extended signed conv → exact decimal-point splice (no float,
    no division — decimal division would rescale/round).

    Bounded at 8 unscaled bytes (the int64 range conv can decode);
    a wider unscaled value fails loudly rather than truncating."""
    c = _c(col)
    h = F.upper(F.hex(F.unbase64(c)))
    h = F.when(
        F.length(h) > 16,
        F.raise_error(
            F.concat(
                F.lit(
                    "Conversion error: decimal unscaled value wider than "
                    "8 bytes: 0x"
                ),
                h,
            )
        ),
    ).otherwise(h)
    neg = F.substring(h, 1, 1).isin(*"89ABCDEF")
    padded = F.when(neg, F.lpad(h, 16, "F")).otherwise(F.lpad(h, 16, "0"))
    unscaled = F.conv(padded, 16, -10)  # signed decimal digits string
    if scale < 0:
        # BigDecimal semantics: value = unscaled * 10^-scale — splice
        # the zeros into the digit string (exact; no decimal multiply
        # whose precision rules could round)
        return F.when(c.isNull(), F.lit(None)).otherwise(
            F.concat(unscaled, F.lit("0" * -scale))
        ).cast(T.DecimalType(precision, 0))
    if scale == 0:
        return unscaled.cast(T.DecimalType(precision, 0))
    sign = F.when(unscaled.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    digits = F.regexp_replace(unscaled, "^-", "")
    # ensure at least scale+1 digits (lpad would TRUNCATE longer input,
    # so only pad when actually short)
    digits = F.when(
        F.length(digits) <= F.lit(scale),
        F.lpad(digits, scale + 1, "0"),
    ).otherwise(digits)
    intlen = F.length(digits) - F.lit(scale)
    out = F.concat(
        sign,
        digits.substr(F.lit(1), intlen),
        F.lit("."),
        digits.substr(intlen + 1, F.lit(scale)),
    )
    return F.when(c.isNull(), F.lit(None)).otherwise(out).cast(
        T.DecimalType(precision, scale)
    )


# Connect primitive type → the Spark type its JSON WIRE representation
# parses as (schemas-enabled JsonConverter): bytes/Decimal travel as
# base64 text, logical ints as plain ints — the typed cast happens
# AFTER parsing, in connect_cast.
_WIRE_PRIMITIVE = {
    "int8": T.IntegerType(),
    "int16": T.IntegerType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.DoubleType(),
    "float64": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.StringType(),  # base64 text on the wire
}


def connect_wire_type(schema: dict) -> T.DataType:
    """Spark DataType to ``from_json`` a value whose Connect schema is
    ``schema`` — the raw wire shape, before logical-type conversion.

    Non-string-key maps are rejected: the JsonConverter array-encodes
    them as [key, value] 2-element arrays of mixed types, which
    from_json cannot type — and no relational CDC source emits such a
    column. (The post-parse form IS supported by connect_cast for
    callers that decode by other means.)"""
    stype = schema.get("type")
    if stype in _WIRE_PRIMITIVE:
        return _WIRE_PRIMITIVE[stype]
    if stype == "array":
        return T.ArrayType(
            connect_wire_type(schema.get("items", {"type": "string"}))
        )
    if stype == "map":
        keys = schema.get("keys", {"type": "string"})
        if keys.get("type", "string") != "string":
            raise ValueError(
                "non-string-key MAP cannot be typed from the JSON wire "
                "(array-encoded mixed-type pairs); decode it untyped"
            )
        return T.MapType(
            T.StringType(),
            connect_wire_type(schema.get("values", {"type": "string"})),
        )
    if stype == "struct":
        return T.StructType(
            [
                T.StructField(f["field"], connect_wire_type(f), True)
                for f in schema.get("fields", [])
            ]
        )
    return T.StringType()


def connect_decode_json(col, schema: dict) -> Column:
    """JSON text + Connect schema → fully-typed Column: from_json with
    the wire shape, then the connect_cast lattice (logical names,
    defaults, required-null raise). This is the composition the wire
    adapter uses on schema-wrapped dumps (what MapConverter.java:38-252
    guarantees for Decimal/Date/Interval/bytes typing)."""
    parsed = F.from_json(_c(col), connect_wire_type(schema))
    return connect_cast(parsed, schema)


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

    if name == "org.apache.kafka.connect.data.Decimal" and schema.get(
        "parameters"
    ):
        # precise-mode wire Decimal: base64 unscaled bytes + schema
        # parameter scale (the shape a schemas-enabled dump carries);
        # without parameters the registry's string-decimal cast applies
        out = decimal_from_bytes(
            c, int(schema["parameters"].get("scale", 0))
        )
    elif name in DEBEZIUM_CONVERTERS:
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
