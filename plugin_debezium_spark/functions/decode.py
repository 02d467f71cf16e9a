"""Envelope payload decode (SURVEY.md §2.3 P7).

The reference converts Kafka-Connect records to plain maps via a
215-line recursive converter (MapConverter.java:38-252); MongoDB
payloads arrive as JSON strings (CustomParameterDeserializer.java:
14-20). Our log carries before/after as JSON strings, and this module
turns them into typed struct columns two ways:

- ``native``   — ``F.from_json`` (JVM-side, whole-stage codegen; the
  fast path and the default)
- ``arrow``    — a vectorized ``pandas_udf`` that parses JSON batches
  in Arrow space (the input_hint-mandated UDF surface; also the
  extension point for payload formats from_json can't express)

Schema evolution is detected per micro-batch by aggregating the
*distinct key-sets* of the JSON payloads (``json_object_keys`` — a
map-side-combinable aggregate whose result is a handful of rows no
matter how many events the batch has) and inferring types from one
sample per shape on the driver. That makes detection a cheap full
scan, not a sampling gamble: a single evolved row in 10^10 still
produces its own shape row.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# Schema inference (evolution detection)
# ---------------------------------------------------------------------------


def _infer_type(v) -> T.DataType:
    # JSON integral numbers always map to LongType: widening int->long is
    # then a one-way door decided at decode time, mirroring the safe side
    # of the reference's Connect->Java lattice (MapConverter.java:158-165).
    if v is None:
        return T.NullType()
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    if isinstance(v, list):
        elem: T.DataType = T.NullType()
        for x in v:
            elem = merge_types(elem, _infer_type(x))
        if isinstance(elem, T.NullType):
            elem = T.StringType()
        return T.ArrayType(elem, True)
    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(k, _infer_type(x), True) for k, x in v.items()]
        )
    return T.StringType()


_WIDEN = {
    # simpleString names: tinyint/smallint/int/bigint/float/double
    ("bigint", "double"): T.DoubleType(),
    ("double", "bigint"): T.DoubleType(),
    ("int", "bigint"): T.LongType(),
    ("bigint", "int"): T.LongType(),
    ("int", "double"): T.DoubleType(),
    ("double", "int"): T.DoubleType(),
    ("float", "double"): T.DoubleType(),
    ("double", "float"): T.DoubleType(),
}


def merge_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least-upper-bound of two inferred types (the widening lattice —
    SURVEY.md §4 'schema evolution')."""
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if a == b:
        return a
    key = (a.simpleString(), b.simpleString())
    if key in _WIDEN:
        return _WIDEN[key]
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        out: dict[str, T.DataType] = {f.name: f.dataType for f in a.fields}
        for f in b.fields:
            out[f.name] = merge_types(out.get(f.name, T.NullType()), f.dataType)
        return T.StructType([T.StructField(n, t, True) for n, t in out.items()])
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(merge_types(a.elementType, b.elementType), True)
    # incompatible -> fall back to string (never lose data)
    return T.StringType()


def infer_payload_schema(
    df: DataFrame,
    cols: tuple[str, ...] = ("after_json", "before_json"),
    base: T.StructType | None = None,
) -> T.StructType:
    """Infer the payload struct schema for a micro-batch.

    One distributed aggregate per column: group by the payload's sorted
    key-set, keep one max-lsn sample per shape. Result rows == number
    of distinct shapes (a handful), so the driver-side json.loads is
    O(shapes), not O(rows).
    """
    merged: T.DataType = base if base is not None else T.NullType()
    for c in cols:
        shapes = (
            df.filter(F.col(c).isNotNull())
            .groupBy(
                F.array_join(F.array_sort(F.json_object_keys(F.col(c))), ",").alias(
                    "shape"
                )
            )
            # two samples per shape: a field that's null in one may be
            # typed in the other
            .agg(
                F.max_by(F.col(c), F.col("lsn")).alias("s1"),
                F.min_by(F.col(c), F.col("lsn")).alias("s2"),
            )
            .collect()
        )
        for row in shapes:
            for s in (row["s1"], row["s2"]):
                merged = merge_types(merged, _infer_type(json.loads(s)))
    if isinstance(merged, T.NullType):
        return base or T.StructType([])
    assert isinstance(merged, T.StructType)
    return _denull(merged)


def _denull(dt: T.DataType) -> T.DataType:
    """Fields whose sampled values were all null decode as string (a
    typed value in a later batch then merges via the widening lattice's
    string fallback — safe, never lossy)."""
    if isinstance(dt, T.NullType):
        return T.StringType()
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _denull(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_denull(dt.elementType), True)
    return dt


# ---------------------------------------------------------------------------
# Decode column factories
# ---------------------------------------------------------------------------


def decode_native(col: str, schema: T.StructType) -> Column:
    """JVM-side JSON decode — stays inside whole-stage codegen."""
    return F.from_json(F.col(col), schema)


def decode_arrow(col: str, schema: T.StructType) -> Column:
    """Vectorized Arrow decode: one pandas_udf call per Arrow batch.

    Null-safe and type-coercing to the target schema; the per-batch
    cost is one json.loads per row inside Arrow space — no per-row
    Python<->JVM crossings (the input_hint's 'no per-row Python').
    """
    names = [f.name for f in schema.fields]

    @pandas_udf(returnType=schema)
    def _decode(s: pd.Series) -> pd.DataFrame:
        parsed = [
            json.loads(x) if isinstance(x, str) and x else None for x in s
        ]
        return pd.DataFrame(
            {
                n: [None if p is None else p.get(n) for p in parsed]
                for n in names
            }
        )

    # match from_json semantics: null input -> null struct (the UDF can
    # only emit a struct of nulls, not a null struct)
    c = F.col(col)
    return F.when(c.isNull(), F.lit(None).cast(schema)).otherwise(_decode(c))


def decode_envelope(
    df: DataFrame,
    schema: T.StructType,
    mode: str = "native",
    images: tuple[str, ...] = ("before", "after"),
) -> DataFrame:
    """Replace before_json/after_json with typed structs ``before``/
    ``after`` (drops the raw strings). The merge path only needs the
    after image (deletes carry their key in ``key``), so it passes
    images=("after",) and skips half the JSON work."""
    dec = decode_native if mode == "native" else decode_arrow
    for img in images:
        df = df.withColumn(img, dec(f"{img}_json", schema))
    return df.drop("before_json", "after_json")
