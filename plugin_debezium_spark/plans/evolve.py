"""Schema evolution step (SURVEY.md §4, §7 step 5).

Per micro-batch, before the MERGE: diff the batch's decoded payload
schema against the table schema and produce the evolved sink schema —
added columns append (nullable), numeric types widen along the lattice
in functions/decode.merge_types, enum growth (new lang values) is a
data-level no-op. The reference gets this implicitly from per-record
Connect schemas + a schema-history file (AbstractDebeziumTask.java:
535-538, migration :465-518); we make it an explicit, auditable diff.
"""

from __future__ import annotations

from pyspark.sql import types as T

from plugin_debezium_spark.functions.decode import merge_types


def evolve_schema(
    table_schema: T.StructType, batch_schema: T.StructType
) -> tuple[T.StructType, list[str]]:
    """Return (evolved schema, human-readable change list).

    Column order: existing table columns first (stable positions, like
    Iceberg field-id semantics), new columns appended in batch order.
    """
    changes: list[str] = []
    batch = {f.name: f.dataType for f in batch_schema.fields}
    out: list[T.StructField] = []
    for f in table_schema.fields:
        if f.name in batch and batch[f.name] != f.dataType:
            widened = merge_types(f.dataType, batch[f.name])
            if widened != f.dataType:
                changes.append(
                    f"widen {f.name}: {f.dataType.simpleString()} -> "
                    f"{widened.simpleString()}"
                )
            out.append(T.StructField(f.name, widened, True))
        else:
            out.append(T.StructField(f.name, f.dataType, True))
    known = {f.name for f in table_schema.fields}
    for f in batch_schema.fields:
        if f.name not in known:
            changes.append(f"add column {f.name}: {f.dataType.simpleString()}")
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out), changes
