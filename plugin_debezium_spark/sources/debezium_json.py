"""Debezium JSON-envelope source adapter.

A user of the reference has change events in Debezium's native wire
shape — JSON lines with key/value documents, the value carrying
{op, ts_ms, before, after, source{lsn|pos, db, table, snapshot,
connector}, transaction} (reference model: Envelope.java:19-57,
Message.java:40-67; Kafka Connect JSON converter layout, optionally
schema-wrapped under "payload"). This adapter turns such dumps into
the engine's envelope-log frame so the replay/export/streaming paths
run unchanged on real Debezium topic exports.

Design: the value document is read as ONE json string column and
sliced with native get_json_object/variant ops — before/after stay
raw JSON strings (the engine decodes them per micro-batch with its
evolving schema), so this adapter never needs to know the payload
schema.

LSN derivation follows Debezium's per-connector ordering fields:
postgres `source.lsn`, mysql binlog (`pos` + file sequence), oracle
`scn`, fallback to ts_ms — configurable via `lsn_fields`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plugin_debezium_spark.models import KEY_COLS

DEFAULT_LSN_FIELDS = ("lsn", "pos", "scn", "sequence")

# Bits reserved for the byte offset within one binlog file when
# composing the (file sequence, pos) total order. MySQL caps a binlog
# file at max_binlog_size ≤ 1 GiB (one trailing event may spill past
# it), so 31 bits cover any legal pos; file sequences then must stay
# below 2^16 to clear import_to_log's 2^47 overflow guard — lower
# BINLOG_POS_BITS for installations with more rotated files.
BINLOG_POS_BITS = 31


def _payload(col: str) -> F.Column:
    """Unwrap Connect's schema+payload envelope when present."""
    c = F.col(col)
    return F.coalesce(F.get_json_object(c, "$.payload"), c)


def _vstr(v: F.Column, path: str) -> F.Column:
    """variant path → string (null on missing/malformed)."""
    return F.try_variant_get(v, path, "string")


def _vjson(sub: F.Column) -> F.Column:
    """variant → RAW JSON text, preserving get_json_object's null
    convention: SQL NULL and explicit JSON null both yield SQL NULL
    (to_json of a variant null would emit the 4-char string 'null' —
    a delete's absent after-image must stay NULL for the op='d'
    contract)."""
    return F.when(
        F.coalesce(F.is_variant_null(sub), F.lit(False)), F.lit(None)
    ).otherwise(F.to_json(sub))


def _binlog_composite(v: F.Column, pos_bits: int) -> F.Column:
    """(binlog file sequence, pos) → one long: file_seq << pos_bits | pos.

    MySQL's `pos` resets to ~4 at every binlog file rotation
    (reference: Debezium keeps the opaque {file, pos} offset map
    intact, AbstractDebeziumTask.java:382-384 — ordering by `pos`
    alone interleaves rotated files and silently corrupts the LWW
    total order). The file's numeric suffix ("mysql-bin.000007" → 7)
    supplies the major component. NULL when the event carries no
    `source.file` — the plain-`pos` coalesce arm then applies.

    A pos ≥ 2^pos_bits would bleed into the next file's range; that
    only happens on non-MySQL sources abusing `pos`, so fail loudly
    (same contract as import_to_log's overflow guards)."""
    file_seq = F.regexp_extract(v["source"]["file"], r"(\d+)\s*$", 1)
    pos = v["source"]["pos"].try_cast("long")
    guarded_pos = F.when(pos < F.lit(1 << pos_bits), pos).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "binlog pos exceeds the per-file offset space "
                    f"(2^{pos_bits}); lower BINLOG_POS_BITS? pos="
                ),
                pos.cast("string"),
            )
        )
    )
    return F.when(
        file_seq.isNotNull() & (file_seq != F.lit("")) & pos.isNotNull(),
        file_seq.cast("long") * F.lit(1 << pos_bits) + guarded_pos,
    )


def from_json_lines(
    spark: SparkSession,
    path: str,
    wire: str = "value",
    lsn_fields: tuple[str, ...] = DEFAULT_LSN_FIELDS,
    lsn_buckets: int = 64,
    bucket_span: int = 1_000_000,
    order_token_field: str | None = None,
) -> DataFrame:
    """Read a Debezium topic dump into the envelope-log frame.

    wire="value": one JSON value doc per line; key columns come from
    the after/before image (Debezium's record key mirrors the PK).
    wire="combined": each line is {"key": <key doc>, "value": <value
    doc>} (the record pair MapConverter.convert consumes,
    MapConverter.java:27-35). Key columns come from the key doc first
    — so PK-only key docs with key-only deletes round-trip — falling
    back to the images. Kafka tombstones (null value doc) carry no
    envelope/position and are dropped, as the reference's non-RAW
    paths do (ChangeConsumer.java:196-210).
    """
    raw = spark.read.text(path).withColumnRenamed("value", "_raw")
    if wire == "combined":
        key_doc = F.coalesce(
            F.get_json_object(F.col("_raw"), "$.key.payload"),
            F.get_json_object(F.col("_raw"), "$.key"),
        )
        value_doc = F.get_json_object(F.col("_raw"), "$.value")
        combined = raw.select(
            key_doc.alias("_key_doc"), value_doc.alias("_value_doc")
        ).filter(F.col("_value_doc").isNotNull())  # drop tombstones
        return envelopes_from_value_json(
            combined,
            "_value_doc",
            lsn_fields,
            bucket_span,
            key_col="_key_doc",
            order_token_field=order_token_field,
        )
    return envelopes_from_value_json(
        raw, "_raw", lsn_fields, bucket_span,
        order_token_field=order_token_field,
    )


def envelopes_from_value_json(
    df: DataFrame,
    col: str,
    lsn_fields: tuple[str, ...] = DEFAULT_LSN_FIELDS,
    bucket_span: int = 1_000_000,
    key_col: str | None = None,
    order_token_field: str | None = None,
    schema_col: str | None = None,
) -> DataFrame:
    """``key_col``: optional column holding the record-key JSON doc —
    key fields prefer it over the images (the reference merges the
    record key into the row, ChangeConsumer.java:276-280).

    ``order_token_field``: source field holding an OPAQUE (string)
    position token — Mongo resume tokens, any offset that can't map to
    a long (the reference keeps offsets as an opaque byte map,
    AbstractDebeziumTask.java:640-670). The token can't become the lsn
    directly; instead it rides along as ``_order_token`` and
    ``import_to_log`` uses it as the tie-break INSIDE each coarse
    position (ts_ms fallback), so same-millisecond bursts order in
    SOURCE order rather than arbitrarily. Documented ordering: bytewise
    lexical — correct for Mongo resume tokens, which are
    equal-length hex strings whose lexical order is their stream
    order."""
    # Physical strategy: ONE codegen'd from_json parses the envelope
    # SHELL per row — op/ts_ms/source/transaction land typed,
    # before/after land as VARIANT so the payload schema stays open
    # (the engine's evolving-schema contract). The parsed struct is
    # materialized as its own projection (`_p`, then the unwrapped
    # `_e`): ~20 downstream expressions reference it, and inlining the
    # parse into each (what ~14 independent get_json_object calls do,
    # or ~25 interpreted variant_get slices) re-parses/re-walks the
    # doc once PER FIELD — measured ~3.5x slower on the sf0.1
    # cdc_binlog_rotation wire query. CollapseProject keeps the split
    # because the producer is expensive and multiply referenced
    # (SPARK-36718).
    from pyspark.sql import types as T

    from plugin_debezium_spark.models import TRANSACTION_SCHEMA

    # Every source field lands as STRING and numerics try_cast after:
    # from_json with a LongType field NULLS a string-encoded number
    # ("scn": "2868546" — Debezium Oracle's wire type IS string),
    # while a StringType field takes any scalar token's text (numbers,
    # booleans like a bare `snapshot: true`). try_cast (not cast) so a
    # non-numeric position degrades to the next coalesce arm instead
    # of failing the whole import under ANSI.
    src_types: dict[str, T.DataType] = {
        f: T.StringType()
        for f in (
            "db", "table", "collection", "snapshot", "connector", "file",
            # provenance (Message.java:40-67): logical server name,
            # connector version, opaque sequence token, snapshot row
            # counter — all read as text, `row` try_cast after
            "name", "version", "sequence", "row",
        )
    }
    for f in lsn_fields:
        src_types.setdefault(f, T.StringType())
    src_types.setdefault("pos", T.StringType())  # binlog composite input
    if order_token_field is not None:
        src_types.setdefault(order_token_field, T.StringType())
    env_struct = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("before", T.VariantType()),
            T.StructField("after", T.VariantType()),
            T.StructField(
                "source",
                T.StructType(
                    [T.StructField(n, t) for n, t in src_types.items()]
                ),
            ),
            T.StructField("transaction", TRANSACTION_SCHEMA),
        ]
    )
    # Connect's schema+payload wrapper and the bare envelope in ONE
    # parse: the shell carries both `payload` and the top-level fields
    shell = T.StructType(
        [T.StructField("payload", env_struct)] + list(env_struct.fields)
    )
    keep = list(dict.fromkeys([c for c in (key_col, schema_col) if c]))
    # Stateless blank-line pre-filter, BEFORE the parse: it pushes into
    # the text scan harmlessly, and it keeps degenerate all-blank
    # inputs away from a Spark 4.1 fallback-Predicate quirk (the final
    # null-drop filter gets substituted below the projections by
    # predicate pushdown; in the rare non-whole-stage fallback the
    # stateful from_json inside that pushed predicate NPEs on init).
    df = df.filter(F.length(F.trim(F.col(col))) > 0)
    staged = df.select(
        F.from_json(F.col(col), shell).alias("_p"),
        F.col(col).alias("_raw0"),
        *keep,
    )
    p = F.col("_p")
    unwrapped = F.when(p["payload"].isNotNull(), p["payload"]).otherwise(
        F.struct(*[p[f.name].alias(f.name) for f in env_struct.fields])
    )

    def _img_norm(img: F.Column) -> F.Column:
        """Mongo sends before/after as JSON *strings* — the reference
        re-parses string-typed images back into documents
        (CustomParameterDeserializer.java:14-20). A string-typed
        variant here would make the `_vstr($.key)` key extraction
        return null and `_vjson` emit a quoted string, losing
        keys/images for a Mongo-shaped dump. Normalize: if the variant
        root is a string whose text looks like a JSON document,
        re-parse it. Cost on the hot (object-image) path is one O(1)
        root-type check: try_variant_get(..., 'string') is an invalid
        cast for object variants, so it nulls without walking the
        doc."""
        s = F.try_variant_get(img, "$", "string")
        return F.when(
            F.ltrim(s).startswith(F.lit("{")),
            F.coalesce(F.try_parse_json(s), img),
        ).otherwise(img)

    unwrapped = F.struct(
        unwrapped["op"].alias("op"),
        unwrapped["ts_ms"].alias("ts_ms"),
        _img_norm(unwrapped["before"]).alias("before"),
        _img_norm(unwrapped["after"]).alias("after"),
        unwrapped["source"].alias("source"),
        unwrapped["transaction"].alias("transaction"),
    )
    kv_cols = (
        [F.try_parse_json(F.col(key_col)).alias("_kv")] if key_col else []
    )
    staged = staged.select(
        unwrapped.alias("_e"),
        p.isNotNull().alias("_parsed"),
        F.col("_raw0"),
        *kv_cols,
        *([F.col(schema_col)] if schema_col else []),
    )
    df = staged
    e = F.col("_e")

    def _lsn_arm(f: str) -> F.Column:
        plain = e["source"][f].try_cast("long")
        if f == "pos":
            # mysql: (binlog file sequence, pos) composite when the
            # event names its binlog file; bare pos otherwise
            return F.coalesce(_binlog_composite(e, BINLOG_POS_BITS), plain)
        return plain

    lsn = F.coalesce(*[_lsn_arm(f) for f in lsn_fields], e["ts_ms"])

    def _key_field(k: str):
        from_image = F.coalesce(
            _vstr(e["after"], f"$.{k}"), _vstr(e["before"], f"$.{k}")
        )
        if key_col is None:
            return from_image.alias(k)
        return F.coalesce(
            _vstr(F.col("_kv"), f"$.{k}"), from_image
        ).alias(k)

    key = F.struct(*[_key_field(k) for k in KEY_COLS])
    source = F.struct(
        e["source"]["db"].alias("db"),
        F.coalesce(
            e["source"]["table"], e["source"]["collection"]
        ).alias("table"),
        F.coalesce(e["source"]["snapshot"], F.lit("false")).alias(
            "snapshot"
        ),
        e["source"]["connector"].alias("connector"),
        # provenance passthrough (Message.java:40-67) — `name` is the
        # logical server name multi-server deployments key on; kept
        # verbatim so P6 metadata packs the full reference source
        e["source"]["name"].alias("name"),
        e["source"]["version"].alias("version"),
        e["source"]["sequence"].alias("sequence"),
        e["source"]["row"].try_cast("int").alias("row"),
    )
    # Non-envelope messages (no `op`): schema-change/DDL notifications
    # with an open-schema body (Message.java:24-36 @JsonAnySetter).
    # They enter the log as op='m' carrying the WHOLE value doc in
    # message_json — only RAW with ignoreDdl=false delivers them
    # (ChangeConsumer.java:205-210); every other path drops 'm' because
    # it is not in DATA_OPS. The body re-reads the raw line (not the
    # typed shell, which would drop the open-schema fields) — lazily,
    # only on the rare op-less rows.
    wire_op = e["op"]
    op = F.coalesce(wire_op, F.when(F.col("_parsed"), F.lit("m")))
    message = F.when(
        wire_op.isNull(),
        F.coalesce(
            F.get_json_object(F.col("_raw0"), "$.payload"), F.col("_raw0")
        ),
    )
    cols = [
        lsn.alias("lsn"),
        e["ts_ms"].alias("ts_ms"),
        op.alias("op"),
        key.alias("key"),
        _vjson(e["before"]).alias("before_json"),
        _vjson(e["after"]).alias("after_json"),
        source.alias("source"),
        e["transaction"].alias("transaction"),
        message.alias("message_json"),
        F.lit(None).cast("long").alias("epoch_hint"),
        (lsn / F.lit(bucket_span)).cast("long").alias("lsn_bucket"),
    ]
    if order_token_field is not None:
        cols.append(
            e["source"][order_token_field].alias("_order_token")
        )
    if schema_col is not None:
        # the Connect value schema the converter wrapped around the
        # payload — carried verbatim so typed_envelopes can drive the
        # connect_cast lattice with it
        cols.append(F.col(schema_col).alias("schema_json"))
    # The malformed-row drop must evaluate the MATERIALIZED lsn/op
    # columns, not sink below this projection: PushDownPredicates
    # substitutes projection expressions into a pushed filter, and
    # since lsn/op are coalesce chains over the parsed shell, the
    # substituted predicate materialized ~40 independent copies of
    # the from_json parse in the scan-stage filter — evaluated in the
    # SERIAL scan task on single-file inputs (r07 plan audit; the
    # wire queries spent their whole wall there). A filter is only
    # pushed through a Project whose fields are ALL deterministic
    # (PushPredicateThroughNonJoin), so a throwaway rand() column
    # pins it — and the filter must REFERENCE that column (an
    # always-true >= -1 arm) or ColumnPruning deletes it and the
    # barrier with it. The filter condition itself stays a
    # deterministic tree of column references, so the stateful-expr-
    # in-fallback-Predicate NPE (CLAUDE.md) can't bite, and a task
    # retry drawing different rand values can't change the result.
    return (
        df.select(*cols, F.rand().alias("_pushdown_barrier"))
        .filter(
            F.col("lsn").isNotNull()
            & F.col("op").isNotNull()
            & (F.col("_pushdown_barrier") >= F.lit(-1.0))
        )
        .drop("_pushdown_barrier")
    )


def typed_envelopes(
    spark: SparkSession,
    path: str,
    wire: str = "value",
    lsn_fields: tuple[str, ...] = DEFAULT_LSN_FIELDS,
    images: tuple[str, ...] = ("before", "after"),
) -> DataFrame:
    """Schemas-enabled Connect dump → envelope frame + TYPED images.

    ``from_json_lines`` deliberately keeps before/after as raw JSON
    (the engine's evolving-schema contract); this reader is for dumps
    written by Connect's JSON converter WITH schemas enabled, where
    the ``$.schema`` block is the source of truth for Decimal/Date/
    Interval/bytes typing (the shape MapConverter.java:38-252
    consumes). Each distinct schema version in the dump is decoded
    with its own connect_cast plan and the versions are unioned by
    name (added columns null-fill older rows) — one driver-side
    collect of the DISTINCT schema strings, O(#schema versions), never
    O(rows).

    Output = the envelope-log frame plus ``before``/``after`` typed
    struct columns (and ``schema_json`` for lineage). Rows with no
    schema block keep null typed images.

    The parsed envelope frame is CACHED before the fan-out (the
    schema-version collect plus one filtered branch per version would
    otherwise re-run the text scan + wire parse V+2 times); the cache
    entry stays pinned for the returned DataFrame's lifetime — after
    materializing the result (write/collect), callers processing huge
    dumps can release it via ``result._env_cache.unpersist()``."""
    import json as _json
    from functools import reduce

    from plugin_debezium_spark.functions.connect import connect_decode_json

    raw = spark.read.text(path).withColumnRenamed("value", "_raw")
    if wire == "combined":
        sc = F.get_json_object(F.col("_raw"), "$.value.schema")
        key_doc = F.coalesce(
            F.get_json_object(F.col("_raw"), "$.key.payload"),
            F.get_json_object(F.col("_raw"), "$.key"),
        )
        value_doc = F.get_json_object(F.col("_raw"), "$.value")
        base = raw.select(
            key_doc.alias("_key_doc"),
            value_doc.alias("_value_doc"),
            sc.alias("_schema_json"),
        ).filter(F.col("_value_doc").isNotNull())
        env = envelopes_from_value_json(
            base,
            "_value_doc",
            lsn_fields,
            key_col="_key_doc",
            schema_col="_schema_json",
        )
    else:
        base = raw.withColumn(
            "_schema_json", F.get_json_object(F.col("_raw"), "$.schema")
        )
        env = envelopes_from_value_json(
            base, "_raw", lsn_fields, schema_col="_schema_json"
        )

    env = env.cache()
    versions = [
        r[0]
        for r in env.select("schema_json")
        .filter(F.col("schema_json").isNotNull())
        .distinct()
        .collect()
    ]
    if not versions:
        # plain dump: nothing to type — still attach the documented
        # release handle so result._env_cache.unpersist() works on
        # every path (round-4 ADVICE fix: the early return used to
        # leak the cache entry for the session)
        env._env_cache = env
        return env

    def _typed(part: DataFrame, schema_doc: dict) -> DataFrame:
        out = part
        fields = {
            f.get("field"): f for f in schema_doc.get("fields", [])
        }
        for img in images:
            fs = fields.get(img)
            if fs is None:
                out = out.withColumn(img, F.lit(None))
                continue
            out = out.withColumn(
                img, connect_decode_json(F.col(f"{img}_json"), fs)
            )
        return out

    parts = [
        _typed(env.filter(F.col("schema_json") == s), _json.loads(s))
        for s in versions
    ]
    parts.append(env.filter(F.col("schema_json").isNull()))
    out = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
    )
    out._env_cache = env  # release handle (see docstring)
    return out


def assign_unique_lsns(
    env: DataFrame,
    order_token: bool = False,
    cache: bool = True,
    guards: bool = True,
) -> DataFrame:
    """Enforce the log contract: UNIQUE lsn per event. Debezium
    positions can collide (tx-shared postgres LSN, ts_ms fallback) —
    disambiguate ties deterministically within each position group
    (partitioned window: scales, no global sort). Tie order: ts_ms,
    then the opaque source token when the frame carries one
    (``_order_token`` — SOURCE order for same-position bursts), then a
    content sha (determinism). Minted lsn = position*65536 + rank; 16
    bits of tie space bounds groups at 65536 events per position.

    Guards run BEFORE the shift: a tie group larger than the 16-bit
    tie space would overflow into the next position's range, and
    position*65536 needs max(position) < 2^47 (Spark arithmetic is
    non-ANSI-checked by default — a wrap would silently corrupt the
    total order the LWW dedupe relies on). Fail loudly instead.

    cache=True keeps the windowed frame cached for a downstream write
    (the import path); the caller unpersists via ``result._tie_cache``.
    cache=False recomputes the (deterministic) window per action —
    right for one-shot queries that must not leak cache entries;
    ``_tie_cache`` is still attached (the uncached frame, whose
    ``unpersist()`` is a harmless no-op) so the release protocol is
    valid on every path.

    guards=False skips the driver-side guard action entirely (one full
    evaluation of the input when uncached) — ONLY for callers that
    have proven both bounds by construction (tie groups < 65536 and
    positions < 2^47); the import path always guards."""
    from pyspark.sql.window import Window

    tie: list = [F.col("ts_ms")]
    if order_token:
        tie.append(F.col("_order_token"))
    tie.append(
        F.sha2(F.coalesce("after_json", "before_json", "message_json"), 256)
    )
    w = Window.partitionBy("lsn").orderBy(*tie)
    out = env.withColumn("_rn", F.row_number().over(w) - F.lit(1))
    if order_token:
        out = out.drop("_order_token")  # log schema stays fixed
    cached = out.cache() if cache else out
    if not guards:
        shifted = cached.withColumn(
            "lsn", F.col("lsn") * F.lit(65536) + F.col("_rn")
        ).drop("_rn")
        shifted._tie_cache = cached  # uncached frame: unpersist is a no-op
        return shifted
    guard = cached.agg(
        F.max("_rn").alias("max_rn"), F.max("lsn").alias("max_lsn")
    ).collect()[0]
    if guard["max_rn"] is not None and int(guard["max_rn"]) >= 65536:
        if cache:
            cached.unpersist()
        raise ValueError(
            f"assign_unique_lsns: {int(guard['max_rn']) + 1} events share "
            "one source position — exceeds the 65536-per-position tie "
            "space; supply a finer lsn_fields ordering for this connector"
        )
    if guard["max_lsn"] is not None and int(guard["max_lsn"]) >= 1 << 47:
        if cache:
            cached.unpersist()
        raise ValueError(
            f"assign_unique_lsns: max source position "
            f"{int(guard['max_lsn'])} >= 2^47 would overflow the 64-bit "
            "shifted LSN; rescale the source positions before import"
        )
    shifted = cached.withColumn(
        "lsn", F.col("lsn") * F.lit(65536) + F.col("_rn")
    ).drop("_rn")
    shifted._tie_cache = cached  # uncached frame: unpersist is a no-op
    return shifted


def import_to_log(
    spark: SparkSession,
    json_path: str,
    log_dir: str,
    lsn_fields: tuple[str, ...] = DEFAULT_LSN_FIELDS,
    lsn_buckets: int = 64,
    order_token_field: str | None = None,
    wire: str = "value",
) -> str:
    """One-shot conversion: Debezium JSON dump → bucketed parquet log
    (then the engine replays it like any other log). Bucket span is
    sized from the observed LSN range so the log lands in
    ~lsn_buckets partitions.

    order_token_field: opaque string position (Mongo resume tokens) —
    becomes the first tie-break within each coalesced numeric position,
    so same-ms bursts land in source order (see
    envelopes_from_value_json)."""
    env = from_json_lines(
        spark,
        json_path,
        wire=wire,
        lsn_fields=lsn_fields,
        order_token_field=order_token_field,
    )
    env = assign_unique_lsns(env, order_token=order_token_field is not None)
    cached = env._tie_cache
    lo, hi = env.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    if hi is None:
        # empty dump (or all Kafka tombstones, which the combined wire
        # drops) — fail with a clear message instead of int(None)
        cached.unpersist()
        raise ValueError(
            f"import_to_log: no envelope events found in {json_path!r} "
            "(empty dump, or every line was a tombstone/malformed)"
        )
    span = max(1, (int(hi) - int(lo) + 1) // lsn_buckets)
    env = env.withColumn(
        "lsn_bucket", ((F.col("lsn") - F.lit(int(lo))) / span).cast("long")
    )
    try:
        (
            env.repartition(lsn_buckets, F.col("lsn_bucket"))
            .sortWithinPartitions("lsn")
            .write.mode("overwrite")
            .partitionBy("lsn_bucket")
            .parquet(log_dir)
        )
    finally:
        cached.unpersist()
    return log_dir
