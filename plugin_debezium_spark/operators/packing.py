"""Deterministic sequence packing for training-data pipelines.

The GPT-style "concat and chunk" step: documents are laid end-to-end
in a deterministic, content-addressed order and cut into fixed-size
training blocks of ``block_tokens`` tokens. Each document's placement
is a pure function of the corpus — stable across runs, engines,
partitionings, and cluster sizes — so the tokenized dataset a trainer
reads is reproducible bit-for-bit (the property a random shuffle +
mapPartitions pack lacks).

Scale design (the part Spark doesn't give you for free): a global
running sum over a total order is a SINGLE window partition if written
naively — one task holding the whole corpus at 10^10 docs. Instead the
total order is ``sha256(salt || id)`` and its leading ``bucket_bits``
bits are the partition key: (bucket, sha) order equals sha order
because the bucket IS the hash's prefix. The cumulative sum runs
per-bucket (each bucket ~n/2^bits rows, one shuffle), the 2^bits
bucket totals feed a driver-size prefix-sum (a window over ≤65k rows),
and a broadcast join adds each bucket's global base offset. Two
shuffles total, no partition ever sees more than a 2^-bits fraction of
the corpus; raise ``bucket_bits`` with corpus size (16 bits → ~150k
rows per bucket at 10^10 docs).

No counterpart in the reference (a CDC plugin); this is a first-class
training-data operator alongside operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from plugin_debezium_spark.functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    block_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: Column | None = None,
    salt: str = "pack:v1",
    bucket_bits: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every document its span in the packed token stream.

    Output, one row per input doc (zero-token docs keep their row with
    NULL block bounds — they occupy no tokens):

    - ``n_tokens``   — token count (whitespace tokenizer by default;
      pass ``tokens`` to plug in a different counter expression)
    - ``tok_offset`` — the doc's first token's position in the global
      concatenated stream (0-based)
    - ``first_block`` / ``last_block`` — the fixed-size training
      blocks the doc lands in (``tok_offset // block_tokens`` …
      ``(tok_offset + n_tokens - 1) // block_tokens``); a doc spanning
      more than one block is split across them, exactly like the
      trainer's chunker will split it

    ``salt`` draws an independent deterministic shuffle order (same
    content-addressed trick as functions/text.hash_split); change it
    to re-shuffle the corpus between epochs without losing
    reproducibility.

    ``group_cols`` packs each group as its OWN token stream (offsets
    restart per group) — e.g. per train/val/test split, per language:
    the group keys join every partition/prefix stage, so the per-group
    prefix frame stays ≤2^bits rows per group and groups never
    interleave.
    """
    if not 1 <= bucket_bits <= 28:
        raise ValueError(f"bucket_bits out of range: {bucket_bits}")
    if block_tokens < 1:
        raise ValueError(f"block_tokens must be >= 1: {block_tokens}")
    idc = F.col(id_col)
    n_tok = (tokens if tokens is not None else token_count(text_col)).cast(
        "long"
    )
    # content-addressed total order + its prefix as the partition key;
    # hex chars carry 4 bits each, so take ceil(bits/4) chars and mask
    n_hex = (bucket_bits + 3) // 4
    order_key = F.sha2(F.concat(F.lit(salt), idc.cast("string")), 256)
    bucket = F.shiftright(
        F.conv(F.substring(order_key, 1, n_hex), 16, 10).cast("long"),
        4 * n_hex - bucket_bits,
    ).alias("_bucket")
    g = list(group_cols)
    base = docs.select(
        *g,
        idc.alias("_id"), n_tok.alias("n_tokens"), order_key.alias("_ok"),
        bucket,
    )
    w = (
        Window.partitionBy(*g, "_bucket")
        .orderBy("_ok", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn(
        "_off_in", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    totals = base.groupBy(*g, "_bucket").agg(
        F.sum("n_tokens").alias("_btot")
    )
    wp = (
        Window.partitionBy(*g) if g else Window
    ).orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤2^bucket_bits rows per group: a driver-size frame per task
    prefix = totals.select(
        *g,
        "_bucket",
        F.coalesce(F.sum("_btot").over(wp), F.lit(0)).alias("_base"),
    )
    off = F.col("_base") + F.col("_off_in")
    nz = F.col("n_tokens") > 0
    bt = F.lit(block_tokens).cast("long")
    return (
        within.join(F.broadcast(prefix), g + ["_bucket"])
        .select(
            *g,
            F.col("_id").alias(id_col),
            "n_tokens",
            off.cast("long").alias("tok_offset"),
            F.when(nz, F.floor(off / bt)).cast("long").alias("first_block"),
            F.when(nz, F.floor((off + F.col("n_tokens") - 1) / bt))
            .cast("long")
            .alias("last_block"),
        )
    )


def packing_stats(packed: DataFrame, block_tokens: int) -> DataFrame:
    """Corpus-level packing summary from ``pack_sequences`` output:
    total tokens, number of full blocks, docs straddling a block
    boundary (each straddler costs the trainer one attention-mask
    reset or one cross-doc leak, depending on the collator)."""
    return packed.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
        F.floor(
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            / F.lit(block_tokens).cast("long")
        )
        .cast("long")
        .alias("full_blocks"),
        F.coalesce(
            F.sum(
                F.when(F.col("last_block") > F.col("first_block"), 1).otherwise(
                    0
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("straddling_docs"),
    )
