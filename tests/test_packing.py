"""Deterministic sequence packing (operators/packing.pack_sequences).

The invariants that make packed output trainer-usable: the per-doc
offsets tile the concatenated token stream exactly (no gaps, no
overlaps), the result is a pure function of the corpus (invariant to
input partitioning AND to the bucket_bits scale knob), zero-token docs
occupy nothing, and block bounds match the trainer's chunker
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plugin_debezium_spark.functions.text import bpe_ish_token_count
from plugin_debezium_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _docs(spark, n=200, blanks=(7, 13)):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id").isin(*blanks), F.lit("   ")).otherwise(
            F.concat(
                F.lit("tok "),
                F.repeat(F.lit("w "), (F.pmod(F.col("id"), 37)).cast("int")),
                F.col("id").cast("string"),
            )
        ).alias("text"),
    )


def test_offsets_tile_the_stream_exactly(spark):
    packed = pack_sequences(_docs(spark), block_tokens=16).collect()
    rows = sorted(packed, key=lambda r: (r["tok_offset"], r["doc_id"]))
    pos = 0
    for r in rows:
        if r["n_tokens"] == 0:
            assert r["first_block"] is None and r["last_block"] is None
            continue
        assert r["tok_offset"] == pos, (r, pos)
        assert r["first_block"] == pos // 16
        assert r["last_block"] == (pos + r["n_tokens"] - 1) // 16
        pos += r["n_tokens"]
    assert pos == sum(r["n_tokens"] for r in packed)


def test_invariant_to_bucket_bits_and_partitioning(spark):
    docs = _docs(spark)
    ref = sorted(
        tuple(r) for r in pack_sequences(docs, 16, bucket_bits=8).collect()
    )
    for variant in (
        pack_sequences(docs, 16, bucket_bits=4),
        pack_sequences(docs, 16, bucket_bits=13),  # non-multiple of 4
        pack_sequences(docs.repartition(17), 16, bucket_bits=8),
        pack_sequences(docs.coalesce(1), 16, bucket_bits=8),
    ):
        assert sorted(tuple(r) for r in variant.collect()) == ref


def test_salt_redraws_the_order_but_not_the_tokens(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r for r in pack_sequences(docs, 16).collect()}
    b = {
        r["doc_id"]: r
        for r in pack_sequences(docs, 16, salt="pack:v2").collect()
    }
    assert all(a[k]["n_tokens"] == b[k]["n_tokens"] for k in a)
    assert any(a[k]["tok_offset"] != b[k]["tok_offset"] for k in a)


def test_custom_token_counter(spark):
    docs = _docs(spark)
    packed = pack_sequences(
        docs, 16, tokens=bpe_ish_token_count("text")
    ).collect()
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_ish_token_count("text").alias("n")
        ).collect()
    }
    assert {r["doc_id"]: r["n_tokens"] for r in packed} == want


def test_packing_stats(spark):
    packed = pack_sequences(_docs(spark), block_tokens=16)
    s = packing_stats(packed, block_tokens=16).collect()[0]
    rows = packed.collect()
    total = sum(r["n_tokens"] for r in rows)
    assert s["total_tokens"] == total
    assert s["full_blocks"] == total // 16
    assert s["straddling_docs"] == sum(
        1
        for r in rows
        if r["n_tokens"] > 0 and r["last_block"] > r["first_block"]
    )


def test_grouped_packing_equals_per_group_ungrouped(spark):
    """group_cols packs each group as its own stream: identical to
    running pack_sequences separately on each group's filtered subset."""
    docs = _docs(spark).withColumn(
        "grp", (F.pmod(F.col("doc_id"), 3)).cast("string")
    )
    grouped = sorted(
        tuple(r)
        for r in pack_sequences(docs, 16, group_cols=("grp",)).collect()
    )
    separate = []
    for g in ("0", "1", "2"):
        for r in pack_sequences(docs.filter(F.col("grp") == g), 16).collect():
            separate.append((g, *tuple(r)))
    assert grouped == sorted(separate)
