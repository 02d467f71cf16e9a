"""Training-set decontamination and cross-document boilerplate stats.

Two standard pre-training hygiene passes a 100 TB pipeline runs before
anything else:

- ``ngram_overlap``: flag training documents that share word n-grams
  with a held-out evaluation set (the GPT-3/PaLM-style "13-gram
  decontamination" check). Implemented as distinct-shingle inner join
  → per-doc hit count: the contamination side is usually tiny
  (benchmarks), so Spark broadcasts it and the pass is one corpus
  scan; when it isn't, the same plan degrades gracefully to a shuffle
  hash join on the shingle key. Never all-pairs, never per-row Python.

- ``duplicate_line_stats``: CCNet-style per-document duplicate-line
  share — lines repeated across the corpus are boilerplate
  (headers, nav bars, license blocks); documents dominated by them get
  filtered or line-stripped. One explode → global line-hash count
  (map-side combinable) → per-doc aggregate.

Both emit integer components only (counts, not ratios) so a DuckDB
oracle agrees bit-for-bit; thresholds apply via integer
cross-multiplication downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.neardup import word_shingles_expr


def ngram_overlap(
    docs: DataFrame,
    contamination: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination check: how many of the doc's
    DISTINCT word n-grams appear anywhere in the contamination set.

    Output: (id_col, n_shingles, contam_hits) — one row per input
    doc, contam_hits = 0 for clean docs. A caller drops docs where
    ``contam_hits * K >= n_shingles`` (integer threshold) or any
    hits at all for strict eval hygiene.

    Scale shape: docs-side shingles are exploded DISTINCT per doc
    (bounded by words-per-doc), contamination-side shingles collapse
    to a global DISTINCT set (tiny for real benchmarks → broadcast
    hash join; AQE picks the strategy from measured size). The join
    output is only the hits, not the cross product."""
    # NULL text shingles to [NULL] in Spark (transform over a null
    # array) but to zero rows in DuckDB's unnest — drop NULL shingles
    # so both engines agree the doc has zero shingles.
    d_sh = (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(word_shingles_expr(text_col, n))).alias("_sh"),
        )
        .filter(F.col("_sh").isNotNull())
        .distinct()
    )
    c_sh = (
        contamination.select(
            F.explode(F.expr(word_shingles_expr(text_col, n))).alias("_sh")
        )
        .filter(F.col("_sh").isNotNull())
        .distinct()
    )
    # ONE pass over the doc shingles: a LEFT join against the distinct
    # contamination set (≤1 match per row, so multiplicities are
    # preserved) lets the total count and the hit count ride the same
    # aggregate — the previous per_doc/hits split evaluated the
    # explode+distinct subtree twice (no cross-DAG CSE) and joined the
    # two aggregates back together.
    marked = d_sh.join(
        c_sh.withColumn("_hit", F.lit(1)), "_sh", "left"
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("contam_hits"),
    )
    # join counts back onto the full doc-id spine: a NULL/empty text
    # column explodes to zero shingle rows, and without the spine such
    # docs would vanish from the output (and be DELETED by curate.py's
    # left_semi at the decontamination stage) despite being trivially
    # clean. "One row per input doc" is the contract.
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0).cast("long")).alias(
                "n_shingles"
            ),
            F.coalesce("contam_hits", F.lit(0).cast("long")).alias(
                "contam_hits"
            ),
        )
    )


def remove_duplicate_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Cross-document exact duplicate-paragraph REMOVAL (the
    MassiveText/CCNet rewrite pass): where ``duplicate_line_stats``
    only counts boilerplate, this rewrites every document with
    corpus-wide duplicate paragraphs stripped, keeping one canonical
    occurrence.

    Keep rule (deterministic, oracle-exact):
      an occurrence (doc, pos, para) survives iff
        * pos is the doc's FIRST occurrence of that paragraph
          (within-doc dedupe), and
        * the doc is the MINIMAL ``id_col`` among all docs containing
          the paragraph (cross-doc canonical keeper — the duplicate's
          text lives on exactly once, in the lowest-id doc).
      Unique paragraphs trivially satisfy both and always survive.

    Paragraphs are trimmed segments of ``split(text, sep)`` with
    length >= ``min_chars`` (blank-segment noise dropped — same
    normalization as ``duplicate_line_stats``).

    Output: one row per input doc (spine join — NULL/empty text
    yields n_paras=0 and an empty rewrite, never a dropped row):
    (id_col, n_paras, kept_paras, text_dedup) with the rewrite
    reassembled in original paragraph order.

    Scale shape: posexplode → two map-side-combinable groupBys
    ((doc, para) first-occurrence, then (para) min-doc) → one shuffle
    join on the paragraph key → per-doc sorted reassembly bounded by
    doc size. Never all-pairs, never per-row Python; for corpora with
    very long paragraphs, key the canonical groupBy/join on
    ``sha2(para, 256)`` instead of the raw string to shrink shuffle
    keys (both engines compute identical sha256, so the oracle
    still agrees)."""
    p = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias(
                "_pos", "_para"
            ),
        )
        .select(id_col, "_pos", F.trim(F.col("_para")).alias("_para"))
        .filter(F.length("_para") >= min_chars)
    )
    n_paras = p.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    first_in_doc = p.groupBy(id_col, "_para").agg(
        F.min("_pos").alias("_pos")
    )
    canon = first_in_doc.groupBy("_para").agg(
        F.min(id_col).alias("_canon_doc")
    )
    kept = first_in_doc.join(canon, "_para").filter(
        F.col(id_col) == F.col("_canon_doc")
    )
    rewritten = kept.groupBy(id_col).agg(
        F.count("*").alias("kept_paras"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_para"))
                ),
                lambda x: x["_para"],
            ),
            sep,
        ).alias("text_dedup"),
    )
    return (
        docs.select(id_col)
        .join(n_paras, id_col, "left")
        .join(rewritten, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_paras", F.lit(0).cast("long")).alias("n_paras"),
            F.coalesce("kept_paras", F.lit(0).cast("long")).alias(
                "kept_paras"
            ),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def duplicate_line_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """Per-document duplicate-line share vs the WHOLE corpus.

    A line is "duplicated" when its trimmed text occurs in more than
    one document (distinct-doc count ≥ 2 — within-doc repeats don't
    count, matching CCNet's cross-document boilerplate notion).
    Output: (id_col, n_lines, dup_lines) with integer counts; the
    dup share is one division away.

    Scale shape: explode to (doc, line) pairs, distinct, then a
    line-key groupBy whose map-side combine collapses per-partition
    repeats before the shuffle; the per-doc rollup rides the same
    distinct frame. Lines shorter than ``min_line_chars`` after trim
    are ignored (blank-line noise)."""
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
    ).select(id_col, F.trim(F.col("_line")).alias("_line"))
    lines = lines.filter(F.length("_line") >= min_line_chars)
    doc_lines = lines.distinct()
    global_counts = doc_lines.groupBy("_line").agg(
        F.count("*").alias("_docs_with_line")
    )
    joined = doc_lines.join(global_counts, "_line")
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(
            F.when(F.col("_docs_with_line") >= 2, F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("dup_lines"),
    )
