"""Corpus-frequency language-model quality proxy (CCNet-shaped).

CCNet buckets documents by language-model perplexity; the integer-exact
re-expression a SQL oracle can reproduce is corpus n-gram frequency:
text whose n-grams are common across the corpus is fluent/boilerplate,
text whose n-grams are globally rare is noise, gibberish, or unique
content. Emitted as integer components only (counts, never ratios or
logs) — the caller buckets on ``sum_freq * K <=> n_ngrams * T``
cross-multiplication, the same float-free threshold idiom as the rest
of the pipeline.

Scale shape: one explode → per-(doc, gram) pre-aggregate (map-side
combinable, bounds every later stage by DISTINCT grams per doc) →
corpus counts from that pre-aggregate (not from raw occurrences) →
one join back + per-doc aggregate. Ultra-common grams ("of the") skew
the join key; the pre-aggregate already collapses each doc's
repetitions to one row and AQE's skew-join split handles the rest —
never all-pairs, never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.neardup import word_shingles_expr


def ngram_lm_freq(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document corpus-frequency stats over word n-grams.

    One row per input doc (the whole-short-text shingle of
    ``word_shingles_expr`` guarantees ≥1 gram even for blank docs):

    - ``n_ngrams``  — the doc's n-gram occurrences
    - ``sum_freq``  — Σ over those occurrences of the gram's total
      corpus occurrence count (self included, so ≥ n_ngrams);
      ``sum_freq / n_ngrams`` is the doc's mean corpus frequency —
      the perplexity proxy
    - ``n_common``  — occurrences whose gram appears ≥2 times in the
      corpus (the CCNet "seen elsewhere" share numerator)
    """
    from pyspark.sql.window import Window

    grams = docs.select(
        F.col(id_col),
        F.explode(F.expr(word_shingles_expr(text_col, n))).alias("_g"),
    )
    dg = grams.groupBy(id_col, "_g").agg(F.count("*").alias("_k"))
    # corpus frequency as a window sum over the pre-aggregate: the
    # previous groupBy(_g)+join formulation evaluated the whole
    # explode+pre-aggregate subtree TWICE (Spark does no cross-DAG
    # CSE) and paid a join exchange on top — the window computes the
    # same per-gram total in one pass over dg with one exchange.
    # Partition size is bounded by distinct (doc, gram) rows per gram,
    # the same bound the join's build side had.
    cf = F.sum("_k").over(Window.partitionBy("_g"))
    return (
        dg.withColumn("_cf", cf)
        .groupBy(id_col)
        .agg(
            F.sum("_k").cast("long").alias("n_ngrams"),
            F.sum(F.col("_k") * F.col("_cf")).cast("long").alias("sum_freq"),
            F.sum(F.when(F.col("_cf") >= 2, F.col("_k")).otherwise(0))
            .cast("long")
            .alias("n_common"),
        )
    )
