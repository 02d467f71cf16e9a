"""THE quality-gate derivation, shared by the batch curation pipeline
(jobs/curate.py stage 1 + its classifier weak labels) and the
incremental job (jobs/curate_incremental.py stage 1) so a threshold or
derivation change can never desync them — the same single-definition
discipline word_shingles_expr gives the gate/query/oracle trio.

The gate: n_words >= min_words, trigram repetition share
rep_max/rep_total <= max_rep_frac, alpha-word share >= min_alpha_frac —
integer cross-multiplied (no float thresholds, CLAUDE.md)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.functions.text import gopher_word_stats
from plugin_debezium_spark.operators.neardup import word_shingles_expr


def quality_gate_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """df + gopher word stats + per-doc trigram repetition stats
    (rep_max, rep_total): one explode → two-level groupBy, the only
    corpus-scale work the gate does."""
    tri = (
        df.select(
            F.col(id_col),
            F.explode(F.expr(word_shingles_expr(text_col, 3))).alias("tri"),
        )
        .groupBy(id_col, "tri")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("rep_max"), F.sum("c").alias("rep_total"))
    )
    return df.select(df["*"], *gopher_word_stats(text_col)).join(tri, id_col)


def quality_gate_predicate(
    min_words: int, max_rep_frac: float, min_alpha_frac: float
) -> Column:
    """Boolean gate over a quality_gate_stats frame."""
    rep_num, rep_den = max_rep_frac.as_integer_ratio()
    alpha_num, alpha_den = min_alpha_frac.as_integer_ratio()
    return (
        (F.col("n_words") >= min_words)
        & (F.col("rep_max") * rep_den <= F.col("rep_total") * rep_num)
        & (F.col("n_alpha_words") * alpha_den >= F.col("n_words") * alpha_num)
    )
