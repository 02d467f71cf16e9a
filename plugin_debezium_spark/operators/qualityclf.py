"""Hashed-feature linear quality classifier (fastText shape).

The supervised complement to the heuristic quality signals
(functions/text.py gopher stats) and the LM-frequency proxy
(operators/lmscore.py): a linear classifier over hashed bag-of-words
features — the fastText architecture (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification": hashed uni/bi-gram features
into a fixed-width table, linear scoring), which is exactly the model
class used for CommonCrawl quality filtering in public LLM-data
pipelines (e.g. the CCNet / LLaMA-style "is this page
Wikipedia-reference-like?" filter).

Everything is integer-exact so Spark and a SQL oracle agree
bit-for-bit:

- feature bucket = sha_bigint(gram) mod n_buckets (the engine-neutral
  sha convention shared with operators/neardup.py);
- training is count-native: weight(b) = occurrences of bucket b in
  positive-label docs − occurrences in negative docs (the unsmoothed
  integer analogue of naive-Bayes log-odds — monotone in the same
  evidence, no floats);
- score(doc) = Σ_b tf(doc, b) · weight(b), a BIGINT dot product.

Scale shape (100 TB): training = explode grams → one groupBy(bucket)
with map-side combine (partial sums bound shuffle rows at
n_buckets·partitions, NOT corpus tokens); the trained model is
≤ n_buckets rows (2^18 default ≈ 4 MB) → broadcast at scoring;
scoring pre-aggregates tf per (doc, bucket) before probing the
broadcast so probe count is distinct-buckets-per-doc, not raw tokens.
No UDFs, no driver-side loops, whole plan stays in codegen.

Reference note: the reference engine has no classifier counterpart —
this extends the data-ops suite the same way lmscore.py does; the
fastText shape is cited from the public paper only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.neardup import sha_bigint

#: filtered word array shared by every derivation in this module (and
#: mirrored verbatim by the DuckDB oracles): non-empty whitespace splits
_WORDS = "filter(split(trim({col}), '\\\\s+'), x -> length(x) > 0)"


def word_grams_expr(text_col: str, max_n: int = 2) -> str:
    """SQL-text array of word n-grams for n = 1..max_n over the
    FILTERED word array (empty tokens dropped — unlike
    neardup.word_shingles_expr, which keeps split() raw for minhash
    parity). n-grams of an order longer than the doc contribute
    nothing (no padded/degenerate grams)."""
    w = _WORDS.format(col=text_col)
    parts = []
    for n in range(1, max_n + 1):
        parts.append(
            f"CASE WHEN size({w}) >= {n} THEN "
            f"transform(sequence(1, size({w}) - {n - 1}), "
            f"i -> array_join(slice({w}, i, {n}), ' ')) "
            "ELSE array() END"
        )
    return "concat(" + ", ".join(parts) + ")"


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    max_ngram: int = 2,
) -> DataFrame:
    """(id, bucket, tf): term frequencies of hashed word n-grams.
    One explode + one groupBy (map-side combined)."""
    grams = df.select(
        F.col(id_col),
        F.explode(F.expr(word_grams_expr(text_col, max_ngram))).alias("g"),
    )
    return (
        grams.withColumn(
            "bucket", F.pmod(sha_bigint(F.col("g")), F.lit(n_buckets))
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def train_linear_classifier(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Count-native training: (bucket, weight) with
    weight = Σ tf over label=1 docs − Σ tf over label=0 docs.
    ``labels`` carries one 0/1 row per doc (weak labels from a
    heuristic gate, or human labels). Output is ≤ n_buckets rows —
    the broadcastable model."""
    j = feats.join(labels.select(id_col, label_col), id_col)
    return (
        j.groupBy("bucket")
        .agg(
            F.sum(
                F.when(F.col(label_col) == 1, F.col("tf")).otherwise(0)
            ).alias("_pos"),
            F.sum(
                F.when(F.col(label_col) == 0, F.col("tf")).otherwise(0)
            ).alias("_neg"),
        )
        .select(
            "bucket", (F.col("_pos") - F.col("_neg")).alias("weight")
        )
    )


def score_documents(
    feats: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, clf_score): BIGINT dot product of the doc's hashed tf
    vector with the weight table. Broadcast left join — docs sharing
    no bucket with the model (possible on held-out corpora) score 0."""
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(
                F.sum(F.col("tf") * F.col("weight")), F.lit(0)
            )
            .cast("long")
            .alias("clf_score")
        )
    )
