"""A/B the round-3 rewrites of simhash and ivf_assign at a corpus
size where the operator dominates fixture overhead (round-4 verdict
item 2: the 500-doc sf0.1 cells moved 0.82->1.25 s and 0.64->1.06 s
AGAINST the expected direction; prove which formulation wins when the
operator is the workload).

Usage: python tools/ab_simhash_ivf.py [n_docs] [n_vecs] [reps]
Defaults: 200_000 docs x ~120 tokens, 400_000 vecs x 64 dims, 3 reps.
Prints one JSON line per (op, variant) with best-of wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from plugin_debezium_spark.operators.neardup import sha_bigint, simhash
from plugin_debezium_spark.operators.similarity import (
    dot_over_norms,
    ivf_assign,
    norm_expr,
)
from plugin_debezium_spark.session import get_spark


def simhash_r2(df: DataFrame, text_col="text", id_col="doc_id", n_bits=16):
    """The round-2 formulation: explode tokens x bits (n_bits x the
    token count shuffled) then one sum per (doc, bit). Kept ONLY as
    the A/B control for the round-3 single-aggregate rewrite."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", sha_bigint(F.col("tok")))
    bits = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("b"),
        F.col("h"),
    ).withColumn(
        "vote",
        F.when(F.expr("(h >> b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    votes = bits.groupBy(id_col, "b").agg(F.sum("vote").alias("v"))
    return (
        votes.withColumn(
            "term",
            F.when(
                F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), b)")
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .groupBy(id_col)
        .agg(F.sum("term").alias("simhash"))
    )


def ivf_assign_r2(df, centroids, id_col="vec_id", vec_col="embedding"):
    """Round-2 formulation: row_number window over corpus x centroids
    (full shuffle+sort of every scored row). A/B control only."""
    c = centroids.select(
        F.col("cid"),
        F.col("centroid").alias("_cvec"),
        F.expr(norm_expr("centroid")).alias("_cn"),
    )
    scored = (
        df.withColumn("_vn", F.expr(norm_expr(vec_col)))
        .join(F.broadcast(c))
        .withColumn(
            "_ccos", F.expr(dot_over_norms(vec_col, "_cvec", "_vn", "_cn"))
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_ccos"), F.asc("cid"))
    return (
        scored.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= 1)
        .drop("_cvec", "_cn", "_vn", "_ccos", "_crank")
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_cents = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    only = os.environ.get("AB_ONLY", "")  # substring filter on variant names
    spark = get_spark("ab-simhash-ivf", cores=16)

    # ---- corpora (deterministic, materialized to parquet so every
    # variant scans identical bytes; ~120 tokens/doc from a 4k vocab)
    tmp = "/tmp/ab_simhash_ivf"
    docs_path = f"{tmp}/docs_{n_docs}"
    vecs_path = f"{tmp}/vecs_{n_vecs}"
    cents_path = f"{tmp}/cents_{n_cents}"
    if not os.path.exists(docs_path):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(120)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.col("id") * F.lit(31) + i * F.lit(7), F.lit(4096)
                        ),
                    ),
                ),
            ).alias("text"),
        )
        docs.repartition(32).write.mode("overwrite").parquet(docs_path)
    if not os.path.exists(vecs_path):
        vecs = spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    F.pmod(F.col("id") * F.lit(13) + i * F.lit(17), F.lit(1000))
                    / F.lit(500.0)
                    - F.lit(1.0)
                ).cast("float"),
            ).alias("embedding"),
        )
        vecs.repartition(32).write.mode("overwrite").parquet(vecs_path)
    if not os.path.exists(cents_path):
        cents = spark.range(n_cents).select(
            F.col("id").alias("cid"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    F.pmod(F.col("id") * F.lit(29) + i * F.lit(11), F.lit(1000))
                    / F.lit(500.0)
                    - F.lit(1.0)
                ).cast("float"),
            ).alias("centroid"),
        )
        cents.write.mode("overwrite").parquet(cents_path)

    docs = spark.read.parquet(docs_path)
    vecs = spark.read.parquet(vecs_path)
    cents = spark.read.parquet(cents_path)

    variants = {
        "simhash_r3_single_agg": lambda: simhash(docs),
        "simhash_r2_bits_explode": lambda: simhash_r2(docs),
        "ivf_assign_r3_max_by": lambda: ivf_assign(vecs, cents),
        "ivf_assign_r2_window": lambda: ivf_assign_r2(vecs, cents),
        "ivf_assign_r4_numpy": lambda: ivf_assign(vecs, cents, impl="numpy"),
    }
    if only:
        variants = {k: v for k, v in variants.items() if only in k}
    # warm up scans/codegen once
    docs.count(), vecs.count(), cents.count()

    results = {}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            results.setdefault(name, []).append(round(w, 3))
    out = {
        name: {"best": min(ws), "all": ws} for name, ws in results.items()
    }
    out["n_docs"] = n_docs
    out["n_vecs"] = n_vecs
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
