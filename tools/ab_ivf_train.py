"""A/B train_ivf_centroids full-corpus vs sample_mod seeding at a
corpus size where the k-1 farthest-point passes dominate (round-5
verdict item 4: at 10^10 rows seeding would scan everything k-1 times
before Lloyd even starts; sample_mod=M seeds+trains on the
content-addressed 1/M hash-sample and leaves the final full-corpus
assign to the caller).

Usage: python tools/ab_ivf_train.py [n_vecs] [k] [iters] [sample_mod] [reps]
Defaults: 400_000 vecs x 64 dims, k=16, iters=3, sample_mod=16, 2 reps.
Prints one JSON line per variant with best-of wall seconds plus the
centroid-set cosine agreement between the two trainings (how far the
sample-trained quantizer drifts from the full-corpus one).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.similarity import train_ivf_centroids
from plugin_debezium_spark.session import get_spark


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sample_mod = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    spark = get_spark("ab-ivf-train", cores=16)

    # same deterministic vectors parquet as ab_simhash_ivf.py
    tmp = "/tmp/ab_simhash_ivf"
    vecs_path = f"{tmp}/vecs_{n_vecs}"
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
    vecs = spark.read.parquet(vecs_path)
    vecs.count()  # warm scan

    variants = {
        "train_full": lambda: train_ivf_centroids(vecs, k=k, iters=iters),
        f"train_sample_mod{sample_mod}": lambda: train_ivf_centroids(
            vecs, k=k, iters=iters, sample_mod=sample_mod
        ),
    }
    walls: dict[str, float] = {}
    cents: dict[str, np.ndarray] = {}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            out = fn().orderBy("cid").collect()
            wall = round(time.time() - t0, 2)
            if name not in walls or wall < walls[name]:
                walls[name] = wall
            cents[name] = np.stack(
                [np.asarray(r["centroid"], dtype=np.float64) for r in out]
            )
            print(
                json.dumps({"variant": name, "rep": rep, "wall_s": wall}),
                flush=True,
            )
    # agreement: for each full-trained centroid, its best cosine
    # against the sample-trained set (1.0 = identical quantizer)
    a, b = cents["train_full"], cents[f"train_sample_mod{sample_mod}"]
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    agree = (an @ bn.T).max(axis=1)
    print(
        json.dumps(
            {
                "best_of": walls,
                "speedup": round(
                    walls["train_full"]
                    / walls[f"train_sample_mod{sample_mod}"],
                    2,
                ),
                "centroid_agreement_min_cos": round(float(agree.min()), 4),
                "centroid_agreement_mean_cos": round(float(agree.mean()), 4),
                "n_vecs": n_vecs,
                "k": k,
                "iters": iters,
                "sample_mod": sample_mod,
            }
        )
    )


if __name__ == "__main__":
    main()
