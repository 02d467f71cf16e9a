"""Curation-pipeline soak: the full training-data path end-to-end at
operator-dominant scale — quality gate → exact dedup → MinHash-LSH
near-dup components → per-source quota → split → per-split packing —
over a synthetic corpus with planted duplicates and a hot source.

Usage: python tools/soak_curate.py [n_docs] [cores]
Defaults: 1_000_000 docs (~120 words each), 16 cores. Prints one JSON
line with wall, stage counts, probes, and closed-form invariant checks
(planted exact-dup survivors, quota cap, per-split tiling).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _canary_s, _membw_gbps
from jobs.curate import curate
from plugin_debezium_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("soak_curate", cores=cores)
    # corpus: 90% unique texts, 10% planted exact duplicates (id % 10
    # == 9 copies id-1's text), hot source holds 30% of docs
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    uid = F.when(
        F.pmod(F.col("doc_id"), 10) == 9, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    # word vocabulary must be LARGE (~1e8) or every doc shares the
    # same few thousand shingles and LSH buckets degenerate into
    # pair explosions that no real corpus exhibits
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.pmod(uid * 37, F.lit(60)) + 60),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(uid * 100003 + i * 31, F.lit(99999989)).cast("string"),
            ),
        ),
    )
    docs = base.select(
        "doc_id",
        F.concat(F.lit("the text of "), words).alias("text"),
        F.when(F.pmod(F.col("doc_id"), 10) < 3, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("s"), F.pmod(F.col("doc_id"), 997).cast("string"))
        )
        .alias("source"),
    ).repartition(64)
    docs.cache().count()
    probes0 = {"canary_s": _canary_s(), "membw_gbps": _membw_gbps()}
    quota = max(1000, n_docs // 2000)
    t0 = time.time()
    out, stats = curate(
        spark,
        docs,
        min_words=5,
        max_rep_frac=0.9,
        source_quota=quota,
        pack_block_tokens=2048,
    )
    out = out.cache()
    n_out = out.count()
    wall = time.time() - t0
    # invariants
    cap_viol = (
        out.groupBy("source")
        .count()
        .filter(F.col("count") > quota)
        .count()
    )
    tile = (
        out.groupBy("split")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max(F.col("tok_offset") + F.col("n_tokens")).alias("end"),
        )
        .filter(F.col("tot") != F.col("end"))
        .count()
    )
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "cores": cores,
                "wall_s": round(wall, 1),
                "docs_per_sec": round(n_docs / wall),
                "stats": stats,
                "written": n_out,
                "quota": quota,
                "quota_violations": cap_viol,
                "splits_not_tiled": tile,
                "probes_before": probes0,
                "canary_s": round(_canary_s(), 3),
                "membw_gbps": round(_membw_gbps(), 2),
            }
        ),
        flush=True,
    )
    assert cap_viol == 0 and tile == 0


if __name__ == "__main__":
    main()
