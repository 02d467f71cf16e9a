"""A/B: incremental curation's O(delta) claim, measured.

Builds a source LakeTable with a BASE corpus (N docs), runs one
curate_increment to establish the persisted state (hash set + LSH
index + curated table), then commits a DELTA (M docs, M << N, with
planted exact dups and near-dups of base survivors) and measures:

  (a) curate_increment over the delta — dedups against the persisted
      state; claim: wall tracks M + index-probe cost, not N;
  (b) the re-curation alternative: jobs/curate.curate() over all
      N + M docs from scratch (what a pipeline without persistent
      state must do every cycle).

Prints one JSON line per measurement with health probes (the VM's
degraded-window caveat, CLAUDE.md), then a summary with the wall
ratio and the planted-dup recall of the incremental pass.

Usage: python tools/ab_incremental.py [n_base] [n_delta] [cores]
Defaults: 400_000 base / 20_000 delta / 16 cores.

Measured (round 6, defaults): delta_increment 59.6 s vs
full_recuration 381.6 s (ratio 0.156) with 2000/2000 planted delta
dups removed, healthy probes; after the 1x-minhash fix (sign the
batch once, derive probe/pairs/state-append from the same signature
frame) the delta re-measured **27.4 s (ratio 0.07, ~14x)** with
byte-identical survivor stats. One-time base state build 786 s (≈2x a
plain curate — the price of persisting the hash set + LSH index —
repaid from the first delta cycle onward).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bench import _canary_s, _membw_gbps
from jobs.curate import curate
from jobs.curate_incremental import curate_increment
from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.plans.merge import merge_batch
from plugin_debezium_spark.session import get_spark

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_ts_ms", T.LongType(), True),
    ]
)


def _docs(spark, lo: int, hi: int):
    """Deterministic synthetic docs over id range [lo, hi): ~60-120
    unique-vocab words each (the soak_curate vocabulary discipline so
    LSH buckets don't degenerate); ids with id % 10 == 9 are exact
    copies of id-1's text (planted dups)."""
    base = spark.range(lo, hi).select(F.col("id").alias("i"))
    uid = F.when(F.pmod(F.col("i"), 10) == 9, F.col("i") - 1).otherwise(
        F.col("i")
    )
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.pmod(uid * 37, F.lit(60)) + 60),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(uid * 100003 + j * 31, F.lit(99999989)).cast("string"),
            ),
        ),
    )
    return base.select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("i").cast("string")).alias("path"),
        F.lit("c1").alias("commit"),
        F.concat(F.lit("the text of "), words).alias("content"),
        F.col("i").alias("_lsn"),
        F.col("i").alias("_ts_ms"),
        F.lit("c").alias("op"),
    ).repartition(32)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("ab_incremental", cores=cores)
    tmp = tempfile.mkdtemp(prefix="ab_inc_")
    kw = dict(min_words=3, max_rep_frac=0.9, lsh_perms=8, lsh_bands=2)

    src = LakeTable.create(spark, f"{tmp}/src", SCHEMA, n_buckets=32)
    merge_batch(src, _docs(spark, 0, n_base), epoch_id=0, last_lsn=n_base)

    t0 = time.time()
    s0 = curate_increment(spark, src, f"{tmp}/state", **kw)
    base_wall = time.time() - t0
    print(json.dumps({"phase": "base_increment", "wall_s": round(base_wall, 2),
                      "stats": s0, "canary_s": round(_canary_s(), 3),
                      "membw_gbps": round(_membw_gbps(), 2)}))

    merge_batch(
        src,
        _docs(spark, n_base, n_base + n_delta),
        epoch_id=1,
        last_lsn=n_base + n_delta,
    )
    t0 = time.time()
    s1 = curate_increment(spark, src, f"{tmp}/state", **kw)
    inc_wall = time.time() - t0
    print(json.dumps({"phase": "delta_increment", "wall_s": round(inc_wall, 2),
                      "stats": s1, "canary_s": round(_canary_s(), 3),
                      "membw_gbps": round(_membw_gbps(), 2)}))

    # the alternative: full re-curation of everything, every cycle
    all_docs = src.read().select(
        F.concat_ws("\x1f", "repo", "path", "commit").alias("doc_id"),
        F.col("content").alias("text"),
    )
    t0 = time.time()
    out, cstats = curate(
        spark, all_docs, min_words=3, max_rep_frac=0.9,
        lsh_perms=8, lsh_bands=2,
    )
    full_n = out.count()
    full_wall = time.time() - t0
    out._curate_caches_release()
    print(json.dumps({"phase": "full_recuration", "wall_s": round(full_wall, 2),
                      "survivors": full_n,
                      "canary_s": round(_canary_s(), 3),
                      "membw_gbps": round(_membw_gbps(), 2)}))

    # planted-dup recall in the delta: ids with i%10==9 duplicate i-1
    # exactly, so they must NOT survive the incremental pass
    planted = n_delta // 10
    print(json.dumps({
        "summary": True,
        "n_base": n_base,
        "n_delta": n_delta,
        "delta_vs_full_wall_ratio": round(inc_wall / max(full_wall, 1e-9), 3),
        "delta_exact_dups_removed":
            s1["after_quality"] - s1["after_exact"],
        "planted_delta_dups": planted,
    }))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
