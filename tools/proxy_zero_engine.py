"""Zero-engine Spark proxy (round-2 methodology, now committed so the
measurement is reproducible round to round).

Pushes the bench log's data volume through plain DataFrame ops with NO
engine code: parquet scan → parse_json → columnar cache → variant cast
+ sha256 → bucket repartition → parquet write. This is the workload
CLASS's hardware ceiling on this host (BENCH/BASELINE.md "Scaling
residual attribution"): if THIS number moves between rounds on an
unchanged Spark version, the host baseline moved — engine walls from
the same day must be normalized against it before being read as code
regressions.

Usage: python tools/proxy_zero_engine.py [log_dir] [cores]
Prints one JSON line {"cores": N, "wall_s": ..., "canary_s": ...,
"membw_gbps": ...}.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    log_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        tempfile.gettempdir(), "bench_log_16000000"
    )
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from plugin_debezium_spark.session import get_spark

    spark = get_spark(f"proxy-{cores}", cores=cores)
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="proxy_out_")
    try:
        t0 = time.time()
        df = (
            spark.read.parquet(log_dir)
            .select(
                "lsn",
                "op",
                F.col("key.repo").alias("repo"),
                F.col("key.path").alias("path"),
                F.col("key.commit").alias("commit"),
                F.parse_json("after_json").alias("_av"),
            )
            .cache()
        )
        df.count()
        # materialize the variant cast in its OWN select so the
        # extraction runs once per row (CollapseProject would inline it
        # into both content and sha — CLAUDE.md round-3 JSON fact)
        extracted = df.select(
            "repo",
            "path",
            "commit",
            "lsn",
            F.expr("cast(variant_get(_av, '$.content') as string)").alias(
                "content"
            ),
        )
        shaped = extracted.select(
            "repo",
            "path",
            "commit",
            "content",
            F.sha2("content", 256).alias("content_sha256"),
            "lsn",
        ).repartition(32, F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(32)))
        shaped.write.mode("overwrite").parquet(out)
        wall = time.time() - t0
        df.unpersist()
        spark.stop()
        import bench

        print(
            json.dumps(
                {
                    "cores": cores,
                    "wall_s": round(wall, 2),
                    "canary_s": bench._canary_s(),
                    "membw_gbps": bench._membw_gbps(),
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
