"""64M-event durability soak helpers (re-run every round).

The soak replays a 64,000,000-event / ~11 GB log (6.4M keys, 4 epochs
of 16M) through the real engine on local[32] and asserts the final
table is IDENTICAL across rounds — it has caught two memory bugs that
sf0.1 never would (CLAUDE.md). Until round 5 the recipe lived only in
session history and the "checksum-identical" claim was re-derived ad
hoc; this tool makes both reproducible:

    python tools/soak64.py gen   [log_dir]    # write the canonical log
    python bench.py --worker <log_dir> <table_dir> 32 16000000
                                              # replay (fresh JVM,
                                              # prints wall + probes)
    python tools/soak64.py check [table_dir]  # one JSON line:
                                              # rows + checksums

The check is order-insensitive: per row, sha256 over every column
(sorted by name, NULLs marked, '\\x01'-separated) → first 60 bits as
BIGINT → SUM over the table; plus row count and SUM(_lsn). Any content
or provenance drift moves at least one number. The round-5 reference
values live in BENCH/BASELINE.md's Soak section.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_LOG = "/tmp/soak_64M_log"
DEFAULT_TBL = "/tmp/soak_64M_tbl"


def gen(log_dir: str) -> None:
    from plugin_debezium_spark.session import get_spark
    from plugin_debezium_spark.sources.genlog import LogSpec, write_log

    spark = get_spark("gen-soak64", cores=32)
    if not os.path.exists(f"{log_dir}/_SUCCESS"):
        write_log(
            spark,
            log_dir,
            LogSpec(
                n_events=64_000_000,
                n_keys=6_400_000,
                n_snapshot=6_400_000,
                lsn_buckets=128,
                epoch_size=16_000_000,
                content_repeat=48,
            ),
        )
    print("generated", log_dir)
    spark.stop()


def check(table_dir: str) -> None:
    from pyspark.sql import functions as F

    from plugin_debezium_spark.plans.lake import LakeTable
    from plugin_debezium_spark.session import get_spark

    spark = get_spark("check-soak64", cores=32)
    df = LakeTable(spark, table_dir).read()
    cols = sorted(df.columns)
    row_repr = F.concat_ws(
        "\x01",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x02NULL"))
            for c in cols
        ],
    )
    # 60-bit per-row hashes summed over millions of rows overflow
    # BIGINT — accumulate in decimal(38,0)
    row_h = (
        F.conv(F.substring(F.sha2(row_repr, 256), 1, 15), 16, 10)
        .cast("long")
        .cast("decimal(38,0)")
    )
    agg = df.agg(
        F.count("*").alias("rows"),
        F.sum(row_h).alias("sum_sha60"),
        F.sum(F.col("_lsn").cast("decimal(38,0)")).alias("sum_lsn"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "rows": agg["rows"],
                "sum_sha60": str(agg["sum_sha60"]),
                "sum_lsn": str(agg["sum_lsn"]),
                "cols": cols,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    arg = sys.argv[2] if len(sys.argv) > 2 else None
    if cmd == "gen":
        gen(arg or DEFAULT_LOG)
    elif cmd == "check":
        check(arg or DEFAULT_TBL)
    else:
        raise SystemExit(f"unknown command {cmd!r} (gen|check)")
