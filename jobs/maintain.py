"""spark-submit entry point: lake-table maintenance.

    spark-submit --py-files plugin_debezium_spark.zip jobs/maintain.py \
        --table-dir /lake/repofiles --compact-min-files 4 \
        --expire-keep-last 5

Run on a cadence, not per epoch: compact() folds fragmented buckets
(and MOR deltas) back into one file each; expire_snapshots() reclaims
data files no retained snapshot references — without it a COW table's
disk grows with replay length, not table size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table-dir", required=True)
    p.add_argument("--compact-min-files", type=int, default=2,
                   help="rewrite buckets holding at least this many files")
    p.add_argument("--expire-tombstones-below-lsn", type=int, default=None,
                   help="drop tombstones older than the out-of-order horizon")
    p.add_argument("--expire-keep-last", type=int, default=None,
                   help="retire all but the newest N snapshots and delete "
                        "their unreferenced data files")
    p.add_argument("--skip-compact", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from plugin_debezium_spark.plans.compact import compact, expire_snapshots
    from plugin_debezium_spark.plans.lake import LakeTable

    spark = SparkSession.getActiveSession()
    if spark is None:
        from plugin_debezium_spark.session import get_spark

        spark = get_spark("cdc-maintain")

    table = LakeTable(spark, args.table_dir)
    out: dict = {}
    if not args.skip_compact:
        out["compact"] = compact(
            table,
            min_files_per_bucket=args.compact_min_files,
            expire_tombstones_below_lsn=args.expire_tombstones_below_lsn,
        )
    if args.expire_keep_last is not None:
        out["expire"] = expire_snapshots(
            table, keep_last=args.expire_keep_last
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
