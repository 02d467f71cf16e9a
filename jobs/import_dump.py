"""spark-submit entry: Debezium JSON topic dump → bucketed envelope log.

The one-shot conversion in front of the replay/streaming jobs for
users whose change events live in Debezium's native wire shape
(reference: the Kafka topic a plugin-debezium Capture consumes):

    spark-submit --py-files plugin_debezium_spark.zip jobs/import_dump.py \
        --json-path /dumps/topic.jsonl --log-dir /data/wal \
        --lsn-fields lsn,pos,scn,sequence

Ordering is connector-aware: numeric positions coalesce in
--lsn-fields order, MySQL (file, pos) pairs compose a rotation-safe
total order automatically, and --order-token-field makes an opaque
string token (Mongo resume tokens) the same-position tie-break.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/import_dump.py` runs: the package lives one level
# up (spark-submit users get it from --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json-path", required=True)
    p.add_argument("--log-dir", required=True)
    p.add_argument("--wire", default="value", choices=["value", "combined"],
                   help="value = one value doc per line; combined = "
                        "{key, value} record pairs")
    p.add_argument("--lsn-fields", default="lsn,pos,scn,sequence",
                   help="comma list of numeric source position fields, "
                        "coalesced in order")
    p.add_argument("--lsn-buckets", type=int, default=64)
    p.add_argument("--order-token-field", default=None,
                   help="opaque string position field (e.g. resume_token) "
                        "used as the same-position tie-break")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from plugin_debezium_spark.sources.debezium_json import import_to_log

    spark = SparkSession.getActiveSession()
    if spark is None:
        from plugin_debezium_spark.session import get_spark

        spark = get_spark("cdc-import")

    out = import_to_log(
        spark,
        args.json_path,
        args.log_dir,
        lsn_fields=tuple(
            f.strip() for f in args.lsn_fields.split(",") if f.strip()
        ),
        lsn_buckets=args.lsn_buckets,
        order_token_field=args.order_token_field,
        wire=args.wire,
    )
    n = spark.read.parquet(out).count()
    print(json.dumps({"log_dir": out, "events": int(n)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
