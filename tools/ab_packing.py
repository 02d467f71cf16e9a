"""A/B pack_sequences at operator-dominant scale: does the two-phase
bucketed cumsum hold its promise — identical output across bucket_bits
(the scale knob), wall flat-or-better as buckets shrink partitions, and
no single-partition stage beyond the bounded ≤2^bits prefix window?

Usage: python tools/ab_packing.py [n_docs] [reps]
Defaults: 10_000_000 docs, 2 reps. Prints one JSON line per
(bucket_bits, rep) plus an agreement line (full-output checksum
equality across variants).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _canary_s, _membw_gbps
from plugin_debezium_spark.operators.packing import pack_sequences
from plugin_debezium_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("ab_packing", cores=16)
    # synthetic corpus: token counts vary 1..96, no text materialized —
    # the op under test is the placement machinery, so feed `tokens`
    # directly (the token_count path is covered by the driver oracle)
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.col("id") * 2654435761, F.lit(96)) + 1).alias("_n"),
        )
        .repartition(64)
    )
    docs.cache().count()
    sums = {}
    for bits in (8, 12):
        for rep in range(reps):
            t0 = time.time()
            out = pack_sequences(
                docs,
                block_tokens=2048,
                tokens=F.col("_n"),
                bucket_bits=bits,
            )
            agg = out.agg(
                F.count("*").alias("rows"),
                F.sum(
                    F.col("tok_offset") * 31
                    + F.col("first_block") * 7
                    + F.col("last_block")
                ).alias("chk"),
                F.max(F.col("tok_offset") + F.col("n_tokens")).alias("total"),
            ).collect()[0]
            wall = time.time() - t0
            print(
                json.dumps(
                    {
                        "bucket_bits": bits,
                        "rep": rep,
                        "wall_s": round(wall, 2),
                        "rows": agg["rows"],
                        "chk": str(agg["chk"]),
                        "total_tokens": agg["total"],
                        "canary_s": round(_canary_s(), 3),
                        "membw_gbps": round(_membw_gbps(64), 2),
                    }
                ),
                flush=True,
            )
            sums[bits] = (agg["rows"], str(agg["chk"]), agg["total"])
    print(
        json.dumps(
            {
                "agreement": len(set(sums.values())) == 1,
                "variants": {str(k): v for k, v in sums.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
