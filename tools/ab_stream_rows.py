"""Measure stream_rows per-row emission throughput.

The per-row realtime path (streaming/realtime.stream_rows) is
single-consumer by contract — the reference's RealtimeTrigger pushes
each record to one FluxSink on the driver JVM
(AbstractDebeziumRealtimeTrigger.java:117-186), so rows/s here is the
honest apples-to-apples number for that delivery mode, NOT the
engine's batch path (which applies millions of events/s into the lake
table). Decode/shape/sort run distributed; the serial section is the
Arrow partition fetch + Python row materialization under
toLocalIterator.

Usage: python tools/ab_stream_rows.py [n_events] [cores]
Defaults: 1_000_000 events / 16 cores.

Measured (round 6, defaults, healthy probes — canary 0.23-0.29 s,
membw 2.1-2.3 GB/s): INLINE 26.4k rows/s (37.8 s), RAW 24.0k rows/s
(41.6 s) — wall is driver-side row materialization, near-invariant to
the shape pipeline; the reference's own per-row Reactor emission is
the same class of single-consumer loop.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _canary_s, _membw_gbps
from plugin_debezium_spark.session import get_spark
from plugin_debezium_spark.sources.genlog import LogSpec, write_log
from plugin_debezium_spark.streaming.engine import EngineConfig
from plugin_debezium_spark.streaming.realtime import stream_rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("ab_stream_rows", cores=cores)
    tmp = tempfile.mkdtemp(prefix="ab_rows_")
    log = write_log(
        spark,
        f"{tmp}/log",
        LogSpec(n_events=n, n_keys=max(1000, n // 10), n_snapshot=n // 10),
    )
    for fmt in ("inline", "raw"):
        cfg = EngineConfig(
            log_dir=log,
            table_dir=f"{tmp}/tbl_{fmt}",
            max_events_per_batch=max(50_000, n // 5),
        )
        t0 = time.time()
        seen = 0
        last = -1
        for row in stream_rows(
            spark, cfg, f"{tmp}/ck_{fmt}.json", fmt=fmt
        ):
            lsn = row["lsn"] if fmt != "raw" else row["value"]["lsn"]
            assert lsn > last, "order violated"
            last = lsn
            seen += 1
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "fmt": fmt,
                    "rows": seen,
                    "wall_s": round(wall, 2),
                    "rows_per_sec": round(seen / wall),
                    "canary_s": round(_canary_s(), 3),
                    "membw_gbps": round(_membw_gbps(), 2),
                }
            )
        )
        assert seen == n, (seen, n)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
