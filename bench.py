"""Benchmark harness.

Default mode: times every driver query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], then measures the
headline metric — change-events/sec applied by the full engine over a
deterministic synthetic binlog — at TWO parallelism levels (local[8]
and local[32], the sandbox proxy for N vs 4N executors) and reports
the throughput scaling efficiency the north rule requires (≥0.8).

Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...},
   "sf": ..., "replay": {...}}

Worker mode (internal): `python bench.py --worker <log> <table> <cores>
<batch>` replays the log in a fresh JVM pinned to `cores` and prints
its own JSON (so JVM startup is excluded from the measured wall).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
BENCH_KEYS = int(os.environ.get("SPARK_GRAFT_BENCH_KEYS", "200000"))
SCALING_CORES = (8, 32)


def _worker(log_dir: str, table_dir: str, cores: int, batch: int) -> None:
    from plugin_debezium_spark.session import get_spark
    from plugin_debezium_spark.streaming.engine import EngineConfig, run

    spark = get_spark(f"bench-replay-{cores}", cores=cores)
    # warm the JVM/codegen paths so the measured wall is steady-state
    spark.range(1000).summary().collect()
    t0 = time.time()
    out = run(
        spark,
        EngineConfig(
            log_dir=log_dir,
            table_dir=table_dir,
            max_events_per_batch=batch,
            write_metrics=False,
        ),
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_s": wall,
                "batches": out["batches_applied"],
                "last_lsn": out["last_lsn"],
            }
        )
    )


def _run_worker(log_dir: str, cores: int, batch: int) -> dict:
    table_dir = tempfile.mkdtemp(prefix=f"bench_tbl_{cores}_")
    try:
        env = dict(os.environ)
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                log_dir,
                table_dir,
                str(cores),
                str(batch),
            ],
            capture_output=True,
            text=True,
            env=env,
            timeout=3600,
        )
        line = [
            ln
            for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")
        ][-1]
        return json.loads(line)
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from plugin_debezium_spark.session import get_spark
    from plugin_debezium_spark.sources.genlog import LogSpec, write_log

    spark = get_spark("bench", cores=cpus)

    import __spark_entry__ as entry_mod

    query_secs: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        query_secs[name] = round(time.time() - t0, 3)

    # headline: full-engine replay throughput at two parallelism levels
    log_dir = os.path.join(
        tempfile.gettempdir(), f"bench_log_{BENCH_EVENTS}"
    )
    if not os.path.exists(os.path.join(log_dir, "_SUCCESS")):
        spec = LogSpec(
            n_events=BENCH_EVENTS,
            n_keys=BENCH_KEYS,
            n_snapshot=min(BENCH_KEYS, BENCH_EVENTS // 10),
            lsn_buckets=64,
            epoch_size=BENCH_EVENTS // 4,
        )
        write_log(spark, log_dir, spec)
    spark.stop()

    batch = max(BENCH_EVENTS // 4, 1)
    replay = {}
    for cores in SCALING_CORES:
        r = _run_worker(log_dir, cores, batch)
        r["events_per_sec"] = round(BENCH_EVENTS / r["wall_s"], 1)
        replay[f"local[{cores}]"] = r
    lo, hi = (replay[f"local[{c}]"] for c in SCALING_CORES)
    ratio = SCALING_CORES[1] / SCALING_CORES[0]
    efficiency = (hi["events_per_sec"] / lo["events_per_sec"]) / ratio

    result = {
        "metric": (
            f"wall sec to replay {BENCH_EVENTS} change events "
            f"(binlog → lake table, local[{SCALING_CORES[1]}])"
        ),
        "value": round(hi["wall_s"], 3),
        "unit": "sec",
        "queries": query_secs,
        "sf": sf,
        "replay": {
            "n_events": BENCH_EVENTS,
            "n_keys": BENCH_KEYS,
            **replay,
            "scaling_efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
    else:
        main()
