"""Per-query isolation bench (guide §1.4): times declared driver
queries with the noop sink, min-of-N passes, with the same degraded-
window probes bench.py uses. bench.py itself is FROZEN for
measurement; this harness exists so optimization work can A/B a
subset of queries quickly without re-running the whole official
bench.

Usage:
    python bench_extra.py [name ...]          # default: all queries
    SPARK_GRAFT_EXTRA_PASSES=3 python bench_extra.py dedup_simhash

Prints one JSON line: {"queries": {name: best_sec}, "passes": N,
"membw_gbps": [...], "healthy": bool}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _membw_gbps(mb: int = 64) -> float:
    path = f"/dev/shm/bench_membw_{os.getpid()}"
    blk = b"\x5a" * 1048576
    t0 = time.time()
    try:
        with open(path, "wb") as f:
            for _ in range(mb):
                f.write(blk)
    finally:
        try:
            os.remove(path)
        except OSError:
            pass
    return round(mb / 1024 / (time.time() - t0), 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_EXTRA_PASSES", "2"))

    from plugin_debezium_spark.session import get_spark

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = sys.argv[1:] or list(queries)

    spark = get_spark("bench-extra", cores=cpus)
    spark.range(1000).summary().collect()  # codegen warmup

    probes = [_membw_gbps()]
    secs: dict[str, float] = {}
    for p in range(passes):
        for name in names:
            fn = queries[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            if name not in secs or sec < secs[name]:
                secs[name] = sec
            spark.sparkContext.setJobDescription(None)
        probes.append(_membw_gbps())
    print(
        json.dumps(
            {
                "queries": secs,
                "passes": passes,
                "membw_gbps": probes,
                "healthy": all(b >= 1.0 for b in probes),
            }
        )
    )


if __name__ == "__main__":
    main()
