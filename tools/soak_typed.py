"""Soak the typed-dump path (round-4 verdict item 4).

`typed_envelopes` caches the ENTIRE parsed envelope frame and fans
out one decode branch per schema version — the same
columnar-cache-build shape that OOMed the replay path twice at the
64M soak before session.py learned to scale the heap with cores.
This soak proves the typed path holds at a multi-GB schemas-enabled
dump with 2 schema versions, and exercises the documented
`result._env_cache.unpersist()` release handle end-to-end.

Usage: python tools/soak_typed.py [n_events] [cores]
Defaults: 16_000_000 events (~4x the wire-import bench's 4M), 32.
Generates the dump once (cached under /tmp), then runs the typed
decode in THIS process and prints one JSON line: wall seconds, rows
in/out per schema version, a value checksum over the typed columns,
cached-RDD count before/after the release handle, and the process
tree's peak RSS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from plugin_debezium_spark.session import get_spark
from plugin_debezium_spark.sources.debezium_json import typed_envelopes

# Connect value schemas: v2 adds `stars` (the evolution case — older
# rows must null-fill through the unionByName)
_AFTER_V1 = {
    "type": "struct",
    "optional": True,
    "field": "after",
    "fields": [
        {"field": "repo", "type": "string"},
        {"field": "path", "type": "string"},
        {"field": "commit", "type": "string"},
        {"field": "lang", "type": "string", "optional": True},
        {"field": "content", "type": "string", "optional": True},
        {
            "field": "price",
            "type": "bytes",
            "optional": True,
            "name": "org.apache.kafka.connect.data.Decimal",
            "parameters": {"scale": "2"},
        },
        {
            "field": "added_on",
            "type": "int32",
            "optional": True,
            "name": "io.debezium.time.Date",
        },
        {
            "field": "created",
            "type": "int64",
            "optional": True,
            "name": "io.debezium.time.Timestamp",
        },
    ],
}
_AFTER_V2 = {
    **_AFTER_V1,
    "fields": _AFTER_V1["fields"]
    + [{"field": "stars", "type": "int64", "optional": True}],
}


def _env_schema(after):
    return {
        "type": "struct",
        "fields": [
            {**after, "field": "before"},
            after,
            {"field": "op", "type": "string"},
            {"field": "ts_ms", "type": "int64"},
        ],
    }


def _gen_dump(spark, path: str, n_events: int) -> None:
    """Distributed generation: payload JSON built JVM-side per row,
    concatenated with the (constant per version) schema block. Second
    half of the id space carries schema v2 + the `stars` field."""
    s1 = json.dumps(_env_schema(_AFTER_V1), separators=(",", ":"))
    s2 = json.dumps(_env_schema(_AFTER_V2), separators=(",", ":"))
    df = spark.range(n_events).withColumn("v2", F.col("id") % 2 == 1)
    cents = F.pmod(F.col("id"), F.lit(10000)).cast("int")
    after_common = [
        F.concat(F.lit("org/repo-"), F.pmod(F.col("id"), F.lit(1000))).alias(
            "repo"
        ),
        F.concat(F.lit("src/f"), F.pmod(F.col("id"), F.lit(50000)), F.lit(".py")).alias(
            "path"
        ),
        F.sha2(F.col("id").cast("string"), 256).alias("commit"),
        F.lit("python").alias("lang"),
        # ~640 B of content per event -> ~1.1 KB/line with the schema
        # block; 16M lines ~ 18 GB of wire JSON
        F.repeat(F.concat(F.lit("line of source code "), F.col("id")), 24).alias(
            "content"
        ),
        F.base64(F.unhex(F.lpad(F.hex(cents), 4, "0"))).alias("price"),
        F.pmod(F.col("id"), F.lit(20000)).cast("int").alias("added_on"),
        (F.col("id") * 1000).alias("created"),
    ]
    payload = F.to_json(
        F.struct(
            F.lit("c").alias("op"),
            (F.lit(1700000000000) + F.col("id")).alias("ts_ms"),
            F.lit(None).cast("string").alias("before"),
            F.struct(
                *after_common,
                F.when(F.col("v2"), F.col("id") % 5000).alias("stars"),
            ).alias("after"),
            F.struct(
                F.lit("postgresql").alias("connector"),
                F.lit("kestra").alias("db"),
                F.lit("repofiles").alias("table"),
                F.lit("false").alias("snapshot"),
                F.col("id").alias("lsn"),
            ).alias("source"),
        )
    )
    line = F.concat(
        F.lit('{"schema":'),
        F.when(F.col("v2"), F.lit(s2)).otherwise(F.lit(s1)),
        F.lit(',"payload":'),
        payload,
        F.lit("}"),
    )
    df.select(line.alias("value")).repartition(64).write.mode(
        "overwrite"
    ).text(path)


def _cached_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dump = f"/tmp/soak_typed_dump_{n_events}"

    spark = get_spark("soak-typed", cores=cores)
    if not os.path.exists(os.path.join(dump, "_SUCCESS")):
        t0 = time.time()
        _gen_dump(spark, dump, n_events)
        gen_s = round(time.time() - t0, 1)
    else:
        gen_s = None

    t0 = time.time()
    env = typed_envelopes(spark, dump)
    # one checksum aggregate materializes the cache AND every decode
    # branch; covers both typed columns and the evolution null-fill
    agg = env.agg(
        F.count("*").alias("rows"),
        F.count("after.stars").alias("v2_rows"),
        F.sum(F.col("after.price") * 100).cast("long").alias("cents_sum"),
        F.sum(F.datediff(F.col("after.added_on"), F.lit("1970-01-01"))).alias(
            "days_sum"
        ),
        # decimal sum: 16M x id*1e6 micros overflows LongType (Spark
        # sum over long wraps silently under non-ANSI arithmetic)
        F.sum(
            F.unix_micros(F.col("after.created")).cast("decimal(38,0)")
        ).alias("micros_sum"),
        F.sum(F.crc32(F.col("after.commit"))).alias("commit_crc_sum"),
    ).collect()[0]
    wall = round(time.time() - t0, 1)

    # closed-form expectations: the soak is self-verifying, not just
    # stable — a decode drift at scale fails loudly here
    def _mod_sum(n, m):
        full, rem = divmod(n, m)
        return full * (m * (m - 1) // 2) + rem * (rem - 1) // 2

    expect = {
        "rows": n_events,
        "v2_rows": n_events // 2,
        "cents_sum": _mod_sum(n_events, 10000),
        "days_sum": _mod_sum(n_events, 20000),
        "micros_sum": 1_000_000 * n_events * (n_events - 1) // 2,
    }
    got = {
        "rows": agg["rows"],
        "v2_rows": agg["v2_rows"],
        "cents_sum": int(agg["cents_sum"]),
        "days_sum": int(agg["days_sum"]),
        "micros_sum": int(agg["micros_sum"]),
    }
    if got != expect:
        raise SystemExit(f"typed-decode checksum mismatch: {got} != {expect}")

    cached_before = _cached_rdds(spark)
    env._env_cache.unpersist()
    cached_after = _cached_rdds(spark)

    dump_bytes = sum(
        os.path.getsize(os.path.join(dump, f)) for f in os.listdir(dump)
    )
    # JVM peak RSS straight from /proc (RUSAGE_CHILDREN only counts
    # reaped children — the live gateway JVM never shows up there)
    peak_kb = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/status") as f:
                st = f.read()
            if f"\nPPid:\t{os.getpid()}\n" not in st and "java" not in st[:40]:
                continue
            for ln in st.splitlines():
                if ln.startswith("VmHWM:") and "java" in st[:40]:
                    peak_kb = max(peak_kb, int(ln.split()[1]))
        except OSError:
            continue
    spark.stop()
    peak_rss_gb = round(peak_kb / 1024 / 1024, 1)
    print(
        json.dumps(
            {
                "n_events": n_events,
                "cores": cores,
                "dump_gb": round(dump_bytes / 1e9, 2),
                "gen_s": gen_s,
                "typed_decode_wall_s": wall,
                "events_per_sec": round(n_events / wall, 1),
                **got,
                "checksums": "match",
                "commit_crc_sum": int(agg["commit_crc_sum"]),
                "cached_rdds_before_release": cached_before,
                "cached_rdds_after_release": cached_after,
                "jvm_peak_rss_gb": peak_rss_gb,
            }
        )
    )


if __name__ == "__main__":
    main()
