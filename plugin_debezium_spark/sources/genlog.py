"""Deterministic synthetic binlog/WAL generator (SURVEY.md §7 step 1).

Emits a Debezium-envelope change log over the source-code-repo base
table ``(repo, path, commit, lang, content)`` as a Parquet dataset
partitioned by ``lsn_bucket`` — the lake-resident stand-in for the
reference's embedded-engine source (reference: AbstractDebeziumTask
.java:208-234 runs the Debezium engine; our "engine" is a partitioned
scan, so resuming past an offset becomes partition pruning).

Everything is built with native Spark SQL expressions over
``spark.range`` — no driver-side loops, no Python row functions — so
the same code generates 1k events for unit tests and 10^10 events on a
cluster (it's one narrow map stage; no shuffle at all).

Determinism: every column is a pure function of the row id (xxhash64
with distinct seeds), so any scale/config produces the identical log
on every run and every parallelism level.

Log layout per FIXTURES.md §2:
- snapshot phase: lsn in [0, n_snapshot) — op='r' over the first keys
  (reference snapshot mode INITIAL, mysql/MysqlInterface.java:43-53)
- stream phase: c/u/d mix ~50/35/10 (+5 u), Zipf-ish: ~30%% of stream
  events hit 2 hot repos (forces salting)
- schema evolution: after ``evolve_at`` fraction, after-images gain
  ``size_bytes`` (v2); after ``widen_at``, values exceed int32 (v3);
  ``lang`` grows a new enum value 'rust' (v4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LogSpec:
    n_events: int = 10_000
    n_keys: int = 2_000
    n_snapshot: int = 1_000  # op='r' prefix
    n_hot_keys: int = 64  # keys owned by the 2 hot repos
    hot_pct: int = 30  # % of stream events hitting hot keys
    evolve_at: float = 0.6  # fraction of log where size_bytes appears
    widen_at: float = 0.8  # fraction where size_bytes exceeds int32
    content_repeat: int = 8  # content body size knob
    lsn_buckets: int = 64
    epoch_size: int = 2_500  # generator hint only
    # every Nth stream event becomes a TRUNCATE envelope (op='t', no
    # key, no images — reference ChangeConsumer.java:262-274); None =
    # no truncates (the default fixtures)
    truncate_every: int | None = None

    @property
    def bucket_size(self) -> int:
        # ceil division: floor would mint lsn_buckets+1 partition values
        return max(1, -(-self.n_events // self.lsn_buckets))


def build_log(spark: SparkSession, spec: LogSpec = LogSpec()) -> DataFrame:
    """Return the envelope-log DataFrame (not yet written)."""
    n = spec.n_events
    evolve_lsn = int(n * spec.evolve_at)
    widen_lsn = int(n * spec.widen_at)

    df = spark.range(0, n, 1).withColumnRenamed("id", "lsn")

    # --- op ------------------------------------------------------------
    snap = F.col("lsn") < F.lit(spec.n_snapshot)
    opsel = F.pmod(F.xxhash64(F.col("lsn"), F.lit(5)), F.lit(100))
    op = (
        F.when(snap, F.lit("r"))
        .when(opsel < 50, F.lit("c"))
        .when(opsel < 85, F.lit("u"))
        .when(opsel < 95, F.lit("d"))
        .otherwise(F.lit("u"))
    )
    if spec.truncate_every:
        op = F.when(
            (~snap)
            & (
                F.pmod(F.col("lsn"), F.lit(spec.truncate_every))
                == F.lit(spec.truncate_every - 1)
            ),
            F.lit("t"),
        ).otherwise(op)

    # --- key id: snapshot covers keys round-robin; stream is skewed ----
    hot = F.pmod(F.xxhash64(F.col("lsn"), F.lit(11)), F.lit(100)) < F.lit(
        spec.hot_pct
    )
    stream_key = F.when(
        hot, F.pmod(F.xxhash64(F.col("lsn"), F.lit(7)), F.lit(spec.n_hot_keys))
    ).otherwise(
        F.lit(spec.n_hot_keys)
        + F.pmod(
            F.xxhash64(F.col("lsn"), F.lit(13)),
            F.lit(max(1, spec.n_keys - spec.n_hot_keys)),
        )
    )
    key_id = F.when(snap, F.pmod(F.col("lsn"), F.lit(spec.n_keys))).otherwise(
        stream_key
    )

    df = df.withColumn("op", op).withColumn("key_id", key_id)

    # --- key columns (repo has 2 hot values + a long tail) -------------
    is_hot_key = F.col("key_id") < F.lit(spec.n_hot_keys)
    repo = F.when(
        is_hot_key,
        F.concat(F.lit("org"), F.pmod(F.col("key_id"), F.lit(2)), F.lit("/hot")),
    ).otherwise(
        F.concat(
            F.lit("org"),
            F.pmod(F.col("key_id"), F.lit(7)),
            F.lit("/repo"),
            F.pmod(F.col("key_id"), F.lit(53)),
        )
    )
    path = F.concat(
        F.lit("src/dir"),
        F.pmod(F.col("key_id"), F.lit(20)),
        F.lit("/file"),
        F.col("key_id"),
        F.lit(".txt"),
    )
    commit = F.substring(
        F.sha2(F.concat(F.lit("commit#"), F.col("key_id")), 256), 1, 40
    )

    # --- payload --------------------------------------------------------
    lang_base = F.element_at(
        F.array(F.lit("python"), F.lit("java"), F.lit("go"), F.lit("ts")),
        (F.pmod(F.col("key_id"), F.lit(4)) + 1).cast("int"),
    )
    # v4 enum growth: 'rust' appears only after the evolution cutover
    lang = F.when(
        (F.col("lsn") >= F.lit(evolve_lsn))
        & (F.pmod(F.col("key_id"), F.lit(11)) == 0),
        F.lit("rust"),
    ).otherwise(lang_base)

    content = F.concat(
        F.lit("// "),
        repo,
        F.lit("/"),
        path,
        F.lit("@"),
        commit,
        F.lit(" v"),
        F.col("lsn"),
        F.lit("\n"),
        F.repeat(
            F.concat(
                F.lit("tok"),
                F.pmod(F.xxhash64(F.col("lsn"), F.lit(9)), F.lit(997)),
                F.lit(" "),
            ),
            spec.content_repeat,
        ),
    )

    payload_v1 = F.struct(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )
    size_small = F.length(content).cast("long")
    size_big = (F.length(content).cast("long") + F.lit(3_000_000_000)).cast("long")
    payload_v2 = F.struct(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        F.when(F.col("lsn") >= F.lit(widen_lsn), size_big)
        .otherwise(size_small)
        .alias("size_bytes"),
    )
    after_json = F.when(F.col("op").isin("d", "t"), F.lit(None).cast("string")).otherwise(
        F.when(F.col("lsn") >= F.lit(evolve_lsn), F.to_json(payload_v2)).otherwise(
            F.to_json(payload_v1)
        )
    )
    # before image: prior version marker (only u/d carry one, like the
    # reference where DELETE takes `before` — ChangeConsumer.java:250-260)
    before_content = F.concat(
        F.lit("// prev "), repo, F.lit("/"), path, F.lit("@"), commit
    )
    payload_before = F.struct(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang_base.alias("lang"),
        before_content.alias("content"),
    )
    before_json = F.when(
        F.col("op").isin("u", "d"), F.to_json(payload_before)
    ).otherwise(F.lit(None).cast("string"))

    source = F.struct(
        F.lit("kestra").alias("db"),
        F.lit("repofiles").alias("table"),
        F.when(snap, F.lit("true")).otherwise(F.lit("false")).alias("snapshot"),
        F.lit("synthetic-wal").alias("connector"),
        # provenance (Message.java:40-67): two logical server names so
        # multi-server round-trips are testable; snapshot reads carry
        # a row counter like Debezium's snapshot source block
        F.concat(F.lit("server-"), F.pmod(F.col("lsn"), F.lit(2)).cast("string")).alias("name"),
        F.lit("2.7.0.Final").alias("version"),
        F.lit(None).cast("string").alias("sequence"),
        F.when(snap, F.col("lsn").cast("int")).alias("row"),
    )

    null_s = F.lit(None).cast("string")
    return df.select(
        F.col("lsn"),
        (F.lit(1_700_000_000_000) + (F.col("lsn") / 2).cast("long") * 2).alias(
            "ts_ms"
        ),
        F.col("op"),
        # TRUNCATE envelopes carry no key (no row identity to merge on)
        F.when(
            F.col("op") == "t",
            F.struct(
                null_s.alias("repo"), null_s.alias("path"), null_s.alias("commit")
            ),
        )
        .otherwise(
            F.struct(repo.alias("repo"), path.alias("path"), commit.alias("commit"))
        )
        .alias("key"),
        before_json.alias("before_json"),
        after_json.alias("after_json"),
        source.alias("source"),
        # transaction block (Envelope.java:36-37): stream events group
        # into ~10-event transactions; snapshot reads carry none
        F.when(
            snap,
            F.lit(None).cast(
                "struct<id:string,total_order:bigint,data_collection_order:bigint>"
            ),
        )
        .otherwise(
            F.struct(
                F.concat(
                    F.lit("tx"), (F.col("lsn") / 10).cast("long").cast("string")
                ).alias("id"),
                (F.pmod(F.col("lsn"), F.lit(10)) + 1)
                .cast("long")
                .alias("total_order"),
                (F.pmod(F.col("lsn"), F.lit(10)) + 1)
                .cast("long")
                .alias("data_collection_order"),
            )
        )
        .alias("transaction"),
        (F.col("lsn") / spec.epoch_size).cast("long").alias("epoch_hint"),
        (F.col("lsn") / spec.bucket_size).cast("long").alias("lsn_bucket"),
    )


def write_log(spark: SparkSession, out_dir: str, spec: LogSpec = LogSpec()) -> str:
    """Materialize the log partitioned by lsn_bucket (→ partition
    pruning when resuming past a checkpointed LSN)."""
    # one task per lsn_bucket, rows sorted by lsn inside each file →
    # tight parquet min/max stats, so an LSN-range read prunes row
    # groups as well as partitions
    (
        build_log(spark, spec)
        .repartition(spec.lsn_buckets, F.col("lsn_bucket"))
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .partitionBy("lsn_bucket")
        .parquet(out_dir)
    )
    return out_dir
