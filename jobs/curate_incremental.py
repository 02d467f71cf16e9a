"""CDC-delta-driven INCREMENTAL curation: keep a curated training
corpus in sync with a CDC-maintained source table by processing only
what changed — never re-reading, re-hashing, or re-minhashing the
already-curated corpus.

    spark-submit --py-files plugin_debezium_spark.zip \
        jobs/curate_incremental.py \
        --source /lake/repofiles --state /lake/curated_state

This is the composition the engine exists for at 100 TB: a full
re-curation of a 100 TB corpus per ingest cycle is O(corpus) in scan,
shuffle, and minhash work; this job is O(delta + collisions):

  source LakeTable ──table_diff(ptr → current)──▶ changed rows only
      │ c/u rows                                        │ d rows
      ▼                                                 ▼
  quality gate (Gopher integer thresholds)          curated delete
      ▼
  exact dedup: sha256 anti-join vs the PERSISTED hash set
      ▼
  near-dup: dedup_against_index vs the PERSISTED LSH index
  (directional bucket join — corpus text never re-touched),
  then within-batch LSH clustering for batch-internal dups
      ▼
  survivors ──merge_batch(epoch_id = source snapshot)──▶ curated
  LakeTable (idempotent: a replayed increment is skipped by the
  epoch guard), hash set + LSH index APPEND the survivors,
  state pointer swaps atomically (the lake's own crash idiom).

Design decision — the dedup state is MONOTONE (content-seen):
deleting or updating a source doc removes it from the CURATED table
(tombstone via merge), but its sha256 and LSH band rows stay in the
state. A later near-copy of deleted content is therefore still
flagged as a duplicate. That is the semantics training-data dedup
wants — "train at most once per distinct content" (Lee et al. 2022)
is a property of everything the pipeline has EVER emitted, not of the
table's current membership — and it is what makes the state
append-only, so increments never rewrite state at any scale.

Crash safety / idempotence: state appends land under
``batch=<to_snapshot>`` subdirectories in overwrite mode (a re-run of
the same increment overwrites its own rows, never duplicates);
the curated commit is guarded by merge_batch's epoch id; the pointer
(_ptr.json) moves last via atomic rename. Any crash point replays to
the same final state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PTR = "_ptr.json"


def _read_ptr(state_dir: str) -> int:
    try:
        with open(os.path.join(state_dir, _PTR)) as f:
            return int(json.load(f)["last_snapshot"])
    except FileNotFoundError:
        return 0  # snapshot 0 = the empty table → first diff is all 'c'


def _write_ptr(state_dir: str, snap: int) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, _PTR + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"last_snapshot": snap}, f)
    os.replace(tmp, os.path.join(state_dir, _PTR))


def _read_state(spark, path: str, schema: str, exclude_batch: int):
    """All batch=* appends of one state table; empty frame if none.
    ``exclude_batch`` (the increment being computed) is filtered OUT:
    a crashed attempt of THIS increment may have written its subdir
    already, and reading those rows back would make the replay see its
    own docs as "already seen" and overwrite the subdir with an empty
    survivor set. Excluding self makes the replay a pure recompute —
    same inputs, same survivors, same overwrite. The batch partition
    column is then projected away."""
    from pyspark.sql import functions as F

    import os

    names = [c.split()[0] for c in schema.split(",")]
    if not os.path.isdir(path):
        # no state yet (first increment) — and ONLY that case: a
        # corrupt or unreadable EXISTING state must raise, not
        # silently disable dedup for the increment (duplicate content
        # would commit with no error)
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(path)
        .filter(F.col("batch") != exclude_batch)
        .select(*names)
    )


def curate_increment(
    spark,
    source,
    state_dir: str,
    to_snapshot_id: int | None = None,
    text_col: str = "content",
    min_words: int = 5,
    min_alpha_frac: float = 0.5,
    max_rep_frac: float = 0.5,
    lsh_perms: int = 8,
    lsh_bands: int = 2,
    lsh_shingle_words: int = 3,
    max_bucket_size: int | None = 1000,
) -> dict:
    """Process source changes since the state pointer, up to
    ``to_snapshot_id`` (default: source current). Returns stage stats;
    ``{"skipped": True}`` when the pointer is already there."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.neardup import (
        dedup_against_index,
        dedup_cluster_reps,
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from plugin_debezium_spark.plans.diff import table_diff
    from plugin_debezium_spark.plans.lake import LakeTable
    from plugin_debezium_spark.plans.merge import merge_batch

    to_snap = (
        source.current().snapshot_id
        if to_snapshot_id is None
        else to_snapshot_id
    )
    from_snap = _read_ptr(state_dir)
    if from_snap >= to_snap:
        return {"skipped": True, "at_snapshot": from_snap}

    key_cols = list(source.current().key_cols)
    diff = table_diff(source, from_snap, to_snap)
    # stable doc identity for the dedup state: the key tuple, joined
    # with a separator no key value contains
    did = F.concat_ws("\x1f", *[F.col(c) for c in key_cols])
    diff = diff.withColumn("_did", did).cache()
    stats = {"from_snapshot": from_snap, "to_snapshot": to_snap,
             "changed": diff.count()}

    cand = diff.filter(F.col("op") != "d")
    stats["candidates"] = cand.count()

    # -- 1. quality gate — THE shared derivation (jobs/quality_gate.py,
    # same module curate.py and the clf weak labels use; a threshold
    # change can't desync the batch and incremental gates) -----------
    from jobs.quality_gate import quality_gate_predicate, quality_gate_stats

    q = quality_gate_stats(cand, "_did", text_col)
    kept = q.filter(
        quality_gate_predicate(min_words, max_rep_frac, min_alpha_frac)
    ).select(cand["*"])
    kept = kept.cache()
    stats["after_quality"] = kept.count()

    # -- 2. exact dedup vs persisted hash set, then within batch -----
    hashes_path = os.path.join(state_dir, "hashes")
    seen_hashes = _read_state(
        spark, hashes_path, "text_sha256 string, _did string", to_snap
    )
    hashed = kept.withColumn("text_sha256", F.sha2(F.col(text_col), 256))
    # a sha seen under the SAME doc identity is a survivor/no-op: a
    # touch-update re-presenting a doc's own curated content must not
    # tombstone it out of the curated table (r6 advice — the state was
    # content-keyed only, so a no-op source UPDATE permanently evicted
    # the doc). Only a sha seen under a DIFFERENT identity — or a
    # legacy state row predating the identity column (null _did, the
    # conservative old behavior) — evicts.
    conflicts = (
        hashed.select("_did", "text_sha256")
        .join(
            seen_hashes.withColumnRenamed("_did", "_seen_did"),
            "text_sha256",
        )
        .filter(
            F.col("_seen_did").isNull()
            | (F.col("_seen_did") != F.col("_did"))
        )
        .select("_did")
        .distinct()
    )
    fresh = hashed.join(conflicts, "_did", "left_anti")
    batch_reps = fresh.groupBy("text_sha256").agg(F.min("_did").alias("_did"))
    fresh = fresh.join(batch_reps, ["text_sha256", "_did"], "left_semi")
    fresh = fresh.cache()
    stats["after_exact"] = fresh.count()

    # -- 3. near-dup vs persisted LSH index, then within batch -------
    index_path = os.path.join(state_dir, "lsh_index")
    index = _read_state(
        spark, index_path, "_did string, band int, bucket string", to_snap
    )
    lsh_kw = dict(
        n_perms=lsh_perms, bands=lsh_bands, shingle_words=lsh_shingle_words
    )
    # shingle+minhash is the dominant per-doc compute: sign the batch
    # ONCE and derive the index probe, the within-batch pairs, and the
    # state append from this frame (was 3x — measured by the A/B tool)
    sigs = minhash_signatures(
        fresh, text_col=text_col, id_col="_did",
        n_perms=lsh_perms, shingle_words=lsh_shingle_words,
    ).cache()
    flagged = dedup_against_index(
        index,
        fresh,
        text_col=text_col,
        id_col="_did",
        max_bucket_size=max_bucket_size,
        new_sigs=sigs,
        # same self-exemption as the exact path: a doc's own index
        # rows (from its prior curated version) must not flag its
        # near-identical update as a duplicate of itself
        exclude_self=True,
        **lsh_kw,
    ).select("_did")
    surv = fresh.join(flagged, "_did", "left_anti")
    # batch-internal near-dup: cluster the remaining docs against each
    # other, keep each component's min-id representative. Filtering
    # the per-doc signature rows to survivors IS minhashing the
    # survivors, so the candidate pairs (incl. bucket-size capping,
    # which sees survivor-only bucket sizes) are unchanged.
    sigs_surv = sigs.join(surv.select("_did"), "_did", "left_semi")
    pairs = minhash_lsh_candidates(
        sigs_surv, id_col="_did", n_perms=lsh_perms, bands=lsh_bands,
        max_bucket_size=max_bucket_size,
    )
    reps = dedup_cluster_reps(surv, pairs, id_col="_did")
    surv = surv.join(
        reps.filter("is_rep").select("_did"), "_did", "left_semi"
    ).cache()
    stats["survivors"] = surv.count()

    # -- 4. curated table: upsert survivors, delete everything else --
    curated_path = os.path.join(state_dir, "curated")
    src_payload = [
        c for c in source.current().schema().fieldNames()
        if c not in key_cols and not c.startswith("_")
    ]
    if not LakeTable.exists(curated_path):
        from pyspark.sql import types as T

        src_schema = source.current().schema()
        cur_schema = T.StructType(
            [src_schema[c] for c in key_cols]
            + [src_schema[c] for c in src_payload]
        )
        curated = LakeTable.create(
            spark, curated_path, cur_schema,
            n_buckets=source.current().n_buckets,
            key_cols=tuple(key_cols),
        )
    else:
        curated = LakeTable(spark, curated_path)

    ups = surv.select(*key_cols, *src_payload, F.lit("u").alias("op"))
    # a changed key whose new version did NOT survive leaves the
    # curated table (gate fail, dup, or source delete) — tombstoning
    # keys that were never curated is a harmless no-op row
    dels = (
        diff.join(surv.select("_did"), "_did", "left_anti")
        .select(
            *key_cols,
            *[F.lit(None).cast(f.dataType).alias(f.name)
              for f in curated.current().schema().fields
              if f.name in src_payload],
            F.lit("d").alias("op"),
        )
    )
    out = merge_batch(
        curated, ups.unionByName(dels), epoch_id=to_snap, last_lsn=to_snap
    )
    stats["curated_skipped"] = bool(out.get("skipped", False))

    # -- 5. append monotone state (idempotent per-batch subdirs).
    # Surviving self-matches re-present (sha, _did) / band rows the
    # state already holds — anti-join them away so the monotone state
    # stays a SET under touch-update workloads instead of growing one
    # duplicate row per re-presentation
    (
        surv.select("text_sha256", "_did")
        .join(seen_hashes, ["text_sha256", "_did"], "left_anti")
        .write.mode("overwrite")
        .parquet(os.path.join(hashes_path, f"batch={to_snap}"))
    )
    from plugin_debezium_spark.operators.neardup import _band_buckets

    (
        _band_buckets(
            sigs.join(surv.select("_did"), "_did", "left_semi"),
            "_did",
            lsh_perms,
            lsh_bands,
        )
        .join(index, ["_did", "band", "bucket"], "left_anti")
        .write.mode("overwrite")
        .parquet(os.path.join(index_path, f"batch={to_snap}"))
    )
    _write_ptr(state_dir, to_snap)
    for c in (diff, kept, fresh, surv, sigs):
        c.unpersist()
    return stats


def main(argv: list[str] | None = None) -> int:
    from plugin_debezium_spark import get_spark
    from plugin_debezium_spark.plans.lake import LakeTable

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="source LakeTable path")
    p.add_argument("--state", required=True, help="curation state dir")
    p.add_argument("--text-col", default="content")
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--max-rep-frac", type=float, default=0.5)
    p.add_argument("--min-alpha-frac", type=float, default=0.5)
    p.add_argument("--lsh-max-bucket", type=int, default=1000)
    a = p.parse_args(argv)
    spark = get_spark("curate-incremental")
    stats = curate_increment(
        spark,
        LakeTable(spark, a.source),
        a.state,
        text_col=a.text_col,
        min_words=a.min_words,
        max_rep_frac=a.max_rep_frac,
        min_alpha_frac=a.min_alpha_frac,
        max_bucket_size=a.lsh_max_bucket,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
