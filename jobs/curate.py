"""spark-submit entry point: training-data curation pipeline.

    spark-submit --py-files plugin_debezium_spark.zip jobs/curate.py \
        --input /lake/documents --output /lake/curated \
        --min-words 5 --max-rep-frac 0.3

Composes the pipeline operators end-to-end over a documents table
(doc_id, text, ...):

  0. boilerplate    — (optional, --strip-dup-paragraphs) rewrite every
                      doc with corpus-wide duplicate paragraphs
                      stripped, canonical occurrence kept (CCNet
                      order: strip boilerplate BEFORE quality so nav
                      bars/license blocks don't prop up bad docs)
  1. quality gate   — Gopher-style integer signals (word count, mean
                      word length, alpha fraction, trigram repetition)
  2. exact dedup    — keep the min-id representative per content hash
  3. near-dup dedup — MinHash-LSH candidate pairs → connected
                      components → keep the min-id rep per cluster
  4. decontaminate  — (optional, --contamination <path>) drop docs
                      sharing word n-grams with a held-out eval set
  4b. source quota  — (optional, --source-quota N) at most N docs per
                      source, content-addressed selection (salted
                      two-phase top-N)
  5. split          — deterministic sha-bucketed train/val/test
  5b. packing       — (optional, --pack-block B) concat-and-chunk
                      placement columns per split (tok_offset,
                      first/last block)
  6. write          — parquet partitioned by split

Every stage is a declarative DataFrame plan (one pass each, no
driver-side loops except the bounded component iteration); stage
counts are printed as one JSON line for lineage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def curate(
    spark,
    df,
    min_words: int = 5,
    max_rep_frac: float = 0.5,
    min_alpha_frac: float = 0.5,
    lsh_perms: int = 8,
    lsh_bands: int = 2,
    max_bucket_size: int | None = 1000,
    contamination=None,
    max_contam_hits: int = 0,
    contam_ngram: int = 3,
    strip_dup_paragraphs: bool = False,
    quality_clf: bool = False,
    clf_buckets: int = 1 << 18,
    clf_min_score: int = 0,
    source_quota: int | None = None,
    source_col: str = "source",
    pack_block_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The pipeline as a library function (the CLI is a thin shell).
    Returns (curated DataFrame with a `split` column, stage-count dict).
    Ratio thresholds compare via integer cross-multiplication — no
    float boundary ambiguity.

    Each stage's survivor frame is CACHED before its lineage count —
    without the cache boundary every stage count re-runs the whole
    upstream plan (quality trigrams + LSH re-executed once per later
    stage: O(stages²) work, measured 5x wall at 100k docs). The caches
    stay alive inside the returned DataFrame's lineage; call
    ``result._curate_caches_release()`` after the final action to drop
    them (same release-handle pattern as the engine's epoch cache)."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.functions.text import hash_split
    from plugin_debezium_spark.operators.neardup import (
        dedup_cluster_reps,
        exact_dedup,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    stats: dict[str, int] = {"input": df.count()}
    _caches = []

    def _stage(frame, name: str):
        frame = frame.cache()
        _caches.append(frame)
        stats[name] = frame.count()
        return frame

    # 0. optional cross-document boilerplate strip: rewrite text with
    # corpus-wide duplicate paragraphs removed (canonical first
    # occurrence kept). Runs before quality so repeated headers/nav/
    # license blocks can't prop up an otherwise-empty doc; a doc
    # stripped to nothing then fails min_words naturally.
    if strip_dup_paragraphs:
        from plugin_debezium_spark.operators.decontam import (
            remove_duplicate_paragraphs,
        )

        rw = remove_duplicate_paragraphs(df, id_col=id_col, text_col=text_col)
        stats["paragraph_dedup_rewritten"] = rw.filter(
            F.col("kept_paras") < F.col("n_paras")
        ).count()
        df = df.drop(text_col).join(
            rw.select(id_col, F.col("text_dedup").alias(text_col)), id_col
        )

    # 1. quality gate — THE shared derivation (jobs/quality_gate.py:
    # word_shingles_expr trigrams + gopher stats + integer
    # cross-multiplied thresholds) so this gate, the incremental job's
    # gate, the classifier's weak labels, the text_gopher_quality
    # query, and its DuckDB oracle can never desync
    from jobs.quality_gate import quality_gate_predicate, quality_gate_stats

    q = quality_gate_stats(df, id_col, text_col)
    gate = quality_gate_predicate(min_words, max_rep_frac, min_alpha_frac)
    kept = _stage(q.filter(gate).select(df["*"]), "after_quality")

    # 1b. optional supervised quality filter: a fastText-shape linear
    # classifier (operators/qualityclf.py) trained ON THE GATE'S OWN
    # weak labels over the full input (pass/fail as 1/0), then applied
    # to the gate's survivors — docs whose hashed-gram evidence scores
    # below clf_min_score are dropped even though they squeaked past
    # the heuristic thresholds (the CCNet/LLaMA-style model-based
    # second opinion). Integer-exact: training is one
    # map-side-combined groupBy, the ≤clf_buckets-row model broadcasts.
    if quality_clf:
        from plugin_debezium_spark.operators.qualityclf import (
            hashed_features,
            score_documents,
            train_linear_classifier,
        )

        labels = q.select(
            F.col(id_col),
            gate.cast("long")
            .alias("label"),
        )
        feats = hashed_features(
            df, text_col=text_col, id_col=id_col, n_buckets=clf_buckets
        )
        weights = train_linear_classifier(feats, labels, id_col=id_col)
        scores = score_documents(feats, weights, id_col=id_col)
        kept = _stage(
            kept.join(
                scores.filter(F.col("clf_score") >= clf_min_score).select(
                    id_col
                ),
                id_col,
                "left_semi",
            ),
            "after_quality_clf",
        )

    # 2. exact dedup: keep each content hash's min-id doc
    reps = exact_dedup(kept, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept = _stage(kept.join(reps, id_col, "left_semi"), "after_exact_dedup")

    # 3. near-dup clusters: keep each component's min-id doc
    sigs = minhash_signatures(
        kept, text_col=text_col, id_col=id_col, n_perms=lsh_perms
    )
    pairs = minhash_lsh_candidates(
        sigs,
        id_col=id_col,
        n_perms=lsh_perms,
        bands=lsh_bands,
        max_bucket_size=max_bucket_size,
    )
    clusters = dedup_cluster_reps(kept, pairs, id_col=id_col)
    kept = _stage(
        kept.join(
            clusters.filter("is_rep").select(id_col), id_col, "left_semi"
        ),
        "after_neardup",
    )

    # 4. optional eval-set decontamination: drop any doc whose
    # distinct n-gram overlap with the held-out set exceeds the
    # budget (default 0 — strict eval hygiene)
    if contamination is not None:
        from plugin_debezium_spark.operators.decontam import ngram_overlap

        hits = ngram_overlap(
            kept,
            contamination,
            n=contam_ngram,
            id_col=id_col,
            text_col=text_col,
        )
        clean = hits.filter(
            F.col("contam_hits") <= F.lit(max_contam_hits)
        ).select(id_col)
        kept = _stage(kept.join(clean, id_col, "left_semi"), "after_decontam")

    # 4b. optional per-source quota: at most N docs per source, chosen
    # by content-addressed sha (reproducible unbiased sample); salted
    # two-phase top-N so a hot domain never single-tasks a window
    if source_quota is not None:
        from plugin_debezium_spark.operators.quotas import top_n_per_group

        kept = _stage(
            top_n_per_group(
                kept,
                group_col=source_col,
                n=source_quota,
                order_col=F.sha2(
                    F.concat(F.lit("quota:v1"), F.col(id_col).cast("string")),
                    256,
                ),
                id_col=id_col,
            ).drop("qrank"),
            "after_source_quota",
        )

    # 5. deterministic split
    out = kept.withColumn("split", hash_split(id_col))

    # 5b. optional sequence packing: each split packed as its own
    # token stream (concat-and-chunk placement columns ride along)
    if pack_block_tokens is not None:
        from plugin_debezium_spark.operators.packing import pack_sequences

        out = out.cache()  # the pack join reads `out` twice
        _caches.append(out)
        placed = pack_sequences(
            out,
            block_tokens=pack_block_tokens,
            id_col=id_col,
            text_col=text_col,
            group_cols=("split",),
        )
        out = out.join(placed, [id_col, "split"])

    def _release() -> None:
        for c in _caches:
            c.unpersist()

    out._curate_caches_release = _release
    return out, stats


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--max-rep-frac", type=float, default=0.5)
    p.add_argument("--min-alpha-frac", type=float, default=0.5)
    p.add_argument("--lsh-max-bucket", type=int, default=1000)
    p.add_argument(
        "--contamination",
        default=None,
        help="parquet path of held-out eval docs (same text column); "
        "docs overlapping it are dropped",
    )
    p.add_argument("--max-contam-hits", type=int, default=0)
    p.add_argument("--contam-ngram", type=int, default=3)
    p.add_argument(
        "--source-quota",
        type=int,
        default=None,
        help="keep at most N docs per source (content-addressed "
        "selection; salted two-phase top-N)",
    )
    p.add_argument(
        "--pack-block",
        type=int,
        default=None,
        help="annotate each doc with its concat-and-chunk placement "
        "(tok_offset, first/last block) per split at this block size",
    )
    p.add_argument(
        "--quality-clf",
        action="store_true",
        help="second-opinion supervised quality filter: linear "
        "classifier over hashed uni/bi-grams trained on the gate's "
        "weak labels; drops gate survivors scoring < --clf-min-score",
    )
    p.add_argument("--clf-min-score", type=int, default=0)
    p.add_argument(
        "--strip-dup-paragraphs",
        action="store_true",
        help="rewrite docs with corpus-wide duplicate paragraphs "
        "stripped (canonical occurrence kept) before the quality gate",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from plugin_debezium_spark.session import get_spark

        spark = get_spark("curate")

    df = spark.read.parquet(args.input)
    contamination = (
        spark.read.parquet(args.contamination) if args.contamination else None
    )
    out, stats = curate(
        spark,
        df,
        min_words=args.min_words,
        max_rep_frac=args.max_rep_frac,
        min_alpha_frac=args.min_alpha_frac,
        max_bucket_size=args.lsh_max_bucket,
        contamination=contamination,
        max_contam_hits=args.max_contam_hits,
        contam_ngram=args.contam_ngram,
        strip_dup_paragraphs=args.strip_dup_paragraphs,
        quality_clf=args.quality_clf,
        clf_min_score=args.clf_min_score,
        source_quota=args.source_quota,
        pack_block_tokens=args.pack_block,
    )
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    out._curate_caches_release()
    stats["written"] = spark.read.parquet(args.output).count()
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
