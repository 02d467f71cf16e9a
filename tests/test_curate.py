"""End-to-end curation pipeline (jobs/curate.py): quality gate →
exact dedup → near-dup clustering → deterministic split → write."""

import json
import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from jobs.curate import curate  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_curate_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out, stats = curate(spark, docs, min_words=3, max_rep_frac=0.9)
    rows = out.collect()
    # monotone stage counts, nothing invented
    assert (
        stats["input"]
        >= stats["after_quality"]
        >= stats["after_exact_dedup"]
        >= stats["after_neardup"]
        == len(rows)
    )
    assert stats["after_neardup"] > 0
    ids = {r["doc_id"] for r in rows}
    src_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids <= src_ids
    # exact dedup held: no two survivors share a text hash
    hashes = [r for (r,) in out.select(F.sha2("text", 256)).collect()]
    assert len(hashes) == len(set(hashes))
    # split values valid and deterministic across recomputation
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    again = {
        (r["doc_id"], r["split"])
        for r in curate(spark, docs, min_words=3, max_rep_frac=0.9)[0]
        .select("doc_id", "split")
        .collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in rows}


def test_curate_quality_gate_oracle(spark):
    """The quality stage equals an independent pandas recomputation of
    the same integer thresholds."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out, _ = curate(
        spark, docs, min_words=4, max_rep_frac=0.4, min_alpha_frac=0.5
    )
    # recompute the gate in pandas (dedup stages only ever REMOVE rows,
    # so the curated ids must be a subset of the pandas-gated ids, and
    # every removed id must be explained by a duplicate cluster)
    pdf = docs.select("doc_id", "text").toPandas()

    def gate(text):
        words = [w for w in text.strip().split() if w]
        if len(words) < 4:
            return False
        alpha = sum(1 for w in words if any(c.isalpha() and ord(c) < 128 for c in w))
        # n_alpha/n >= 0.5  <=>  2*n_alpha >= n
        if 2 * alpha < len(words):
            return False
        raw = text.strip().split()
        tris = [
            " ".join(raw[i : i + 3])
            for i in range(max(len(raw) - 2, 1))
        ] or [""]
        from collections import Counter

        c = Counter(tris)
        # rep_max/total <= 0.4  <=>  5*rep_max <= 2*total
        return 5 * max(c.values()) <= 2 * sum(c.values())

    gated = {r.doc_id for r in pdf.itertuples() if gate(r.text)}
    curated = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert curated <= gated


def test_curate_cli_writes_partitioned(spark, tmp_path):
    import jobs.curate as jc

    out_dir = str(tmp_path / "curated")
    rc = jc.main(
        [
            "--input",
            f"{SF}/documents.parquet",
            "--output",
            out_dir,
            "--min-words",
            "3",
            "--max-rep-frac",
            "0.9",
        ]
    )
    assert rc == 0
    back = spark.read.parquet(out_dir)
    assert back.count() > 0
    assert "split" in back.columns
    # physically partitioned by split
    assert any(
        n.startswith("split=") for n in os.listdir(out_dir)
    )


def test_curate_decontamination_stage(spark):
    """With a contamination set drawn from the corpus itself, the
    overlapping survivors are dropped; a disjoint set drops none."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    contam = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    out, stats = curate(
        spark, docs, min_words=3, max_rep_frac=0.9, contamination=contam
    )
    assert stats["after_decontam"] <= stats["after_neardup"]
    assert stats["after_decontam"] < stats["after_neardup"]  # real overlap
    survivors = {r["doc_id"] for r in out.select("doc_id").collect()}
    # every doc in the contamination id set that survived to stage 3
    # must be gone (it trivially overlaps itself)
    contam_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 50 == 0)
        .select("doc_id")
        .collect()
    }
    assert not (survivors & contam_ids)

    disjoint = spark.createDataFrame(
        [("zq xv wk qj zz yy xx ww vv uu",)], "text string"
    )
    out2, stats2 = curate(
        spark, docs, min_words=3, max_rep_frac=0.9, contamination=disjoint
    )
    assert stats2["after_decontam"] == stats2["after_neardup"]


def test_curate_strip_dup_paragraphs_stage(spark):
    """The optional boilerplate strip rewrites shared paragraphs out of
    non-canonical docs BEFORE the quality gate; a doc reduced to pure
    boilerplate then fails min_words and drops out entirely."""
    docs = spark.createDataFrame(
        [
            (1, "NAV BAR HOME ABOUT\nreal article text body one here today"),
            (2, "NAV BAR HOME ABOUT\nreal article text body two goes there"),
            # pure boilerplate: nothing left after the strip
            (3, "NAV BAR HOME ABOUT"),
            (4, "fully original document body with plenty of words inside"),
        ],
        "doc_id long, text string",
    )
    out, stats = curate(
        spark,
        docs,
        min_words=5,
        max_rep_frac=0.9,
        strip_dup_paragraphs=True,
    )
    # docs 2 and 3 lost their shared paragraph (doc 1 is canonical)
    assert stats["paragraph_dedup_rewritten"] == 2
    survivors = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 3 not in survivors  # stripped to empty -> fails min_words
    assert {1, 2, 4} <= survivors
    # the rewrite actually removed the nav bar from doc 2's text
    t2 = out.filter("doc_id = 2").select("text").collect()[0][0]
    assert "NAV BAR" not in t2 and "body two" in t2


def test_curate_source_quota_and_packing_stages(spark):
    """--source-quota caps docs per source (content-addressed pick);
    --pack-block annotates per-split placements that tile each split's
    token stream exactly."""
    docs = spark.createDataFrame(
        [
            (
                i,
                f"document body number {i} with several plain words "
                f"inside the text {i}",
                "hot" if i < 40 else f"s{i % 3}",
            )
            for i in range(52)
        ],
        "doc_id long, text string, source string",
    )
    out, stats = curate(
        spark,
        docs,
        min_words=3,
        max_rep_frac=0.9,
        source_quota=5,
        pack_block_tokens=8,
    )
    rows = out.collect()
    per_source = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert all(v <= 5 for v in per_source.values()), per_source
    assert stats["after_source_quota"] == len(rows)
    # placements tile each split's stream
    for split in {r["split"] for r in rows}:
        srows = sorted(
            (r for r in rows if r["split"] == split),
            key=lambda r: r["tok_offset"],
        )
        pos = 0
        for r in srows:
            assert r["tok_offset"] == pos
            assert r["first_block"] == pos // 8
            assert r["last_block"] == (pos + r["n_tokens"] - 1) // 8
            pos += r["n_tokens"]


def test_curate_quality_clf_stage(spark):
    """The supervised second-opinion stage: output is a subset of the
    gate's survivors, the stage count lands between gate and exact
    dedup, and the selection is deterministic. With the margin pushed
    impossibly high, everything is dropped (the filter is real)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base, bstats = curate(spark, docs, min_words=3, max_rep_frac=0.9)
    out, stats = curate(
        spark, docs, min_words=3, max_rep_frac=0.9,
        quality_clf=True, clf_buckets=4096,
    )
    assert (
        stats["after_quality"]
        >= stats["after_quality_clf"]
        >= stats["after_exact_dedup"]
    )
    assert stats["after_quality_clf"] > 0
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    # classifier can only REMOVE relative to the heuristic-only run
    assert ids <= base_ids
    again, stats2 = curate(
        spark, docs, min_words=3, max_rep_frac=0.9,
        quality_clf=True, clf_buckets=4096,
    )
    assert stats2["after_quality_clf"] == stats["after_quality_clf"]
    nothing, nstats = curate(
        spark, docs, min_words=3, max_rep_frac=0.9,
        quality_clf=True, clf_buckets=4096,
        clf_min_score=1 << 60,
    )
    assert nstats["after_quality_clf"] == 0
    for f in (base, out, again, nothing):
        f._curate_caches_release()
