"""Hashed-feature linear quality classifier (operators/qualityclf.py):
integer-exact training/scoring vs a pure-Python reference, separation
on weak labels, held-out behavior."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.qualityclf import (
    hashed_features,
    score_documents,
    train_linear_classifier,
)

N_BUCKETS = 64


def _sha_bucket(gram: str) -> int:
    return int(hashlib.sha256(gram.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _ref_feats(docs: dict[int, str], max_ngram: int = 2):
    """Pure-Python mirror of hashed_features."""
    out: dict[tuple[int, int], int] = {}
    for did, text in docs.items():
        words = [w for w in text.strip().split() if w]
        grams = list(words)
        for n in range(2, max_ngram + 1):
            grams += [
                " ".join(words[i:i + n]) for i in range(len(words) - n + 1)
            ]
        for g in grams:
            k = (did, _sha_bucket(g))
            out[k] = out.get(k, 0) + 1
    return out


DOCS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "spam spam buy now spam click here spam",
    2: "a thoughtful essay about the quick brown fox and its habits",
    3: "buy buy buy click click spam now",
    4: "",
}
LABELS = {0: 1, 1: 0, 2: 1, 3: 0, 4: 0}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [(k, v) for k, v in DOCS.items()], columns=["doc_id", "text"]
        )
    )


@pytest.fixture(scope="module")
def labels_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [(k, v) for k, v in LABELS.items()], columns=["doc_id", "label"]
        )
    )


def test_features_match_python_reference(spark, docs_df):
    feats = hashed_features(docs_df, n_buckets=N_BUCKETS, max_ngram=2)
    got = {
        (r["doc_id"], r["bucket"]): r["tf"] for r in feats.collect()
    }
    assert got == _ref_feats(DOCS)


def test_train_and_score_match_python_reference(spark, docs_df, labels_df):
    feats = hashed_features(docs_df, n_buckets=N_BUCKETS, max_ngram=2)
    weights = train_linear_classifier(feats, labels_df)
    scores = score_documents(feats, weights)

    ref_f = _ref_feats(DOCS)
    ref_w: dict[int, int] = {}
    for (did, b), tf in ref_f.items():
        ref_w[b] = ref_w.get(b, 0) + (tf if LABELS[did] == 1 else -tf)
    ref_s = {did: 0 for did in DOCS}
    for (did, b), tf in ref_f.items():
        ref_s[did] += tf * ref_w[b]

    got_w = {r["bucket"]: r["weight"] for r in weights.collect()}
    assert got_w == {b: w for b, w in ref_w.items()}
    got_s = {r["doc_id"]: r["clf_score"] for r in scores.collect()}
    # empty doc 4 has no features → no score row (query layer re-spines)
    assert got_s == {d: s for d, s in ref_s.items() if d != 4}


def test_separates_training_labels(spark, docs_df, labels_df):
    feats = hashed_features(docs_df, n_buckets=N_BUCKETS, max_ngram=2)
    w = train_linear_classifier(feats, labels_df)
    s = {r["doc_id"]: r["clf_score"] for r in score_documents(feats, w).collect()}
    assert min(s[0], s[2]) > max(s[1], s[3])


def test_heldout_unseen_tokens_score_zero(spark, docs_df, labels_df):
    feats = hashed_features(docs_df, n_buckets=N_BUCKETS, max_ngram=2)
    w = train_linear_classifier(feats, labels_df)
    held = spark.createDataFrame(
        pd.DataFrame([(99, "zzzq1 zzzq2 zzzq3")], columns=["doc_id", "text"])
    )
    hf = hashed_features(held, n_buckets=N_BUCKETS, max_ngram=2)
    rows = score_documents(hf, w).collect()
    # unseen grams may still hash-collide into trained buckets at 64
    # buckets; the contract is a ROW exists and is the exact integer
    # dot product (here: assert it equals the reference computation)
    ref_w: dict[int, int] = {}
    for (did, b), tf in _ref_feats(DOCS).items():
        ref_w[b] = ref_w.get(b, 0) + (tf if LABELS[did] == 1 else -tf)
    exp = sum(
        ref_w.get(_sha_bucket(g), 0)
        for g in ["zzzq1", "zzzq2", "zzzq3", "zzzq1 zzzq2", "zzzq2 zzzq3"]
    )
    assert [(r["doc_id"], r["clf_score"]) for r in rows] == [(99, exp)]


def test_driver_query_spines_empty_docs(spark):
    """The registered query keeps a row for gram-less docs."""
    from plugin_debezium_spark.queries_data import text_quality_clf

    out = text_quality_clf(spark, "/root/testdata/sf0.001")
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert out.count() == d.count()
    assert out.filter(F.col("clf_score").isNull()).count() == 0
