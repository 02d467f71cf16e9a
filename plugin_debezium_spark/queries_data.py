"""Training-data pipeline queries (dedup / similarity / text /
multimodal) over the driver's documents + embeddings tables, each with
a DuckDB oracle computing the same sha256-derived formulas.

Float-compare hazards are engineered out: pair filters use integer
cross-multiplication instead of ratio thresholds, rankings use
deterministic tiebreaks, and scores are integers wherever possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plugin_debezium_spark.functions.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    lang_scores,
    token_count,
)
from plugin_debezium_spark.operators.neardup import (
    _P,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from plugin_debezium_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_features,
)
from plugin_debezium_spark.operators.similarity import brute_force_topk


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """The fixture tables are single small parquet files with one row
    group, so they scan as ONE task (CLAUDE.md) and every per-row-
    expensive stage (shingle explode, sha256, pandas-UDF scoring)
    downstream of the scan runs serially. Spread the rows across the
    cluster first — measured 5-7x on the heavy text/dedup queries at
    sf0.1 (r07). Explicit numPartitions so AQE's coalescing doesn't
    fold the tiny exchange back to one partition; results are
    partition-independent (all derivations are content-addressed).
    Applied only to queries whose per-row work dominates — the
    exchange costs ~0.1 s, which matters on the sub-second cells."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def _docs_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(_docs(spark, sf_dir))


def _embs_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(_embs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def dedup_minhash_signatures(spark, sf_dir):
    return minhash_signatures(
        _docs_s(spark, sf_dir), n_perms=8, shingle_words=3
    )


def dedup_minhash_lsh_pairs(spark, sf_dir):
    sigs = minhash_signatures(_docs_s(spark, sf_dir), n_perms=8, shingle_words=3)
    return minhash_lsh_candidates(sigs, n_perms=8, bands=2)


def dedup_ngram_jaccard(spark, sf_dir):
    out = ngram_jaccard_pairs(
        _docs_s(spark, sf_dir),
        group_col="source",
        shingle_words=3,
        threshold=0.0,
    )
    # integer-exact filter: jaccard >= 2% without float comparison
    return out.filter(
        F.col("n_inter") * 50 >= (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    ).select("id_a", "id_b", "n_inter", "n_a", "n_b")


def dedup_ngram_jaccard_capped(spark, sf_dir):
    """Scale-capped n-gram Jaccard: shingles whose document frequency
    exceeds 8 are excluded from candidate generation (max_doc_freq in
    operators/neardup.py) — the inverted-index fan-out stays bounded on
    stop-shingle-heavy corpora; n_inter becomes a lower bound for pairs
    whose overlap includes capped shingles."""
    out = ngram_jaccard_pairs(
        _docs_s(spark, sf_dir),
        group_col="source",
        shingle_words=3,
        threshold=0.0,
        max_doc_freq=8,
    )
    return out.filter(
        F.col("n_inter") * 50
        >= (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    ).select("id_a", "id_b", "n_inter", "n_a", "n_b")


def dedup_minhash_lsh_capped(spark, sf_dir):
    """LSH candidate pairs with the degenerate-bucket cap: (band,
    bucket) groups larger than 4 are dropped from pair generation
    (max_bucket_size), bounding the k²/2 tail."""
    sigs = minhash_signatures(
        _docs_s(spark, sf_dir), n_perms=8, shingle_words=3
    )
    return minhash_lsh_candidates(
        sigs, n_perms=8, bands=2, max_bucket_size=4
    )


def dedup_clusters(spark, sf_dir):
    """Duplicate CLUSTERS: connected components (iterative min-label
    propagation) over the MinHash-LSH candidate pairs — every doc gets
    its component's min doc_id as cluster, singletons label themselves,
    is_rep marks the row a dedup pass keeps. The oracle computes the
    same transitive closure with a recursive CTE."""
    from plugin_debezium_spark.operators.neardup import dedup_cluster_reps

    d = _docs_s(spark, sf_dir)
    sigs = minhash_signatures(d, n_perms=8, shingle_words=3)
    pairs = minhash_lsh_candidates(sigs, n_perms=8, bands=2)
    return dedup_cluster_reps(d, pairs)


def dedup_clusters_star(spark, sf_dir):
    """Same duplicate clusters via the LARGE-STAR/SMALL-STAR
    formulation (log-diameter rounds — the long-chain scale path next
    to dedup_clusters' per-hop label propagation). Identical output
    contract, so it shares dedup_clusters' recursive-CTE oracle."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.neardup import (
        connected_components_star,
    )

    d = _docs_s(spark, sf_dir)
    sigs = minhash_signatures(d, n_perms=8, shingle_words=3)
    pairs = minhash_lsh_candidates(sigs, n_perms=8, bands=2)
    cc = connected_components_star(pairs, nodes=d.select("doc_id"))
    return cc.select(
        F.col("id").alias("doc_id"),
        "cluster",
        (F.col("id") == F.col("cluster")).alias("is_rep"),
    )


def dedup_simhash(spark, sf_dir):
    return simhash(_docs_s(spark, sf_dir), n_bits=16)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def text_token_counts(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    )


def text_quality_features(spark, sf_dir):
    d = _docs(spark, sf_dir)
    from plugin_debezium_spark.functions.text import occurrences

    stop = sum(occurrences("text", w) for w in ("the", "a", "of"))
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        stop.alias("stop_hits"),
    )


def text_gopher_quality(spark, sf_dir):
    """Gopher-style quality signals, integer-exact: word count, total
    word chars (→ mean word length), words containing a letter
    (→ alpha fraction), and trigram repetition (max trigram count /
    total trigrams → repeated-content share). All components integers
    so both engines agree bit-for-bit; ratios are one division away."""
    from plugin_debezium_spark.functions.text import gopher_word_stats
    from plugin_debezium_spark.operators.neardup import word_shingles_expr

    d = _docs_s(spark, sf_dir)
    base = d.select("doc_id", *gopher_word_stats("text"))
    tri = d.select(
        "doc_id",
        F.explode(F.expr(word_shingles_expr("text", 3))).alias("tri"),
    )
    rep = (
        tri.groupBy("doc_id", "tri")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("rep_max_tri"),
            F.sum("c").alias("rep_tri_total"),
        )
    )
    return base.join(rep, "doc_id")


def text_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment per document via
    sha-bucketed ranges — stable under corpus growth and engine choice
    (content-addressed, no RNG); per-split counts as the check."""
    from plugin_debezium_spark.functions.text import hash_split

    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", hash_split("doc_id").alias("split"))
        .groupBy("split")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("min_doc"))
        .orderBy("split")
    )


def text_lang_id(spark, sf_dir):
    d = _docs_s(spark, sf_dir)
    scores = lang_scores("text")
    return d.select(
        "doc_id",
        lang_id("text").alias("predicted"),
        *[scores[lang].alias(f"s_{lang}") for lang in sorted(LANG_MARKERS)],
    )


def text_normalize_scrub(spark, sf_dir):
    """Normalization + PII scrub over documents: the cleaned canonical
    text plus its dedup hash."""
    from plugin_debezium_spark.functions.text import normalize_text, scrub_pii

    d = _docs(spark, sf_dir)
    clean = normalize_text(scrub_pii("text"))
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.sha2(clean, 256).alias("clean_sha256"),
    )


def text_decontaminate(spark, sf_dir):
    """Eval-set decontamination (GPT-3-style n-gram overlap check):
    docs with doc_id % 100 == 0 act as the held-out benchmark; every
    other doc reports how many of its distinct 3-gram shingles appear
    anywhere in that set (operators/decontam.ngram_overlap — distinct
    shingles, hits-only join, contamination side broadcastable).
    Integer counts only; a strict pipeline drops contam_hits > 0."""
    d = _docs_s(spark, sf_dir)
    from plugin_debezium_spark.operators.decontam import ngram_overlap

    ev = d.filter(F.col("doc_id") % 100 == 0)
    train = d.filter(F.col("doc_id") % 100 != 0)
    return ngram_overlap(train, ev, n=3)


def text_duplicate_lines(spark, sf_dir):
    """CCNet-style cross-document boilerplate: per-doc count of
    distinct trimmed lines that occur in >= 2 documents corpus-wide
    (operators/decontam.duplicate_line_stats — explode, distinct,
    map-side-combined global line count, per-doc rollup)."""
    from plugin_debezium_spark.operators.decontam import (
        duplicate_line_stats,
    )

    return duplicate_line_stats(_docs(spark, sf_dir))


def text_dedup_paragraphs(spark, sf_dir):
    """MassiveText/CCNet-style cross-document duplicate-paragraph
    REMOVAL (operators/decontam.remove_duplicate_paragraphs): every
    doc is rewritten with corpus-wide duplicate paragraphs stripped,
    keeping the canonical first occurrence (min doc_id, min position).

    The fixture's texts are single-line word streams, so the query
    first paragraphizes deterministically — the word stream chunked
    into 4-word lines (identical `slice` arithmetic in both engines)
    — which yields real cross-doc duplicates (~6% of occurrences at
    sf0.01) so the drop path is genuinely exercised, not just the
    identity path."""
    from plugin_debezium_spark.operators.decontam import (
        remove_duplicate_paragraphs,
    )

    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    w = 4
    nlines = F.ceil(F.size(words) / F.lit(w)).cast("int")
    text2 = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nlines - F.lit(1)),
            lambda i: F.array_join(
                F.slice(words, i * w + F.lit(1), F.lit(w)), " "
            ),
        ),
        "\n",
    )
    docs2 = d.select("doc_id", text2.alias("text"))
    return remove_duplicate_paragraphs(docs2)


def text_dup_spans(spark, sf_dir):
    """Exact-substring duplication stats (Lee et al. 2022 at 5-word
    shingle granularity): cross-doc duplicated shingles merged into
    maximal per-doc spans (operators/neardup.duplicate_ngram_spans);
    one row per doc with words covered by duplicated spans."""
    from plugin_debezium_spark.operators.neardup import (
        duplicate_ngram_spans,
    )

    return duplicate_ngram_spans(_docs_s(spark, sf_dir), n=5, min_docs=2)


def text_mix_weights(spark, sf_dir):
    """Deterministic dataset mixing (operators/mixing.mix_by_weights):
    sample/repeat each lang stratum to a target weight — en
    down-sampled 0.5x, de doubled, fr 1.25x (every row once, a
    content-addressed quarter twice), es 0.0375x, zh dropped
    (absent from the allowlist). Up-sampled rows carry copy=1..n."""
    from plugin_debezium_spark.operators.mixing import mix_by_weights

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return mix_by_weights(
        d,
        {"en": 0.5, "de": 2.0, "fr": 1.25, "es": 0.0375},
        strata_col="lang",
    )


def text_pack_sequences(spark, sf_dir):
    """Deterministic concat-and-chunk sequence packing
    (operators/packing.pack_sequences): docs laid end-to-end in
    content-addressed sha order and cut into 512-token training
    blocks. The cumulative sum is two-phase (per-sha-bucket windows +
    a broadcast prefix of the ≤2^bits bucket totals) so no partition
    ever holds more than 2^-bits of the corpus; the oracle is the
    equivalent single global window."""
    from plugin_debezium_spark.operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), block_tokens=512)


def text_lm_freq(spark, sf_dir):
    """CCNet-shaped LM-quality proxy (operators/lmscore.ngram_lm_freq):
    per-doc corpus bigram-frequency stats as integer components —
    sum_freq/n_ngrams is the perplexity proxy the quality bucketing
    cross-multiplies on."""
    from plugin_debezium_spark.operators.lmscore import ngram_lm_freq

    return ngram_lm_freq(_docs_s(spark, sf_dir), n=2)


def text_source_quota(spark, sf_dir):
    """Per-source quota (operators/quotas.top_n_per_group): keep at
    most 10 docs per source, selected by content-addressed sha order —
    the salted two-phase top-N whose selection equals the oracle's
    single global window."""
    from plugin_debezium_spark.operators.quotas import top_n_per_group

    d = _docs(spark, sf_dir).select("doc_id", "source")
    ok = F.sha2(
        F.concat(F.lit("quota:v1"), F.col("doc_id").cast("string")), 256
    )
    return top_n_per_group(
        d, group_col="source", n=10, order_col=ok, id_col="doc_id"
    )


def text_fingerprint(spark, sf_dir):
    d = _docs_s(spark, sf_dir)
    return d.select(
        "doc_id", doc_fingerprint("text", k=8, stride=4).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# Similarity / multimodal
# ---------------------------------------------------------------------------


def emb_topk_bruteforce(spark, sf_dir):
    e = _embs_s(spark, sf_dir)
    return brute_force_topk(
        e.filter(F.col("vec_id") >= 5), e.filter(F.col("vec_id") < 5), k=3
    ).select("query_id", "rank", "neighbor_id")


def emb_topk_bruteforce_numpy(spark, sf_dir):
    """The numpy throughput path (mapInPandas batch matmul + partial
    per-batch top-k; operators/similarity._brute_force_topk_numpy) —
    measured ~20x the SQL expression path at 400k vectors. Integer
    output (ranks only), so the same oracle applies: ranks agree with
    the bit-exact SQL path absent exact-cosine float ties."""
    e = _embs(spark, sf_dir)
    return brute_force_topk(
        e.filter(F.col("vec_id") >= 5),
        e.filter(F.col("vec_id") < 5),
        k=3,
        impl="numpy",
    ).select("query_id", "rank", "neighbor_id")


def emb_topk_lsh(spark, sf_dir):
    """Approximate ANN via sha-derived hyperplane buckets (pandas-UDF
    integer-matmul signatures) — the bucket assignment is exact integer
    arithmetic, so the DuckDB oracle regenerates identical buckets."""
    from plugin_debezium_spark.operators.similarity import lsh_topk

    e = _embs(spark, sf_dir)
    dim = len(e.select("embedding").first()[0])
    assert dim == _EMB_DIM, f"oracle is generated for dim={_EMB_DIM}"
    # NOT spread: the signature pass is a tiny integer matmul, so the
    # spread exchange is pure overhead relative to the work — measured
    # 0.78 vs 1.0 s healthy but 2.8 vs 1.35 s inside a degraded window
    # (the exchange is page-touch-bound, the matmul is not; r07)
    return lsh_topk(
        e.filter(F.col("vec_id") >= 5),
        e.filter(F.col("vec_id") < 5),
        dim=dim,
        k=3,
        n_planes=4,
    ).select("query_id", "rank", "neighbor_id")


def emb_topk_lsh_multiprobe(spark, sf_dir):
    """LSH ANN with ±1-bit multiprobe (round-4 item: the recall knob
    the lsh_topk docstring promises). Query buckets fan out to the
    exact bucket plus every single-bit flip — deterministic probe
    order, so the oracle enumerates the identical probe set with
    xor(). Recall vs brute force is strictly higher than the
    single-bucket variant on this fixture (asserted in
    tests/test_dataops.py)."""
    from plugin_debezium_spark.operators.similarity import lsh_topk

    e = _embs(spark, sf_dir)
    dim = len(e.select("embedding").first()[0])
    assert dim == _EMB_DIM, f"oracle is generated for dim={_EMB_DIM}"
    return lsh_topk(
        _spread(e.filter(F.col("vec_id") >= 5)),
        e.filter(F.col("vec_id") < 5),
        dim=dim,
        k=3,
        n_planes=4,
        multiprobe=1,
    ).select("query_id", "rank", "neighbor_id")


def emb_neardup_pairs_exact(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, exact all-pairs variant
    (the LSH-bucketed scale path is emb_topk_lsh / cosine_neardup_pairs).
    Threshold filter uses identical double arithmetic on both engines."""
    from plugin_debezium_spark.operators.similarity import (
        dot_over_norms,
        norm_expr,
    )

    e = _embs_s(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("va"),
        F.expr(norm_expr("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("vb"),
        F.expr(norm_expr("embedding")).alias("nb"),
    )
    # label-blocking bounds the pair space (classic near-dup blocking;
    # the unblocked scale path is the LSH variant).
    # Float-threshold caveat (accepted risk): both engines compute the
    # same dot/(na*nb) in doubles, but summation internals are not
    # specified — a pair within ~1 ulp of the threshold could diverge.
    # With 64-dim random data the nearest observed cosine to the
    # threshold is >> 1e-12 away; revisit if a dataset ever lands a
    # pair on the boundary.
    return (
        a.join(b, (F.col("id_a") < F.col("id_b")) & (F.col("la") == F.col("lb")))
        .filter(F.expr(dot_over_norms("va", "vb", "na", "nb")) >= 0.25)
        .select("id_a", "id_b")
    )


def emb_topk_ivf(spark, sf_dir):
    """IVF approximate ANN: 4 deterministic centroids (the lowest-id
    corpus vectors — in production the coarse quantizer is trained
    offline and shipped), corpus in 1 inverted list each, queries
    probe nprobe=2 lists. Same deterministic tie-breaks as the
    bruteforce/LSH variants; the oracle reproduces the double
    arithmetic exactly (JVM left-to-right sums == list_dot_product)."""
    from plugin_debezium_spark.operators.similarity import ivf_topk

    e = _embs(spark, sf_dir)
    cent = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") <= 8)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    return ivf_topk(
        e.filter(F.col("vec_id") >= 5),
        e.filter(F.col("vec_id") < 5),
        cent,
        k=3,
        nprobe=2,
    ).select("query_id", "rank", "neighbor_id")


def emb_cosine_neardup_lsh(spark, sf_dir):
    """Embedding near-dup pairs via hyperplane-LSH bucketing (exact
    cosine only within buckets) — the unblocked scale path next to
    emb_neardup_pairs_exact's label-blocked all-pairs. Buckets are
    sha-derived exact integer arithmetic, reproduced by the oracle."""
    from plugin_debezium_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    e = _embs_s(spark, sf_dir)
    return cosine_neardup_pairs(
        e, dim=_EMB_DIM, threshold=0.25, n_planes=4
    ).select("id_a", "id_b")


def multimodal_features(spark, sf_dir):
    media = attach_binary_payload(
        _docs(spark, sf_dir), src_col="text", media_id_col="doc_id"
    )
    return extract_media_features(media, decode_mode="fake")


# ---------------------------------------------------------------------------
# Oracle SQL twins
# ---------------------------------------------------------------------------

_SHINGLES3 = """
words AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w
  FROM documents
),
shingles AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> array_to_string(w[i:i+2], ' ')))) AS shingle
  FROM words
)
"""

_MINHASH_SIG = f"""
WITH {_SHINGLES3},
hashed AS (
  SELECT doc_id,
         (('0x' || substr(sha256(shingle), 1, 15))::BIGINT) % {_P} AS h
  FROM shingles
),
sig AS (
  SELECT doc_id,
         {', '.join(f'min((h * {1 + 2 * j} + {12345 + 7 * j}) % {_P}) AS mh{j}' for j in range(8))}
  FROM hashed GROUP BY doc_id
)
"""

DATA_ORACLES: dict[str, str] = {
    "dedup_exact": """
SELECT sha256(text) AS text_sha256, min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents GROUP BY 1
""",
    "dedup_minhash_signatures": _MINHASH_SIG + "SELECT * FROM sig",
    "dedup_minhash_lsh_pairs": _MINHASH_SIG
    + """,
banded AS (
  SELECT doc_id, 0 AS band,
         sha256(mh0::VARCHAR || ',' || mh1::VARCHAR || ',' || mh2::VARCHAR || ',' || mh3::VARCHAR) AS bucket
  FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band,
         sha256(mh4::VARCHAR || ',' || mh5::VARCHAR || ',' || mh6::VARCHAR || ',' || mh7::VARCHAR) AS bucket
  FROM sig
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    "dedup_ngram_jaccard": f"""
WITH {_SHINGLES3},
counts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter, ca.n_sh AS n_a, cb.n_sh AS n_b
FROM inter
JOIN counts ca ON ca.doc_id = id_a
JOIN counts cb ON cb.doc_id = id_b
WHERE n_inter * 50 >= (ca.n_sh + cb.n_sh - n_inter)
""",
    "dedup_ngram_jaccard_capped": f"""
WITH {_SHINGLES3},
counts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY 1),
rare AS (SELECT shingle FROM shingles GROUP BY 1 HAVING count(*) <= 8),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.source = b.source
   AND a.doc_id < b.doc_id
  WHERE a.shingle IN (SELECT shingle FROM rare)
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter, ca.n_sh AS n_a, cb.n_sh AS n_b
FROM inter
JOIN counts ca ON ca.doc_id = id_a
JOIN counts cb ON cb.doc_id = id_b
WHERE n_inter * 50 >= (ca.n_sh + cb.n_sh - n_inter)
""",
    "dedup_minhash_lsh_capped": _MINHASH_SIG
    + """,
banded AS (
  SELECT doc_id, 0 AS band,
         sha256(mh0::VARCHAR || ',' || mh1::VARCHAR || ',' || mh2::VARCHAR || ',' || mh3::VARCHAR) AS bucket
  FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band,
         sha256(mh4::VARCHAR || ',' || mh5::VARCHAR || ',' || mh6::VARCHAR || ',' || mh7::VARCHAR) AS bucket
  FROM sig
),
keep AS (SELECT band, bucket FROM banded GROUP BY 1, 2 HAVING count(*) <= 4)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands
FROM banded a
JOIN keep k ON k.band = a.band AND k.bucket = a.bucket
JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    # recursive transitive closure needs WITH RECURSIVE up front
    "dedup_clusters": _MINHASH_SIG.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
banded AS (
  SELECT doc_id, 0 AS band,
         sha256(mh0::VARCHAR || ',' || mh1::VARCHAR || ',' || mh2::VARCHAR || ',' || mh3::VARCHAR) AS bucket
  FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band,
         sha256(mh4::VARCHAR || ',' || mh5::VARCHAR || ',' || mh6::VARCHAR || ',' || mh7::VARCHAR) AS bucket
  FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM pairs
),
walk(node, reach) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT w.node, e.d FROM walk w JOIN edges e ON e.s = w.reach
)
SELECT node AS doc_id, min(reach) AS cluster,
       (node = min(reach)) AS is_rep
FROM walk GROUP BY node
""",
    "dedup_simhash": """
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(sha256(unnest(string_split_regex(trim(text), '\\s+'))), 1, 15))::BIGINT AS h
  FROM documents
),
bits AS (
  SELECT doc_id, h, unnest(generate_series(0, 15)) AS b FROM toks
),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM bits GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY 1
""",
    "text_token_counts": """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
       len(list_filter(string_split_regex(text, '[^0-9A-Za-z]+'),
                       x -> length(x) > 0))
       + length(regexp_replace(text, '[0-9A-Za-z\\s]', '', 'g')) AS bpe_tokens
FROM documents
""",
    "text_quality_features": """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       length(text) AS n_chars,
       CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
          + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3
          + (length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4 AS BIGINT) AS stop_hits
FROM documents
""",
    "text_normalize_scrub": r"""
WITH clean AS (
  SELECT doc_id,
         lower(regexp_replace(trim(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9][0-9\-\s]{7,}[0-9]', '<PHONE>', 'g')
         ), '\s+', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT doc_id, clean_text, sha256(clean_text) AS clean_sha256 FROM clean
""",
    "text_fingerprint": """
SELECT doc_id,
       list_min(list_transform(
         generate_series(1, greatest(length(text) - 7, 1), 4),
         i -> substr(sha256(substr(text, i, 8)), 1, 16))) AS fingerprint
FROM documents
""",
    "emb_neardup_pairs_exact": """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a, e b
WHERE a.vec_id < b.vec_id AND a.label = b.label
  AND list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= 0.25
""",
    "emb_topk_bruteforce": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM c, q
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3
""",
    # byte-exact twin of the Spark side's UTF-8 payload (octet_length +
    # hex-pair byte values, NOT character counts/codepoints — they
    # diverge on any non-ASCII document)
    "multimodal_features": """
WITH b AS (
  -- sha256(VARCHAR) hashes the UTF-8 bytes, same as the Spark side's
  -- sha over the encoded payload
  SELECT doc_id, text, encode(text) AS payload,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id AS media_id, 'image' AS kind,
       n AS n_bytes, sha256(text) AS sha256,
       CAST(16 + n % 64 AS INT) AS width,
       CAST(16 + (n // 64) % 64 AS INT) AS height,
       3 AS channels,
       (list_aggregate(list_transform(generate_series(1, least(n, 256)),
          i -> ('0x' || substr(hex(payload), 2*i-1, 2))::INT), 'sum')
        % 2560) / 10.0 AS mean_luma
FROM b
""",
}

# emb_topk_lsh oracle: regenerate the sha-derived ±1 planes and the
# floor(x*1024) quantization — both exact integer arithmetic — so the
# DuckDB bucket ids equal the pandas-UDF matmul's bit for bit; then
# per-bucket exact cosine top-k, same rank tie-break as bruteforce.
_EMB_DIM = 64


def _lsh_bucket_sql(dim: int, n_planes: int, seed: int = 42) -> str:
    from plugin_debezium_spark.operators.similarity import sha_planes

    planes = sha_planes(dim, n_planes, seed)
    bits = []
    for j in range(n_planes):
        s = ", ".join(str(int(planes[i, j])) for i in range(dim))
        bits.append(
            f"(CASE WHEN list_dot_product(q, [{s}]) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bits)


DATA_ORACLES["emb_topk_lsh"] = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1024) AS BIGINT)) AS q
  FROM embeddings
),
b AS (SELECT vec_id, v, ({_lsh_bucket_sql(_EMB_DIM, 4)}) AS bucket FROM e),
qs AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
cs AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b WHERE vec_id >= 5),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv)
         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM cs JOIN qs USING (bucket)
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3
"""

DATA_ORACLES["emb_topk_lsh_multiprobe"] = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1024) AS BIGINT)) AS q
  FROM embeddings
),
b AS (SELECT vec_id, v, ({_lsh_bucket_sql(_EMB_DIM, 4)}) AS bucket FROM e),
qs AS (
  SELECT vec_id AS query_id, v AS qv,
         unnest([bucket,
                 xor(bucket, 1), xor(bucket, 2),
                 xor(bucket, 4), xor(bucket, 8)]) AS bucket
  FROM b WHERE vec_id < 5),
cs AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b WHERE vec_id >= 5),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv)
         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM cs JOIN qs USING (bucket)
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3
"""

# text_lang_id oracle: argmax over struct list (score, tie, lang) —
# identical tie semantics to functions.text.lang_id
_langs = sorted(LANG_MARKERS)


def _occ_sql2(word: str) -> str:
    n = len(word) + 2
    return (
        f"CAST((length(' '||text||' ') - "
        f"length(replace(' '||text||' ', ' {word} ', ''))) / {n} AS BIGINT)"
    )


_score_sql = {
    lang: " + ".join(_occ_sql2(w) for w in LANG_MARKERS[lang]) for lang in _langs
}
DATA_ORACLES["text_lang_id"] = (
    "SELECT doc_id, list_max(["
    + ", ".join(
        f"{{'score': ({_score_sql[lang]}), 'tie': {len(_langs) - i}, 'lang': '{lang}'}}"
        for i, lang in enumerate(_langs)
    )
    + "]).lang AS predicted, "
    + ", ".join(f"({_score_sql[lang]}) AS s_{lang}" for lang in _langs)
    + " FROM documents"
)

DATA_ORACLES["emb_cosine_neardup_lsh"] = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1024) AS BIGINT)) AS q
  FROM embeddings
),
b AS (SELECT vec_id, v, ({_lsh_bucket_sql(_EMB_DIM, 4)}) AS bucket FROM e)
SELECT a.vec_id AS id_a, c.vec_id AS id_b
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE list_dot_product(a.v, c.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))
      >= 0.25
"""

_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b})))"
)

DATA_ORACLES["emb_topk_ivf"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 5 AND 8),
cassign AS (
  SELECT vec_id AS neighbor_id, v AS cvec, cid FROM (
    SELECT c.vec_id, c.v, t.cid,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY {_COS.format(a='c.v', b='t.cv')} DESC, t.cid ASC) AS r
    FROM e c, cent t WHERE c.vec_id >= 5) WHERE r = 1
),
qassign AS (
  SELECT vec_id AS query_id, v AS qvec, cid FROM (
    SELECT q.vec_id, q.v, t.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_COS.format(a='q.v', b='t.cv')} DESC, t.cid ASC) AS r
    FROM e q, cent t WHERE q.vec_id < 5) WHERE r <= 2
),
scored AS (
  SELECT query_id, neighbor_id, {_COS.format(a='qvec', b='cvec')} AS cosine
  FROM cassign JOIN qassign USING (cid)
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3
"""

def emb_ivf_assign(spark, sf_dir):
    """IVF coarse-quantizer assignment over the WHOLE corpus
    (n_lists=1): the max_by argmax-aggregate path — map-side combine
    reduces corpus×n_centroids scored rows to one per vector before
    any shuffle (operators/similarity.ivf_assign; no window on the
    corpus side). Same deterministic centroids as emb_topk_ivf."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.similarity import ivf_assign

    e = _embs(spark, sf_dir)
    cent = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") <= 8)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    return ivf_assign(e, cent, 1).select("vec_id", "cid")


def emb_ivf_assign_numpy(spark, sf_dir):
    """The numpy throughput path for corpus assignment: one Arrow-batch
    matmul against the broadcast centroid matrix, no join expansion,
    no shuffle (operators/similarity._ivf_assign_numpy) — measured
    ~19x the max_by SQL path at 400k x 64 centroids. Integer output;
    same oracle as emb_ivf_assign (argmax agrees absent exact ties)."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.similarity import ivf_assign

    e = _embs(spark, sf_dir)
    cent = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") <= 8)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    return ivf_assign(e, cent, 1, impl="numpy").select("vec_id", "cid")


def emb_ivf_train_topk(spark, sf_dir):
    """End-to-end TRAINED IVF: k-means coarse quantizer fit on the
    corpus (operators/similarity.train_ivf_centroids — deterministic
    content-addressed seeding, numpy assign, map-side-combinable mean
    updates) then ivf_topk over the trained cells. The pinned shape
    (k=4, iters=3) makes the whole derivation single-statement
    SQL-expressible after all (round-5 verdict #3): the DuckDB oracle
    unrolls the 3 farthest-point seed selections and the 3 Lloyd
    assign/mean rounds as chained CTEs (_ivf_train_oracle below) —
    the emb_ivfpq_topk pattern applied to iterative training.
    Determinism and cluster recovery stay pytest-asserted in
    test_dataops.py."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    e = _embs(spark, sf_dir)
    corpus = e.filter(F.col("vec_id") >= 5)
    cent = train_ivf_centroids(corpus, k=4, iters=3)
    return ivf_topk(
        corpus, e.filter(F.col("vec_id") < 5), cent, k=3, nprobe=2
    ).select("query_id", "rank", "neighbor_id")


def emb_pq_encode(spark, sf_dir):
    """Product-quantization encode with closed-form seeded codebooks
    (operators/pq.seed_pq_codebooks + pq_encode impl="sql"): codeword
    (sub, cid) is the cid-th DISTINCT sub-vector of subspace sub in
    minimal-sha256('42:'||vec_id) order; each vector's subspace maps
    to the codeword maximizing dot(x_sub, c) − |c|²/2 (ties: min
    cid). The whole derivation is single-statement SQL, so the DuckDB
    oracle hash-checks the compressed representation end to end.
    Output is integer-only (vec_id, sub, code)."""
    from plugin_debezium_spark.operators.pq import (
        pq_encode,
        seed_pq_codebooks,
    )

    e = _embs_s(spark, sf_dir)
    books = seed_pq_codebooks(e, dim=_EMB_DIM, m=8, ksub=16)
    out = pq_encode(e, books, dim=_EMB_DIM, m=8, ksub=16, impl="sql")
    return out.select(
        "vec_id",
        F.col("sub").cast("long").alias("sub"),
        F.col("code").cast("long").alias("code"),
    )


def emb_pq_topk(spark, sf_dir):
    """End-to-end TRAINED PQ + ADC top-k (operators/pq): Lloyd-refined
    codebooks (deterministic seed, map-side-combinable mean updates)
    → numpy encode → LUT-scored asymmetric cosine top-k. Iterative
    training is not single-statement-SQL-expressible, so this query
    has no DuckDB oracle (driver records the rows-only check);
    determinism, sql/numpy encode agreement, and recall vs brute
    force are pytest-asserted in test_dataops.py."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.pq import (
        pq_topk,
        train_pq_codebooks,
    )

    e = _embs(spark, sf_dir)
    corpus = e.filter(F.col("vec_id") >= 5)
    books = train_pq_codebooks(corpus, dim=_EMB_DIM, m=8, ksub=16, iters=3)
    return pq_topk(
        corpus,
        e.filter(F.col("vec_id") < 5),
        books,
        dim=_EMB_DIM,
        k=3,
        m=8,
        ksub=16,
    )


def emb_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composed ANN (operators/pq.ivfpq_topk, impl="sql"):
    coarse IVF routing (fixed centroids vec_id 5..8, same as
    emb_topk_ivf) prunes which corpus vectors each query scores;
    PQ ADC scores cosine(query, x̂) against the reconstruction from
    closed-form seeded codebooks (per-subspace distinct sub-vectors
    in min-sha order, seeded on the CORPUS side — the index is built
    from what it indexes). Every step — seeding, encode, argmax
    routing, reconstruction, strict-fold cosine, rank window — is
    single-statement SQL, so unlike the trained-PQ/IVF queries this
    composition holds a full hash-checked oracle. The numpy path
    (one narrow assign+encode pass, LUT scoring over probed lists
    only) is the corpus-scale twin, pytest-asserted to agree."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.pq import (
        ivfpq_topk,
        seed_pq_codebooks,
    )

    e = _embs_s(spark, sf_dir)
    corpus = e.filter(F.col("vec_id") >= 5)
    cent = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") <= 8)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    books = seed_pq_codebooks(corpus, dim=_EMB_DIM, m=8, ksub=16)
    return ivfpq_topk(
        corpus,
        e.filter(F.col("vec_id") < 5),
        cent,
        books,
        dim=_EMB_DIM,
        k=3,
        nprobe=2,
        m=8,
        ksub=16,
        impl="sql",
    )


def connect_typed_decode(spark, sf_dir):
    """P7 Connect wire decode end-to-end: per-doc wire JSON whose
    Connect schema types a base64-bytes Decimal(scale=2), an epoch-day
    Date, and an epoch-ms Timestamp — connect_decode_json (from_json
    with the wire shape + the connect_cast lattice) must produce the
    typed values plain SQL arithmetic predicts
    (functions/connect.decimal_from_bytes; MapConverter.java:38-252).

    Output canonicalization (round-4 fix for the driver's hasher):
    the TYPED values (DecimalType(38,2) / DateType / TimestampType)
    are produced by the decode and are asserted in
    tests/test_connect.py, but this query converts them back to pure
    integers at the boundary — price→cents, date→epoch days,
    timestamp→epoch micros — because integer columns hash identically
    under ANY harness timezone or decimal renderer. The round trip
    wire → typed → integer still proves the decode: a wrong decimal
    splice, day offset, or ms→TimestampType conversion would break
    the integer equality with the oracle's direct derivation."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.functions.connect import connect_decode_json

    d = _spread(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    )
    v = F.pmod(F.col("doc_id"), F.lit(10000)).cast("int")
    # 2-byte big-endian unscaled bytes (< 0x8000, so sign bit clear)
    price_b64 = F.base64(F.unhex(F.lpad(F.hex(v), 4, "0")))
    wire = F.to_json(
        F.struct(
            price_b64.alias("price"),
            F.pmod(F.col("doc_id"), F.lit(20000))
            .cast("int")
            .alias("added_on"),
            (F.col("doc_id") * 1000).alias("ts"),
        )
    )
    schema = {
        "type": "struct",
        "fields": [
            {
                "field": "price",
                "type": "bytes",
                "name": "org.apache.kafka.connect.data.Decimal",
                "parameters": {"scale": "2"},
            },
            {
                "field": "added_on",
                "type": "int32",
                "name": "io.debezium.time.Date",
            },
            {
                "field": "ts",
                "type": "int64",
                "name": "io.debezium.time.Timestamp",
            },
        ],
    }
    out = d.select(
        "doc_id", connect_decode_json(wire, schema).alias("r")
    )
    return out.select(
        "doc_id",
        # typed → TZ/renderer-immune integers (see docstring): the
        # decimal is exact at scale 2 so *100 → bigint is lossless;
        # unix_micros reads the instant, independent of session TZ.
        (F.col("r.price") * F.lit(100)).cast("long").alias("price_cents"),
        F.datediff(F.col("r.added_on"), F.lit("1970-01-01"))
        .cast("long")
        .alias("added_on_days"),
        F.unix_micros(F.col("r.ts")).alias("ts_micros"),
    )


_EMB_IVF_ASSIGN_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 5 AND 8)
SELECT vec_id, cid FROM (
  SELECT c.vec_id, t.cid,
         row_number() OVER (PARTITION BY c.vec_id
           ORDER BY list_dot_product(c.v, t.cv)
             / (sqrt(list_dot_product(c.v, c.v))
                * sqrt(list_dot_product(t.cv, t.cv))) DESC,
             t.cid ASC) AS r
  FROM e c, cent t) WHERE r = 1
"""
DATA_ORACLES["emb_topk_bruteforce_numpy"] = DATA_ORACLES["emb_topk_bruteforce"]
DATA_ORACLES["emb_ivf_assign"] = _EMB_IVF_ASSIGN_SQL
DATA_ORACLES["emb_ivf_assign_numpy"] = _EMB_IVF_ASSIGN_SQL

DATA_ORACLES["connect_typed_decode"] = """
SELECT doc_id,
       CAST(doc_id % 10000 AS BIGINT) AS price_cents,
       CAST(doc_id % 20000 AS BIGINT) AS added_on_days,
       CAST(doc_id * 1000000 AS BIGINT) AS ts_micros
FROM documents
"""

DATA_QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_signatures": dedup_minhash_signatures,
    "dedup_minhash_lsh_pairs": dedup_minhash_lsh_pairs,
    "dedup_minhash_lsh_capped": dedup_minhash_lsh_capped,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_jaccard_capped": dedup_ngram_jaccard_capped,
    "dedup_clusters": dedup_clusters,
    "dedup_clusters_star": dedup_clusters_star,
    "dedup_simhash": dedup_simhash,
    "text_token_counts": text_token_counts,
    "text_quality_features": text_quality_features,
    "text_gopher_quality": text_gopher_quality,
    "text_hash_split": text_hash_split,
    "text_lang_id": text_lang_id,
    "text_normalize_scrub": text_normalize_scrub,
}

DATA_ORACLES["text_gopher_quality"] = """
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> length(x) > 0) AS wf,
         string_split_regex(trim(text), '\\s+') AS w
  FROM documents
),
base AS (
  SELECT doc_id,
         len(wf)::BIGINT AS n_words,
         coalesce(list_aggregate(list_transform(wf, x -> length(x)), 'sum'),
                  0)::BIGINT AS sum_word_chars,
         len(list_filter(wf, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
           AS n_alpha_words
  FROM words
),
tris AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> array_to_string(w[i:i+2], ' '))) AS tri
  FROM words
),
counts AS (
  SELECT doc_id, tri, count(*) AS c FROM tris GROUP BY 1, 2
),
rep AS (
  SELECT doc_id, max(c)::BIGINT AS rep_max_tri,
         CAST(sum(c) AS BIGINT) AS rep_tri_total
  FROM counts GROUP BY 1
)
SELECT base.*, rep.rep_max_tri, rep.rep_tri_total
FROM base JOIN rep USING (doc_id)
"""

DATA_ORACLES["text_decontaminate"] = f"""
WITH {_SHINGLES3},
train AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 100 <> 0),
ev AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 100 = 0),
-- spine = every train doc id, so a NULL/empty-text doc keeps a row
-- with zero counts (matches ngram_overlap's one-row-per-doc contract)
counts AS (
  SELECT d.doc_id, count(t.shingle) AS n_shingles
  FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d
  LEFT JOIN train t USING (doc_id) GROUP BY 1
),
hits AS (
  SELECT t.doc_id, count(*) AS contam_hits
  FROM train t JOIN ev USING (shingle) GROUP BY 1
)
SELECT counts.doc_id, n_shingles,
       coalesce(contam_hits, 0) AS contam_hits
FROM counts LEFT JOIN hits USING (doc_id)
"""

DATA_ORACLES["text_duplicate_lines"] = """
WITH raw AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM documents)
),
lines AS (
  SELECT DISTINCT doc_id, line FROM raw WHERE length(line) >= 1
),
gc AS (SELECT line, count(*) AS dwl FROM lines GROUP BY 1)
SELECT doc_id, count(*) AS n_lines,
       CAST(sum(CASE WHEN dwl >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_lines
FROM lines JOIN gc USING (line) GROUP BY 1
"""

# mirrors text_dedup_paragraphs exactly: 4-word chunking (DuckDB
# list_slice(begin,end) inclusive == Spark slice(start,length)), then
# keep iff (first in-doc occurrence) AND (min doc_id over the corpus),
# reassembled in position order; spine LEFT JOINs keep every doc.
DATA_ORACLES["text_dedup_paragraphs"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
chunks AS (
  SELECT doc_id, unnest(range((len(ws) + 3) // 4)) AS pos, ws FROM w
),
p0 AS (
  SELECT doc_id, pos,
         trim(array_to_string(list_slice(ws, pos*4 + 1, pos*4 + 4), ' '))
           AS para
  FROM chunks
),
p AS (SELECT * FROM p0 WHERE length(para) >= 1),
fid AS (SELECT doc_id, para, min(pos) AS pos FROM p GROUP BY 1, 2),
canon AS (SELECT para, min(doc_id) AS canon_doc FROM fid GROUP BY 1),
kept AS (
  SELECT f.doc_id, f.pos, f.para FROM fid f JOIN canon c USING (para)
  WHERE f.doc_id = c.canon_doc
),
np AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY 1),
rw AS (
  SELECT doc_id, count(*) AS kept_paras,
         string_agg(para, chr(10) ORDER BY pos) AS text_dedup
  FROM kept GROUP BY 1
)
SELECT d.doc_id,
       coalesce(np.n_paras, 0) AS n_paras,
       coalesce(rw.kept_paras, 0) AS kept_paras,
       coalesce(rw.text_dedup, '') AS text_dedup
FROM documents d LEFT JOIN np USING (doc_id) LEFT JOIN rw USING (doc_id)
"""

# mirrors text_dup_spans: 5-word shingles with start positions
# (DuckDB ws[pos+1:pos+5] inclusive == Spark slice(ws, pos+1, 5)),
# 60-bit sha keys, dup = >=2 distinct docs, gaps-and-islands merge
# (chain iff pos <= prev_pos + 5), end clamped to n_words for the
# short-doc degenerate shingle, spine LEFT JOIN keeps every doc.
DATA_ORACLES["text_dup_spans"] = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
  FROM documents
),
base AS (
  SELECT doc_id, len(ws) AS n_words, ws,
         greatest(len(ws) - 4, 1) AS nsh
  FROM w
),
sh AS (
  SELECT doc_id, n_words, unnest(range(nsh)) AS pos, ws FROM base
),
sh2 AS (
  SELECT doc_id, n_words, pos,
         ('0x' || substr(sha256(
            array_to_string(ws[pos+1:pos+5], ' ')), 1, 15))::BIGINT AS h
  FROM sh
),
dup AS (
  SELECT h FROM (SELECT DISTINCT h, doc_id FROM sh2)
  GROUP BY h HAVING count(*) >= 2
),
occ AS (SELECT doc_id, n_words, pos FROM sh2 JOIN dup USING (h)),
isl AS (
  SELECT doc_id, n_words, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS NULL
               OR pos > lag(pos)
                   OVER (PARTITION BY doc_id ORDER BY pos) + 5
              THEN 1 ELSE 0 END AS flag
  FROM occ
),
isl2 AS (
  SELECT doc_id, n_words, pos,
         sum(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
),
sp AS (
  SELECT doc_id, island, min(pos) AS s,
         least(max(pos) + 5, any_value(n_words)) AS e
  FROM isl2 GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s) AS dup_words
  FROM sp GROUP BY 1
)
SELECT b.doc_id, b.n_words,
       coalesce(agg.n_spans, 0)::BIGINT AS n_spans,
       coalesce(agg.dup_words, 0)::BIGINT AS dup_words
FROM base b LEFT JOIN agg USING (doc_id)
"""

# mirrors text_mix_weights: per-ten-thousand integer weights, the
# sha('mix:v1'||id) % 10000 fractional-copy decision, range(1, n+1)
# == Spark sequence(1, n) epochs
DATA_ORACLES["text_mix_weights"] = """
WITH w AS (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 20000
                   WHEN 'fr' THEN 12500 WHEN 'es' THEN 375
                   ELSE 0 END AS wi,
         (('0x' || substr(sha256('mix:v1' || doc_id::VARCHAR),
                          1, 15))::BIGINT) % 10000 AS bucket
  FROM documents
),
n AS (
  SELECT doc_id, lang,
         wi // 10000
           + CASE WHEN bucket < wi % 10000 THEN 1 ELSE 0 END AS n
  FROM w
)
SELECT doc_id, lang, unnest(range(1, n + 1)) AS copy
FROM n WHERE n > 0
"""

# mirrors text_source_quota: the salted two-phase top-N selects the
# same rows as ONE global per-group window ordered by (sha, id)
DATA_ORACLES["text_source_quota"] = """
SELECT doc_id, source, qrank::INTEGER AS qrank FROM (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source
    ORDER BY sha256('quota:v1' || doc_id::VARCHAR), doc_id) AS qrank
  FROM documents)
WHERE qrank <= 10
"""

# mirrors text_lm_freq: NON-distinct word bigrams with the same
# whole-short-text shingle floor as word_shingles_expr (n=2), corpus
# counts from the per-(doc,gram) pre-aggregate, integer outputs only
DATA_ORACLES["text_lm_freq"] = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - 1, 1)),
           i -> array_to_string(w[i:i+1], ' '))) AS g
  FROM words
),
dg AS (SELECT doc_id, g, count(*) AS k FROM grams GROUP BY 1, 2),
cf AS (SELECT g, sum(k) AS cf FROM dg GROUP BY 1)
SELECT doc_id,
       sum(k)::BIGINT AS n_ngrams,
       sum(k * cf)::BIGINT AS sum_freq,
       sum(CASE WHEN cf >= 2 THEN k ELSE 0 END)::BIGINT AS n_common
FROM dg JOIN cf USING (g)
GROUP BY doc_id
"""

# mirrors text_pack_sequences: the two-phase bucketed cumsum's total
# order (sha-prefix bucket, sha, id) == the plain global sha order, so
# the oracle is ONE window cumsum; same whitespace token count as
# text_token_counts; zero-token docs keep NULL block bounds
DATA_ORACLES["text_pack_sequences"] = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+'))
         END::BIGINT AS n_tokens,
         sha256('pack:v1' || doc_id::VARCHAR) AS ok
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(SUM(n_tokens) OVER (
           ORDER BY ok, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
)
SELECT doc_id, n_tokens, off::BIGINT AS tok_offset,
       CASE WHEN n_tokens > 0 THEN off // 512 END::BIGINT AS first_block,
       CASE WHEN n_tokens > 0
            THEN (off + n_tokens - 1) // 512 END::BIGINT AS last_block
FROM c
"""

# mirrors emb_pq_encode: per-subspace DISTINCT sub-vector seeding in
# min-sha order (digests unique per row, so total); DuckDB v[a:b]
# inclusive == Spark slice(v, a, 8); encode = argmax of
# dot(sv, cw) - |cw|^2/2, ties to the lowest cid; output integer-only
DATA_ORACLES["emb_pq_encode"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sha256('42:' || vec_id::VARCHAR) AS d
  FROM embeddings
),
subs AS (SELECT unnest(range(8)) AS sub),
sv AS (
  SELECT e.vec_id, subs.sub,
         e.v[subs.sub*8 + 1 : subs.sub*8 + 8] AS sv, e.d
  FROM e, subs
),
firsts AS (SELECT sub, sv AS cw, min(d) AS k FROM sv GROUP BY 1, 2),
books AS (
  SELECT sub, cw,
         row_number() OVER (PARTITION BY sub ORDER BY k) - 1 AS cid
  FROM firsts
  QUALIFY cid < 16
),
scored AS (
  SELECT vec_id, sv.sub, cid,
         list_dot_product(sv.sv, cw) - list_dot_product(cw, cw) / 2
           AS score
  FROM sv JOIN books ON sv.sub = books.sub
)
SELECT vec_id, sub, cid AS code
FROM scored
QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                           ORDER BY score DESC, cid ASC) = 1
"""

# mirrors emb_ivfpq_topk end to end: corpus-seeded codebooks (distinct
# sub-vectors, min-sha order), encode = argmax dot(sv,cw)-|cw|^2/2,
# x̂ = flatten(codewords in subspace order), coarse routing on exact
# cosine vs centroids vec_id 5..8 (corpus: nearest 1 list; queries:
# nearest 2), ADC score = strict-fold cosine(query, x̂), rank ties
# (desc cosine, asc neighbor_id)
DATA_ORACLES["emb_ivfpq_topk"] = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sha256('42:' || vec_id::VARCHAR) AS d
  FROM embeddings
),
corp AS (SELECT * FROM e WHERE vec_id >= 5),
cent AS (SELECT vec_id AS cid, v AS cv FROM e
         WHERE vec_id BETWEEN 5 AND 8),
subs AS (SELECT unnest(range(8)) AS sub),
sv AS (
  SELECT corp.vec_id, subs.sub,
         corp.v[subs.sub*8 + 1 : subs.sub*8 + 8] AS sv, corp.d
  FROM corp, subs
),
firsts AS (SELECT sub, sv AS cw, min(d) AS k FROM sv GROUP BY 1, 2),
books AS (
  SELECT sub, cw,
         row_number() OVER (PARTITION BY sub ORDER BY k) - 1 AS cid
  FROM firsts
  QUALIFY cid < 16
),
codes AS (
  SELECT vec_id, sub, cid AS code FROM (
    SELECT vec_id, sv.sub, cid,
           list_dot_product(sv.sv, cw) - list_dot_product(cw, cw) / 2
             AS score
    FROM sv JOIN books ON sv.sub = books.sub)
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                             ORDER BY score DESC, cid ASC) = 1
),
xhat AS (
  SELECT vec_id, flatten(list(cw ORDER BY books.sub)) AS xv
  FROM codes JOIN books
    ON codes.sub = books.sub AND codes.code = books.cid
  GROUP BY vec_id
),
cassign AS (
  SELECT vec_id AS neighbor_id, cid FROM (
    SELECT c.vec_id, t.cid,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY {_COS.format(a='c.v', b='t.cv')} DESC, t.cid ASC) AS r
    FROM corp c, cent t) WHERE r = 1
),
qassign AS (
  SELECT vec_id AS query_id, v AS qvec, cid FROM (
    SELECT q.vec_id, q.v, t.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_COS.format(a='q.v', b='t.cv')} DESC, t.cid ASC) AS r
    FROM e q, cent t WHERE q.vec_id < 5) WHERE r <= 2
),
scored AS (
  SELECT query_id, neighbor_id, {_COS.format(a='qvec', b='xv')} AS cosine
  FROM cassign
  JOIN xhat ON cassign.neighbor_id = xhat.vec_id
  JOIN qassign USING (cid)
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 3
"""

def _ivf_train_oracle(k: int = 4, iters: int = 3) -> str:
    """Unroll train_ivf_centroids(k, iters) + ivf_topk(k=3, nprobe=2)
    into ONE DuckDB statement (round-5 verdict #3: fixed iteration
    counts ARE single-statement-expressible). Mirrors
    operators/similarity.py exactly:

    - seed 0 = corpus vector with min (sha256('42:'||id), id);
    - seed j = corpus vector minimizing (max cosine to seeds 0..j-1,
      id) — the farthest-point step;
    - each Lloyd round: assign every corpus vector to its argmax-
      cosine centroid (ties: min cid), next centroid = component-wise
      AVG of members, empty cells keep the previous centroid;
    - then the emb_topk_ivf routing/scoring over the trained cells
      (corpus: nearest 1 list; queries vec_id<5: nearest 2; rank by
      desc cosine, asc neighbor_id; top-3). Integer-only output."""
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v "
        "FROM embeddings)",
        "corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 5)",
        "s0 AS (SELECT vec_id, v FROM corpus "
        "ORDER BY sha256('42:' || vec_id::VARCHAR), vec_id LIMIT 1)",
    ]
    for j in range(1, k):
        prev = ", ".join(f"s{i}" for i in range(j))
        coss = [_COS.format(a="c.v", b=f"s{i}.v") for i in range(j)]
        maxcos = coss[0] if j == 1 else "greatest(" + ", ".join(coss) + ")"
        parts.append(
            f"s{j} AS (SELECT c.vec_id, c.v FROM corpus c, {prev}\n"
            f"  ORDER BY {maxcos} ASC, c.vec_id ASC LIMIT 1)"
        )
    parts.append(
        "c0 AS ("
        + " UNION ALL ".join(
            f"SELECT {i}::BIGINT AS cid, v AS cv FROM s{i}" for i in range(k)
        )
        + ")"
    )
    for r in range(1, iters + 1):
        p = r - 1
        parts.append(
            f"""a{r} AS (
  SELECT vec_id, v, cid FROM (
    SELECT c.vec_id, c.v, t.cid,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY {_COS.format(a='c.v', b='t.cv')} DESC,
                      t.cid ASC) AS r
    FROM corpus c, c{p} t) WHERE r = 1
)"""
        )
        parts.append(
            f"""m{r} AS (
  SELECT cid, list(m ORDER BY i) AS cv FROM (
    SELECT cid, i, avg(x) AS m
    FROM (SELECT cid, unnest(v) AS x,
                 generate_subscripts(v, 1) AS i FROM a{r})
    GROUP BY cid, i)
  GROUP BY cid
)"""
        )
        parts.append(
            f"""c{r} AS (
  SELECT p.cid, coalesce(n.cv, p.cv) AS cv
  FROM c{p} p LEFT JOIN m{r} n ON p.cid = n.cid
)"""
        )
    cent = f"c{iters}"
    parts.append(
        f"""cassign AS (
  SELECT vec_id AS neighbor_id, v AS cvec, cid FROM (
    SELECT c.vec_id, c.v, t.cid,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY {_COS.format(a='c.v', b='t.cv')} DESC,
                      t.cid ASC) AS r
    FROM corpus c, {cent} t) WHERE r = 1
)"""
    )
    parts.append(
        f"""qassign AS (
  SELECT vec_id AS query_id, v AS qvec, cid FROM (
    SELECT q.vec_id, q.v, t.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_COS.format(a='q.v', b='t.cv')} DESC,
                      t.cid ASC) AS r
    FROM e q, {cent} t WHERE q.vec_id < 5) WHERE r <= 2
)"""
    )
    parts.append(
        f"""scored AS (
  SELECT query_id, neighbor_id,
         {_COS.format(a='qvec', b='cvec')} AS cosine
  FROM cassign JOIN qassign USING (cid)
)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 3
"""
    )


DATA_ORACLES["emb_ivf_train_topk"] = _ivf_train_oracle(k=4, iters=3)

DATA_ORACLES["text_hash_split"] = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(sha256('split:v1' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 10000 AS bkt
  FROM documents
),
s AS (
  SELECT doc_id,
         CASE WHEN bkt < 9800 THEN 'train'
              WHEN bkt < 9900 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, count(*) AS n, min(doc_id) AS min_doc
FROM s GROUP BY split ORDER BY split
"""

DATA_ORACLES["dedup_clusters_star"] = DATA_ORACLES["dedup_clusters"]

def emb_dedup_clusters(spark, sf_dir):
    """Semantic dedup end-to-end: embedding-cosine near-dup pairs
    (hyperplane-LSH-bucketed exact cosine) → log-diameter star
    components → one cluster id + representative per vector — the
    composition an embedding-dedup pass runs at corpus scale (pairs
    never all-pairs, rounds never diameter-bound). Oracle: the same
    LSH buckets + a recursive-CTE transitive closure."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.neardup import (
        connected_components_star,
    )
    from plugin_debezium_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    e = _embs_s(spark, sf_dir)
    pairs = cosine_neardup_pairs(
        e, dim=_EMB_DIM, threshold=0.25, n_planes=4
    ).select("id_a", "id_b")
    cc = connected_components_star(pairs, nodes=e.select("vec_id"))
    return cc.select(
        F.col("id").alias("vec_id"),
        "cluster",
        (F.col("id") == F.col("cluster")).alias("is_rep"),
    )


DATA_ORACLES["emb_dedup_clusters"] = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1024) AS BIGINT)) AS q
  FROM embeddings
),
b AS (SELECT vec_id, v, ({_lsh_bucket_sql(_EMB_DIM, 4)}) AS bucket FROM e),
pairs AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE list_dot_product(a.v, c.v)
        / (sqrt(list_dot_product(a.v, a.v))
           * sqrt(list_dot_product(c.v, c.v))) >= 0.25
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM pairs
),
walk(node, reach) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT w.node, e2.d FROM walk w JOIN edges e2 ON e2.s = w.reach
)
SELECT node AS vec_id, min(reach) AS cluster,
       (node = min(reach)) AS is_rep
FROM walk GROUP BY node
"""


DATA_QUERIES.update(
    {
        "text_fingerprint": text_fingerprint,
        "text_decontaminate": text_decontaminate,
        "text_duplicate_lines": text_duplicate_lines,
        "text_dedup_paragraphs": text_dedup_paragraphs,
        "text_dup_spans": text_dup_spans,
        "text_mix_weights": text_mix_weights,
        "text_pack_sequences": text_pack_sequences,
        "text_lm_freq": text_lm_freq,
        "text_source_quota": text_source_quota,
        "emb_pq_encode": emb_pq_encode,
        "emb_ivfpq_topk": emb_ivfpq_topk,
        "emb_pq_topk": emb_pq_topk,
        "emb_topk_bruteforce": emb_topk_bruteforce,
        "emb_topk_bruteforce_numpy": emb_topk_bruteforce_numpy,
        "emb_topk_lsh": emb_topk_lsh,
        "emb_topk_lsh_multiprobe": emb_topk_lsh_multiprobe,
        "emb_topk_ivf": emb_topk_ivf,
        "emb_neardup_pairs_exact": emb_neardup_pairs_exact,
        "emb_cosine_neardup_lsh": emb_cosine_neardup_lsh,
        "multimodal_features": multimodal_features,
        "emb_ivf_assign": emb_ivf_assign,
        "emb_ivf_assign_numpy": emb_ivf_assign_numpy,
        "emb_ivf_train_topk": emb_ivf_train_topk,
        "connect_typed_decode": connect_typed_decode,
        "emb_dedup_clusters": emb_dedup_clusters,
    }
)


def text_quality_clf(spark, sf_dir):
    """Trained hashed-feature linear quality classifier
    (operators/qualityclf.py, fastText shape — Joulin et al. 2016):
    weak labels from an integer Gopher-style gate (n_words >= 20 AND
    alpha-word fraction >= 0.8, cross-multiplied so no floats), then
    count-native training (weight = positive-label tf − negative tf
    per hashed uni/bi-gram bucket) and BIGINT dot-product scoring.
    Training AND inference are both in the plan — the whole derivation
    is single-statement SQL, so the oracle hash-checks the trained
    model's scores end to end (the emb_ivfpq_topk discipline applied
    to supervised learning). Docs with no grams keep a row via the
    label spine (the text_decontaminate spine lesson)."""
    from plugin_debezium_spark.functions.text import gopher_word_stats
    from plugin_debezium_spark.operators.qualityclf import (
        hashed_features,
        score_documents,
        train_linear_classifier,
    )

    d = _docs_s(spark, sf_dir)
    stats = d.select("doc_id", *gopher_word_stats("text"))
    labels = stats.select(
        "doc_id",
        F.when(
            (F.col("n_words") >= 20)
            & (F.col("n_alpha_words") * 10 >= F.col("n_words") * 8),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("label"),
    ).cache()
    # feats feeds BOTH training and scoring (labels feeds training and
    # the output spine): without a persistence boundary the gram
    # explode+groupBy runs once per branch — the round-6 verdict's one
    # perf finding. Both frames are narrow pre-aggregates (MBs at any
    # fixture sf); cache entries are plan-keyed so harness re-runs
    # reuse rather than duplicate them. Release handle attached for
    # callers that materialize the result and want the memory back.
    feats = hashed_features(d, n_buckets=4096, max_ngram=2).cache()
    weights = train_linear_classifier(feats, labels)
    scores = score_documents(feats, weights)
    out = labels.join(scores, "doc_id", "left").select(
        "doc_id",
        "label",
        F.coalesce(F.col("clf_score"), F.lit(0)).alias("clf_score"),
    )
    out._clf_caches = (feats, labels)
    return out


def dedup_incremental_lsh(spark, sf_dir):
    """Incremental near-dup dedup against a PERSISTED LSH index
    (operators/neardup.lsh_index + dedup_against_index): the corpus
    half (even doc_id) is the existing index state; the delta half
    (odd doc_id) is the arriving batch, flagged by a directional
    (band, bucket) join — the first-occurrence-wins semantics a
    streaming curation pipeline applies per ingest batch, never
    re-touching corpus text. Output: flagged delta docs with their
    deterministic representative (min colliding index id) and
    collision strength (distinct bands hit)."""
    from plugin_debezium_spark.operators.neardup import (
        dedup_against_index,
        lsh_index,
    )

    d = _docs_s(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    delta = d.filter(F.col("doc_id") % 2 == 1)
    idx = lsh_index(corpus, n_perms=8, bands=2)
    return dedup_against_index(idx, delta, n_perms=8, bands=2)


DATA_ORACLES["text_quality_clf"] = """
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> length(x) > 0) AS wf
  FROM documents
),
labels AS (
  SELECT doc_id,
         CASE WHEN len(wf) >= 20
               AND len(list_filter(wf, x -> regexp_matches(x, '[A-Za-z]')))
                   * 10 >= len(wf) * 8
              THEN 1 ELSE 0 END::BIGINT AS label
  FROM words
),
grams AS (
  SELECT doc_id, unnest(wf) AS g FROM words
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(wf) - 1),
                               i -> array_to_string(wf[i:i+1], ' '))) AS g
  FROM words WHERE len(wf) >= 2
),
feats AS (
  SELECT doc_id,
         (('0x' || substr(sha256(g), 1, 15))::BIGINT) % 4096 AS bucket,
         count(*)::BIGINT AS tf
  FROM grams GROUP BY 1, 2
),
w AS (
  SELECT bucket,
         (sum(CASE WHEN label = 1 THEN tf ELSE 0 END)
          - sum(CASE WHEN label = 0 THEN tf ELSE 0 END))::BIGINT AS weight
  FROM feats JOIN labels USING (doc_id) GROUP BY 1
),
scores AS (
  SELECT f.doc_id, sum(f.tf * w.weight)::BIGINT AS clf_score
  FROM feats f JOIN w USING (bucket) GROUP BY 1
)
SELECT l.doc_id, l.label, coalesce(s.clf_score, 0)::BIGINT AS clf_score
FROM labels l LEFT JOIN scores s ON l.doc_id = s.doc_id
"""

DATA_ORACLES["dedup_incremental_lsh"] = _MINHASH_SIG + """,
banded AS (
  SELECT doc_id, 0 AS band,
         sha256(mh0::VARCHAR || ',' || mh1::VARCHAR || ',' ||
                mh2::VARCHAR || ',' || mh3::VARCHAR) AS bucket
  FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band,
         sha256(mh4::VARCHAR || ',' || mh5::VARCHAR || ',' ||
                mh6::VARCHAR || ',' || mh7::VARCHAR) AS bucket
  FROM sig
)
SELECT n.doc_id AS doc_id,
       min(i.doc_id)::BIGINT AS first_match,
       count(DISTINCT n.band)::BIGINT AS n_bands_hit
FROM banded n JOIN banded i
  ON n.band = i.band AND n.bucket = i.bucket
WHERE n.doc_id % 2 = 1 AND i.doc_id % 2 = 0
GROUP BY 1
"""

DATA_QUERIES.update(
    {
        "text_quality_clf": text_quality_clf,
        "dedup_incremental_lsh": dedup_incremental_lsh,
    }
)
