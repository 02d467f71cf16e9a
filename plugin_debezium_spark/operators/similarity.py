"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
one pass over the corpus, per-query top-k via window. Scale path:
random-hyperplane LSH bucketing so each query only scans its bucket
(±multiprobe), turning a full-corpus scan into a bucket scan.

Every scoring operator has two implementations behind ``impl=``:
"sql" (default) computes dot products JVM-side via higher-order
functions with a strict left-to-right fold — bit-exact against any
external engine, the form the driver oracles hash; "numpy" runs one
Arrow-batch matmul per batch (brute force additionally avoids the
join expansion entirely via mapInPandas partial top-ks) — measured
~19-24x faster at 400k vectors, the corpus-scale throughput path.
The two agree except on exact-cosine float ties (last-ulp summation
order). The hyperplane signature is always a vectorized pandas UDF
over QUANT-quantized integers, exact in every engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + v * v))"


def _dcol(name: str) -> str:
    return f"transform({name}, v -> cast(v as double))"


def cosine_expr(a: str, b: str) -> str:
    """Self-contained cosine (norms inline). For joins prefer
    norm_expr-precomputed columns + dot_over_norms — norms are
    per-vector, not per-pair."""
    da, db = _dcol(a), _dcol(b)
    return (
        f"{DOT.format(a=da, b=db)} / "
        f"(({NORM.format(a=da)}) * ({NORM.format(a=db)}))"
    )


def norm_expr(a: str) -> str:
    return NORM.format(a=_dcol(a))


def dot_over_norms(a: str, b: str, norm_a: str, norm_b: str) -> str:
    return f"{DOT.format(a=_dcol(a), b=_dcol(b))} / ({norm_a} * {norm_b})"


def cosine_pandas_udf():
    """Vectorized cosine over two array columns: one numpy matmul per
    Arrow batch instead of the interpreted higher-order aggregate.
    ~10-100x the per-row throughput of the SQL expression on wide
    vectors — the ``impl="numpy"`` hot path. Floating-point summation
    order differs from the SQL expression's strict left-to-right
    fold, so near-tie ranks can flip in the last ulp: use the SQL
    path when bit-exact cross-engine reproducibility matters (driver
    oracles), numpy when throughput does. Must be constructed lazily
    (pandas_udf needs an active session)."""

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        return pd.Series(
            dots
            / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1))
        )

    return _cos


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """Exact cosine top-k per query. queries must be small (it is
    broadcast); the corpus is scanned once, no shuffle until the
    per-query top-k (tiny after the filter).

    impl="numpy": mapInPandas scores each Arrow batch against the
    whole query matrix in ONE numpy matmul and emits only the batch's
    local top-k per query — the shuffle carries n_batches x queries x
    k candidate rows instead of corpus x queries scored rows, and no
    join expansion ever materializes. The final window merges the
    partial top-ks. Same results as the SQL path up to float-sum
    ordering on exact cosine ties (see cosine_pandas_udf)."""
    if impl == "numpy":
        return _brute_force_topk_numpy(corpus, queries, k, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm_expr(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(norm_expr(vec_col)).alias("cn"),
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", F.expr(dot_over_norms("qvec", "cvec", "qn", "cn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _brute_force_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    qid_type = queries.schema[id_col].dataType.simpleString()
    nid_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"query_id {qid_type}, neighbor_id {nid_type}, cosine double"
    )
    rows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    if not rows:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [],
            f"query_id {qid_type}, rank int, "
            f"neighbor_id {nid_type}, cosine double",
        )
    qids = [r[0] for r in rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    Qn = np.linalg.norm(Q, axis=1)

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = (M @ Q.T) / (
                np.linalg.norm(M, axis=1)[:, None] * Qn[None, :]
            )
            ids = pdf[id_col].to_numpy()
            kk = min(k, len(ids))
            out = {"query_id": [], "neighbor_id": [], "cosine": []}
            for j, qid in enumerate(qids):
                col = cos[:, j]
                # local top-k of this batch. argpartition selects by
                # cosine alone, so exact-cosine ties straddling the
                # kk-th boundary (duplicate vectors are common in
                # dedupe corpora) could drop a tied smaller-id
                # neighbor; widen the candidate set to every row tied
                # with the boundary value before the (-cos, id) order
                # so the selection matches the SQL path's
                # (desc cosine, asc neighbor_id) rule.
                cand = np.argpartition(-col, kk - 1)[:kk]
                cand = np.flatnonzero(col >= col[cand].min())
                cand = cand[np.lexsort((ids[cand], -col[cand]))][:kk]
                out["query_id"].extend([qid] * len(cand))
                out["neighbor_id"].extend(ids[cand])
                out["cosine"].extend(col[cand])
            yield pd.DataFrame(out)

    cand = corpus.select(id_col, vec_col).mapInPandas(_score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _ivf_assign_numpy(
    df: DataFrame,
    centroids: DataFrame,
    n_lists: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    rows = centroids.select("cid", "centroid").orderBy("cid").collect()
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    C = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    Cn = np.linalg.norm(C, axis=1)

    if n_lists == 1:

        @pandas_udf("long")
        def _argmax(v: pd.Series) -> pd.Series:
            M = np.stack(v.to_numpy()).astype(np.float64)
            cos = (M @ C.T) / (np.linalg.norm(M, axis=1)[:, None] * Cn[None, :])
            # centroids sorted by cid: argmax's first-max rule IS the
            # (max cosine, min cid) tie rule
            return pd.Series(cids[np.argmax(cos, axis=1)])

        keep = [c for c in df.columns if c != id_col]
        return df.withColumn("cid", _argmax(F.col(vec_col))).select(
            id_col, *keep, "cid"
        )

    @pandas_udf("array<long>")
    def _topn(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        cos = (M @ C.T) / (np.linalg.norm(M, axis=1)[:, None] * Cn[None, :])
        out = []
        for row in cos:
            order = np.lexsort((cids, -row))[:n_lists]
            out.append(cids[order])
        return pd.Series(out)

    return df.withColumn("_cids", _topn(F.col(vec_col))).select(
        *df.columns, F.explode("_cids").alias("cid")
    )


# Embedding quantization step for LSH signatures. 1024 = 2^10, so
# x*QUANT is EXACT in IEEE floating point (no rounding) and
# floor(x*QUANT) is bit-identical in numpy, Spark, and DuckDB — the
# whole signature is integer arithmetic any engine reproduces.
QUANT = 1024


def sha_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """±1 hyperplane matrix (dim × n_planes) derived from sha256 of
    "hp:{seed}:{plane}:{coord}" — engine-neutral constants, so a SQL
    oracle (or any other engine) can regenerate the identical planes.
    Rademacher ±1 entries give the same LSH guarantees as Gaussian
    planes (Achlioptas 2003, database-friendly random projections)."""
    import hashlib

    m = np.empty((dim, n_planes), dtype=np.int64)
    for j in range(n_planes):
        for i in range(dim):
            h = hashlib.sha256(f"hp:{seed}:{j}:{i}".encode()).digest()
            m[i, j] = 1 if (h[0] & 1) else -1
    return m


def hyperplane_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Hyperplane LSH signature (sign bits of Q·S over the quantized
    vector Q = floor(v*QUANT) and sha-derived ±1 planes S) as an int
    bucket id. One numpy integer matmul per Arrow batch — exact, so
    the bucket assignment is deterministic across engines."""
    planes = sha_planes(dim, n_planes, seed)

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        q = np.floor(m * QUANT).astype(np.int64)
        bits = (q @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype("int64")
        return pd.Series(bits @ weights)

    return df.withColumn(out_col, _sig(F.col(vec_col)))


def _cosine_col(impl: str, a: str, b: str, na: str, nb: str):
    """Scoring column for a joined (a, b) vector pair: the bit-exact
    JVM expression (impl="sql", strict left-to-right fold over
    precomputed norms) or one numpy matmul per Arrow batch
    (impl="numpy", ~10-100x per-row throughput; last-ulp summation
    differences can flip exact-cosine ties — see cosine_pandas_udf)."""
    if impl == "numpy":
        return cosine_pandas_udf()(F.col(a), F.col(b))
    return F.expr(dot_over_norms(a, b, na, nb))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 0,
    impl: str = "sql",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket. Recall grows with fewer planes / multiprobe;
    cost drops ~2^n_planes-fold vs brute force. At 100 TB you'd
    partition the corpus table by bucket so a query reads one
    partition.

    ``multiprobe=1`` additionally probes every Hamming-distance-1
    bucket (each of the n_planes sign bits flipped once) — the
    QUERY side fans out to n_planes+1 bucket keys (still tiny, still
    broadcast; the corpus is never duplicated), recovering neighbors
    that fell just across one hyperplane. Probe order is
    deterministic (exact bucket, then bit 0..n_planes-1), so an
    external oracle enumerates the identical probe set. Each
    (query, neighbor) pair appears at most once: a corpus vector
    lives in exactly one bucket and the probe buckets are distinct."""
    if multiprobe not in (0, 1):
        raise ValueError("multiprobe supports 0 (exact bucket) or 1 (±1 bit)")
    cb = hyperplane_signature(corpus, dim, n_planes, vec_col=vec_col)
    qb = hyperplane_signature(queries, dim, n_planes, vec_col=vec_col)
    q = qb.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm_expr(vec_col)).alias("qn"),
        F.col("bucket"),
    )
    if multiprobe == 1:
        q = q.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << j))
                        for j in range(n_planes)
                    ],
                )
            ),
        )
    c = cb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(norm_expr(vec_col)).alias("cn"),
        F.col("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", _cosine_col(impl, "qvec", "cvec", "qn", "cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    n_lists: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """Assign each vector to its n_lists nearest centroids by cosine
    (IVF coarse quantizer). Centroids are a SMALL DataFrame
    (cid, centroid) — broadcast, so assignment is one map-side pass
    over the corpus (k dot products per vector, no shuffle until the
    tiny per-vector top-n window). Ties break on ascending cid.

    Centroids are supplied, not trained: in production IVF the coarse
    quantizer is trained offline (sampled k-means) and shipped as a
    lookup table; any deterministic centroid set works for the
    mechanism. Dot products use the JVM aggregate expression (strict
    left-to-right summation) so an external oracle reproduces the
    argmax bit-for-bit — numpy matmul would not guarantee order.

    impl="numpy": one matmul per Arrow batch against the broadcast
    centroid matrix — the corpus is NEVER joined/expanded by
    n_centroids, so shuffle volume is zero and the scoring loop is
    vectorized. The throughput path for corpus-scale assignment;
    ranks can differ from the SQL path only on exact-cosine float
    ties (see cosine_pandas_udf)."""
    if impl == "numpy":
        return _ivf_assign_numpy(df, centroids, n_lists, id_col, vec_col)
    c = centroids.select(
        F.col("cid"),
        F.col("centroid").alias("_cvec"),
        F.expr(norm_expr("centroid")).alias("_cn"),
    )
    scored = df.withColumn(
        "_vn", F.expr(norm_expr(vec_col))
    ).join(F.broadcast(c)).withColumn(
        "_ccos", F.expr(dot_over_norms(vec_col, "_cvec", "_vn", "_cn"))
    )
    if n_lists == 1:
        # The corpus-assignment case (every IVF build runs it over the
        # WHOLE corpus): an argmax aggregate instead of a row_number
        # window — max_by gets map-side partial aggregation, so the
        # corpus×n_centroids scored rows reduce to one row per vector
        # BEFORE the shuffle; a window would shuffle and sort them all
        # by vec_id. Tie order matches the window (max cosine, then
        # min cid via the negated component).
        keep = [col for col in df.columns if col != id_col]
        winner = F.max_by(
            F.struct(*[F.col(col) for col in keep], F.col("cid")),
            F.struct(F.col("_ccos"), (-F.col("cid")).alias("_ncid")),
        ).alias("_w")
        agg = scored.groupBy(id_col).agg(winner)
        return agg.select(
            id_col, *[F.col(f"_w.{col}") for col in keep], F.col("_w.cid")
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("_ccos"), F.asc("cid"))
    return (
        scored.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= n_lists)
        .drop("_cvec", "_cn", "_vn", "_ccos", "_crank")
    )


def train_ivf_centroids(
    df: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int | None = None,
) -> DataFrame:
    """Train the IVF coarse quantizer: k-means by cosine over the
    corpus (closes the 'centroids supplied, not trained' gap — in
    production this runs offline on a sample; here it is the same
    Spark job shape at any scale).

    Deterministic throughout: seeding is farthest-point (k-means++'s
    deterministic cousin) — seed 0 is the vector with the smallest
    sha256(seed:id) digest (content-addressed, stable under corpus
    growth order), each next seed is the corpus vector with the
    LOWEST max-cosine to the seeds so far (ties: min id), found by a
    min_by aggregate over one numpy-scored corpus pass per seed (k-1
    passes, k is small). Bad-luck sha sampling cannot collapse two
    true clusters into one cell this way. Each of the fixed `iters`
    Lloyd rounds is then assign (numpy Arrow-batch argmax, no join
    expansion) → per-cid MEAN of member vectors (one
    map-side-combinable groupBy over `posexplode`d components — the
    shuffle carries k×dim partial sums, not vectors). Empty cells
    keep their previous centroid. Returns (cid, centroid) with cids
    densely assigned in seeding order, ready for ivf_assign/ivf_topk.

    sample_mod=M trains on the deterministic content-addressed
    1/M hash-sample ``sha_bigint(seed:id) % M == 0`` (the hash_split
    trick) instead of the full corpus: at 10^10 rows the k-1 seeding
    passes and `iters` Lloyd passes would otherwise each scan
    everything before training even starts. Seeding AND Lloyd run on
    the sample; the caller's final ivf_assign over the full corpus is
    unchanged. The sample is stable under corpus growth/order, so a
    re-train on an appended corpus keeps the same sample members.

    If the corpus runs out of distinct vector directions before k
    seeds are found (the farthest remaining vector is already
    cosine≈1 to a chosen seed), seeding stops early and FEWER than k
    centroids are returned, with a warning — duplicate centroids
    would pin permanently-empty cells on the higher cids."""
    base = df
    if sample_mod and sample_mod > 1:
        digest = F.conv(
            F.substring(
                F.sha2(
                    F.concat_ws(
                        ":", F.lit(str(seed)), F.col(id_col).cast("string")
                    ),
                    256,
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        base = df.filter(digest % sample_mod == 0)
        if not base.select(id_col).head(1):
            base = df  # degenerate sample (tiny corpus / huge M)
    first = (
        base.select(
            F.col(id_col),
            F.col(vec_col),
            F.sha2(
                F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")),
                256,
            ).alias("_d"),
        )
        .orderBy("_d", id_col)
        .first()
    )
    chosen = [np.asarray(first[vec_col], dtype=np.float64)]
    for _ in range(k - 1):
        S = np.stack(chosen)
        Sn = np.linalg.norm(S, axis=1)

        @pandas_udf("double")
        def _maxcos(v: pd.Series) -> pd.Series:
            M = np.stack(v.to_numpy()).astype(np.float64)
            cos = (M @ S.T) / (
                np.linalg.norm(M, axis=1)[:, None] * Sn[None, :]
            )
            return pd.Series(cos.max(axis=1))

        far = (
            base.select(F.col(id_col), F.col(vec_col))
            .withColumn("_mc", _maxcos(F.col(vec_col)))
            .agg(
                F.min_by(
                    F.struct(
                        F.col("_mc"), F.col(vec_col).alias("_v")
                    ),
                    F.struct(F.col("_mc"), F.col(id_col)),
                ).alias("_s")
            )
            .collect()[0]["_s"]
        )
        # exhausted distinct directions: the farthest remaining vector
        # already coincides (cosine≈1) with a chosen seed — appending
        # it would create duplicate centroids whose higher cids stay
        # permanently empty. Stop with what we have.
        if far["_mc"] >= 1.0 - 1e-9:
            import warnings

            warnings.warn(
                f"train_ivf_centroids: corpus has only {len(chosen)} "
                f"distinct vector directions; returning "
                f"{len(chosen)} centroids instead of k={k}",
                stacklevel=2,
            )
            break
        chosen.append(np.asarray(far["_v"], dtype=np.float64))
    spark = df.sparkSession
    cent_rows: dict[int, list[float]] = {
        i: [float(x) for x in v] for i, v in enumerate(chosen)
    }
    cent = spark.createDataFrame(
        sorted(cent_rows.items()), "cid long, centroid array<double>"
    )
    corpus = base.select(id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(
            corpus, cent, 1, id_col=id_col, vec_col=vec_col, impl="numpy"
        )
        # per-(cid, component) member mean — the SAME avg aggregate as
        # before; the k×dim result is collected directly and the
        # centroid arrays assembled driver-side, dropping the second
        # groupBy (collect_list), the old↔new join and one exchange
        # from every Lloyd round (~2.0 → ~1.3 s/round at sf0.1, r07).
        # Empty cells keep the previous centroid by simply not
        # appearing in the collected rows. Lineage stays truncated:
        # each round's cent is a fresh local relation.
        rows = (
            assigned.select(
                "cid",
                F.posexplode(
                    F.expr(f"transform({vec_col}, v -> cast(v as double))")
                ).alias("_i", "_x"),
            )
            .groupBy("cid", "_i")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in rows:
            upd.setdefault(r["cid"], {})[r["_i"]] = r["_m"]
        for cid, comps in upd.items():
            cent_rows[cid] = [comps[i] for i in sorted(comps)]
        cent = spark.createDataFrame(
            sorted(cent_rows.items()), "cid long, centroid array<double>"
        )
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest
    centroid's inverted list; each query probes its nprobe nearest
    lists and scores only those vectors. At 100 TB the corpus table is
    partitioned by cid so a query reads nprobe partitions — the same
    pruning shape as the hyperplane-LSH path but with data-adaptive
    cells. Recall grows with nprobe (nprobe = n_centroids ≡ brute
    force)."""
    cl = ivf_assign(corpus, centroids, 1, id_col, vec_col, impl=impl).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(norm_expr(vec_col)).alias("cn"),
        "cid",
    )
    ql = ivf_assign(queries, centroids, nprobe, id_col, vec_col, impl=impl).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm_expr(vec_col)).alias("qn"),
        "cid",
    )
    scored = cl.join(F.broadcast(ql), "cid").withColumn(
        "cosine", _cosine_col(impl, "qvec", "cvec", "qn", "cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    impl: str = "sql",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: exact
    cosine computed only within buckets.

    max_bucket_size: a degenerate bucket of k vectors (zero vectors,
    mass-duplicated embeddings) emits k²/2 pairs; buckets above the cap
    are excluded from pair generation (route them to exact dedup
    instead). None (default) = all buckets."""
    b = hyperplane_signature(df, dim, n_planes, vec_col=vec_col)
    if max_bucket_size is not None:
        keep = (
            b.groupBy("bucket")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("bucket")
        )
        b = b.join(keep, "bucket", "left_semi")
    a_side = b.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.expr(norm_expr(vec_col)).alias("na"),
        "bucket",
    )
    b_side = b.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.expr(norm_expr(vec_col)).alias("nb"),
        "bucket",
    )
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine_col(impl, "va", "vb", "na", "nb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
