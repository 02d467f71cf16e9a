"""Product quantization (PQ): compressed embeddings + ADC top-k.

The memory-scaling leg of the ANN suite (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search"): split each
dim-d vector into ``m`` contiguous subspaces, k-means each subspace
to ``ksub`` codewords, and store a vector as m small integer codes —
64-dim float64 embeddings (512 B) become 8 bytes at m=8/ksub=16. At
10^10 vectors that is the difference between an embedding corpus
that fits executor memory for scan-speed scoring and one that
doesn't; IVF (operators/similarity.py) prunes WHICH vectors a query
scores, PQ shrinks WHAT each scored vector costs, and the two
compose (classic IVF-PQ) by encoding each inverted list.

Scoring is asymmetric (ADC): the query stays exact; a corpus vector
is its reconstruction x̂ = concat(codeword per subspace). Because
subspaces partition the dimensions, q·x̂ = Σ_s LUT_s[code_s] and
|x̂|² = Σ_s |codeword|² — one m·ksub lookup table per query, built
once, scores any number of codes without touching floats-per-dim.

Everything is deterministic and content-addressed, same discipline
as the rest of the suite: codebook seeding picks the sub-vectors of
the ``ksub`` corpus rows with the lowest sha256(seed:id) digest (a
closed-form rule the DuckDB oracle reproduces — the seeded encode is
driver-oracle-checked end to end; Lloyd refinement is iterative and
therefore pytest + rows-only checked, like IVF training). Encode
ties resolve (max score, min code). No counterpart in the reference
(CDC tool); cited papers only.

Scale shape: training shuffles m·ksub·(dim/m) partial sums, never
vectors; encode is one narrow Arrow-batch pass; ADC top-k is
mapInPandas partial top-ks merged by one tiny window — no join
expansion anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.similarity import DOT, _dcol


def _check_dims(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    return dim // m


def seed_pq_codebooks(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Closed-form codebook seeding, per-subspace DISTINCT: codeword
    (sub, cid) is the cid-th distinct sub-vector of subspace ``sub``,
    ordered by the minimal sha256(seed:id) digest among the rows
    carrying it (digests are per-row unique, so the order is total
    and deterministic). Distinctness matters: row-level seeding can
    hand a subspace duplicate codewords (two seed rows sharing a
    sub-vector pattern), and a duplicate cell can never win an
    encode tie nor be split by Lloyd — a permanently dead cell.

    One explode + groupBy + per-sub top-ksub; m·ksub rows collected
    (tiny, same as IVF centroids). Content-addressed → stable under
    corpus growth order — and expressible in plain SQL, which is
    what lets the seeded encode hold a hash-checked driver oracle
    row. Subspaces with fewer than ksub distinct sub-vectors pad by
    repeating the first codeword (padded cells lose every encode tie
    to their original, so they are inert), with a warning."""
    dsub = _check_dims(dim, m)
    sub_idx = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    sv = df.select(
        F.expr(_dcol(vec_col)).alias("_v"),
        F.sha2(
            F.concat_ws(
                ":", F.lit(str(seed)), F.col(id_col).cast("string")
            ),
            256,
        ).alias("_d"),
        sub_idx,
    ).select(
        "sub",
        F.expr(f"slice(_v, sub * {dsub} + 1, {dsub})").alias("_sv"),
        "_d",
    )
    from pyspark.sql.window import Window

    firsts = sv.groupBy("sub", "_sv").agg(F.min("_d").alias("_k"))
    w = Window.partitionBy("sub").orderBy("_k")
    rows = (
        firsts.withColumn("cid", F.row_number().over(w) - 1)
        .filter(F.col("cid") < ksub)
        .select("sub", "cid", "_sv")
        .collect()
    )
    by_sub: dict[int, list] = {s: [] for s in range(m)}
    for r in rows:
        by_sub[r["sub"]].append((r["cid"], [float(x) for x in r["_sv"]]))
    out = []
    padded = False
    for s in range(m):
        cells = sorted(by_sub[s])
        if not cells:
            raise ValueError(f"subspace {s} has no vectors to seed from")
        while len(cells) < ksub:
            padded = True
            cells.append((len(cells), cells[0][1]))
        out.extend((s, cid, cw) for cid, cw in cells)
    if padded:
        import warnings

        warnings.warn(
            "seed_pq_codebooks: some subspaces have fewer than "
            f"ksub={ksub} distinct sub-vectors; padded cells repeat "
            "codeword 0 and stay inert",
            stacklevel=2,
        )
    return df.sparkSession.createDataFrame(
        out, "sub int, cid int, codeword array<double>"
    )


def _codebook_array(codebooks: DataFrame, m: int, ksub: int, dsub: int):
    """Collect (sub, cid, codeword) into a dense [m][ksub][dsub]
    numpy array (m·ksub rows — driver-side by design, same as IVF
    centroids). Missing cells (early-stopped training) raise."""
    C = np.full((m, ksub, dsub), np.nan)
    for r in codebooks.collect():
        C[r["sub"], r["cid"]] = np.asarray(r["codeword"], dtype=np.float64)
    if np.isnan(C).any():
        raise ValueError("codebooks missing (sub, cid) cells")
    return C


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "numpy",
) -> DataFrame:
    """Encode each vector as m codes: per subspace, the codeword
    maximizing dot(x_sub, c) − |c|²/2 (≡ argmin L2, one multiply
    fewer), ties to the lowest cid. Output one row per (vector,
    subspace): (id_col, sub, code) — integer-only, hashable by any
    oracle.

    impl="sql" is the strict left-to-right fold the DuckDB twin
    reproduces bit for bit (explode m subspaces × join ksub
    codewords → max_by; n·m·ksub scored rows, map-side-combined to
    n·m before the shuffle). impl="numpy" runs one Arrow-batch
    matmul per subspace — the corpus-scale path (no join expansion);
    agrees with sql except on last-ulp score ties."""
    dsub = _check_dims(dim, m)
    if impl == "numpy":
        C = _codebook_array(codebooks, m, ksub, dsub)
        Chalf = 0.5 * np.einsum("mkd,mkd->mk", C, C)
        out_schema = f"{id_col} {df.schema[id_col].dataType.simpleString()}, sub int, code int"

        def _enc(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                ids = pdf[id_col].to_numpy()
                res = {id_col: [], "sub": [], "code": []}
                for s in range(m):
                    score = (
                        M[:, s * dsub:(s + 1) * dsub] @ C[s].T
                        - Chalf[s][None, :]
                    )
                    # ties to the lowest cid: argmax returns the
                    # first (lowest) index of the max
                    codes = np.argmax(score, axis=1)
                    res[id_col].extend(ids)
                    res["sub"].extend([s] * len(ids))
                    res["code"].extend(codes)
                yield pd.DataFrame(res)

        return df.select(id_col, vec_col).mapInPandas(_enc, out_schema)

    sub_idx = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    subvec = F.expr(
        f"slice({_dcol(vec_col)}, sub * {dsub} + 1, {dsub})"
    ).alias("_sv")
    exploded = df.select(F.col(id_col), F.col(vec_col), sub_idx).select(
        id_col, "sub", subvec
    )
    score = F.expr(
        DOT.format(a="_sv", b="codeword")
        + " - "
        + DOT.format(a="codeword", b="codeword")
        + " / 2"
    ).alias("_score")
    return (
        exploded.join(F.broadcast(codebooks), "sub")
        .select(id_col, "sub", "cid", score)
        .groupBy(id_col, "sub")
        .agg(
            F.max_by(
                F.col("cid"), F.struct(F.col("_score"), -F.col("cid"))
            ).alias("code")
        )
    )


def train_pq_codebooks(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int | None = None,
) -> DataFrame:
    """Lloyd-refine the seeded codebooks: all m subspaces train in
    the SAME job each round — numpy encode (one narrow pass) →
    per-(sub, cid, component) mean via a map-side-combinable groupBy
    (the shuffle carries m·ksub·dsub partial sums, never vectors).
    Codewords that attract no members keep their previous value.

    sample_mod=M trains on the content-addressed 1/M hash-sample
    (sha_bigint(seed:id) % M == 0, same rule as IVF training): at
    corpus scale the iters encode passes run over the sample only;
    the caller's final full-corpus pq_encode is unchanged and the
    sample is stable under corpus growth."""
    dsub = _check_dims(dim, m)
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
    books = seed_pq_codebooks(
        base, dim, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col, seed=seed
    )
    spark = df.sparkSession
    book_rows: dict[tuple[int, int], list[float]] = {
        (r["sub"], r["cid"]): list(r["codeword"]) for r in books.collect()
    }
    books = spark.createDataFrame(
        [(s, c, v) for (s, c), v in sorted(book_rows.items())],
        "sub int, cid int, codeword array<double>",
    )
    for _ in range(iters):
        codes = pq_encode(
            base, books, dim, m=m, ksub=ksub,
            id_col=id_col, vec_col=vec_col, impl="numpy",
        )
        # per-(sub, cid, component) member mean — the SAME avg
        # aggregate as before; the m·ksub·dsub result is collected
        # directly and the codeword arrays assembled driver-side,
        # dropping the second groupBy (collect_list) and the old↔new
        # join from every Lloyd round (r07, same treatment as
        # train_ivf_centroids). Codewords with no members keep their
        # previous value by not appearing in the collected rows;
        # lineage stays truncated (fresh local relation per round).
        rows = (
            codes.join(
                base.select(
                    F.col(id_col), F.expr(_dcol(vec_col)).alias("_v")
                ),
                id_col,
            )
            .select(
                "sub",
                F.col("code").alias("cid"),
                F.posexplode(
                    F.expr(f"slice(_v, sub * {dsub} + 1, {dsub})")
                ).alias("_i", "_x"),
            )
            .groupBy("sub", "cid", "_i")
            .agg(F.avg("_x").alias("_mean"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            upd.setdefault((r["sub"], r["cid"]), {})[r["_i"]] = r["_mean"]
        for key, comps in upd.items():
            book_rows[key] = [comps[i] for i in sorted(comps)]
        books = spark.createDataFrame(
            [(s, c, v) for (s, c), v in sorted(book_rows.items())],
            "sub int, cid int, codeword array<double>",
        )
    return books


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    dim: int,
    k: int = 3,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """IVF-PQ composed top-k (the classic billion-scale ANN index,
    Jégou et al. 2011 §V): the IVF coarse quantizer prunes WHICH
    vectors a query scores (each vector lives in its nearest
    centroid's inverted list, a query probes its nprobe nearest
    lists), and PQ shrinks WHAT each scored vector costs (m small
    integer codes instead of dim floats). Scoring is asymmetric
    (ADC): cosine(query, x̂) where x̂ is the PQ reconstruction.
    Output (query_id, rank, neighbor_id) — integer-only, ties
    (desc cosine, asc neighbor_id).

    impl="sql" reconstructs x̂ explicitly (codes → broadcast codebook
    join → flatten in subspace order) and scores with the strict
    left-to-right fold — every step is single-statement-SQL, which is
    what lets the seeded-codebook form hold a hash-checked driver
    oracle (the trained PQ/IVF queries only get rows-only checks).
    impl="numpy" is the corpus-scale shape: ONE narrow mapInPandas
    pass builds the compressed index row (cid + m codes ≈ 16 bytes
    per vector vs 8·dim) — assign and encode share the batch, so
    there is no corpus-size join between them — then a second pass
    LUT-scores only the rows whose list some query probes; per-batch
    tie-aware local top-ks merge through one tiny window. At 10^10
    vectors the scoring pass touches integer codes, never floats per
    dim, and the probe mask prunes the per-query work to nprobe/k_c
    of the corpus. Direct (non-residual) encoding: cosine ADC does
    not need the L2 residual trick and direct codes keep the encode
    oracle-expressible; the residual variant is a training-time
    refinement, not a different plan shape."""
    from plugin_debezium_spark.operators.similarity import (
        dot_over_norms,
        ivf_assign,
        norm_expr,
    )

    dsub = _check_dims(dim, m)
    if impl == "sql":
        cl = ivf_assign(
            corpus, centroids, 1, id_col, vec_col, impl="sql"
        ).select(F.col(id_col).alias("neighbor_id"), "cid")
        codes = pq_encode(
            corpus, codebooks, dim, m=m, ksub=ksub,
            id_col=id_col, vec_col=vec_col, impl="sql",
        )
        xhat = (
            codes.join(
                F.broadcast(codebooks.withColumnRenamed("cid", "code")),
                ["sub", "code"],
            )
            .groupBy(id_col)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("sub", "codeword"))
                ).alias("_sc")
            )
            .select(
                F.col(id_col).alias("neighbor_id"),
                F.flatten(
                    F.expr("transform(_sc, s -> s.codeword)")
                ).alias("_xhat"),
            )
        )
        cside = cl.join(xhat, "neighbor_id").withColumn(
            "_xn", F.expr(norm_expr("_xhat"))
        )
        ql = ivf_assign(
            queries, centroids, nprobe, id_col, vec_col, impl="sql"
        ).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.expr(norm_expr(vec_col)).alias("_qn"),
            "cid",
        )
        scored = cside.join(F.broadcast(ql), "cid").withColumn(
            "_cos", F.expr(dot_over_norms("_qvec", "_xhat", "_qn", "_xn"))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("_cos"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id")
        )

    # ---- numpy corpus-scale path ----
    C = _codebook_array(codebooks, m, ksub, dsub)
    sqn = np.einsum("mkd,mkd->mk", C, C)
    crows = centroids.orderBy("cid").collect()
    cids_arr = np.array([r["cid"] for r in crows], dtype=np.int64)
    CM = np.stack(
        [np.asarray(r["centroid"], dtype=np.float64) for r in crows]
    )
    CMn = np.linalg.norm(CM, axis=1)
    qrows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    qid_type = queries.schema[id_col].dataType.simpleString()
    nid_type = corpus.schema[id_col].dataType.simpleString()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {qid_type}, rank int, neighbor_id {nid_type}",
        )
    qids = [r[0] for r in qrows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Qn = np.linalg.norm(Q, axis=1)
    # per-query probe sets: nprobe nearest centroids, ties to asc cid
    qcos = (Q @ CM.T) / np.maximum(Qn[:, None] * CMn[None, :], 1e-300)
    probes = []
    for j in range(len(qids)):
        order = np.lexsort((cids_arr, -qcos[j]))[:nprobe]
        probes.append(set(cids_arr[order].tolist()))
    LUT = np.einsum("mkd,jmd->mkj", C, Q.reshape(len(qids), m, dsub))

    def _index(batches):
        """One narrow pass: coarse-assign AND encode each batch —
        the compressed index row (id, cid, m codes), no join."""
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            Mn = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
            cc = (M @ CM.T) / (Mn[:, None] * CMn[None, :])
            # argmax takes the FIRST max; cids_arr ascending → min-cid ties
            cid = cids_arr[np.argmax(cc, axis=1)]
            codes = np.empty((len(ids), m), dtype=np.int32)
            for s in range(m):
                sc = (
                    M[:, s * dsub:(s + 1) * dsub] @ C[s].T
                    - 0.5 * sqn[s][None, :]
                )
                codes[:, s] = np.argmax(sc, axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "cid": cid,
                    "codes": list(codes),
                }
            )

    idx = corpus.select(id_col, vec_col).mapInPandas(
        _index, f"{id_col} {nid_type}, cid long, codes array<int>"
    )

    # ADVICE r5 #3: the probe mask must prune the COMPUTE, not just the
    # emitted rows — pre-filter each batch to rows in the union of all
    # probe sets, then gather/sum the LUT per query over only that
    # query's masked rows, so ADC work scales with nprobe/k_c of the
    # corpus (float ops identical to the full-matrix form, so results
    # are bit-equal).
    probe_arrays = [
        np.fromiter(p, dtype=np.int64, count=len(p)) for p in probes
    ]
    union_cids = np.unique(np.concatenate(probe_arrays))

    def _score(batches):
        subs = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            rcids = pdf["cid"].to_numpy()
            keep = np.isin(rcids, union_cids)
            if not keep.any():
                continue
            ids = ids[keep]
            rcids = rcids[keep]
            codes = np.stack(pdf["codes"].to_numpy()[keep]).astype(np.int64)
            xnorm = np.sqrt(sqn[subs[None, :], codes].sum(axis=1))
            xnorm[xnorm == 0.0] = np.inf
            out = {"query_id": [], "neighbor_id": [], "_score": []}
            for j, qid in enumerate(qids):
                mask = np.isin(rcids, probe_arrays[j])
                if not mask.any():
                    continue
                cj = codes[mask]
                dots_j = LUT[subs[:, None], cj.T, j].sum(axis=0)
                col = dots_j / (xnorm[mask] * Qn[j])
                mids = ids[mask]
                kk = min(k, len(mids))
                cand = np.argpartition(-col, kk - 1)[:kk]
                cand = np.flatnonzero(col >= col[cand].min())
                cand = cand[np.lexsort((mids[cand], -col[cand]))][:kk]
                out["query_id"].extend([qid] * len(cand))
                out["neighbor_id"].extend(mids[cand])
                out["_score"].extend(col[cand])
            yield pd.DataFrame(out)

    cand = idx.mapInPandas(
        _score,
        f"query_id {qid_type}, neighbor_id {nid_type}, _score double",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    dim: int,
    k: int = 3,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC approximate top-k: encode the corpus (one narrow numpy
    pass), build each query's m×ksub dot-product LUT once, score
    codes per Arrow batch (integer gathers + one sum — never a
    per-dim float op), keep per-batch local top-ks, merge with one
    tiny window. Output (query_id, rank, neighbor_id) — the same
    integer-only shape as the LSH/IVF top-k queries.

    Tie discipline matches _brute_force_topk_numpy: the boundary
    selection is widened to every row tied with the k-th approx
    score before the (desc score, asc id) order, so duplicate
    vectors (identical codes) rank deterministically."""
    dsub = _check_dims(dim, m)
    C = _codebook_array(codebooks, m, ksub, dsub)
    sqn = np.einsum("mkd,mkd->mk", C, C)  # |codeword|² per (sub,cid)
    qrows = (
        queries.select(id_col, vec_col).orderBy(id_col).collect()
    )
    qid_type = queries.schema[id_col].dataType.simpleString()
    nid_type = corpus.schema[id_col].dataType.simpleString()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {qid_type}, rank int, "
            f"neighbor_id {nid_type}, _score double",
        ).select("query_id", "rank", "neighbor_id")
    qids = [r[0] for r in qrows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Qn = np.linalg.norm(Q, axis=1)
    # LUT[s, c, j] = q_j_sub_s · codeword(s, c)
    LUT = np.einsum(
        "mkd,jmd->mkj",
        C,
        Q.reshape(len(qids), m, dsub),
    )

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            codes = np.empty((len(ids), m), dtype=np.int64)
            for s in range(m):
                sc = (
                    M[:, s * dsub:(s + 1) * dsub] @ C[s].T
                    - 0.5 * sqn[s][None, :]
                )
                codes[:, s] = np.argmax(sc, axis=1)
            subs = np.arange(m)
            dots = LUT[subs[:, None], codes.T, :].sum(axis=0)
            xnorm = np.sqrt(sqn[subs[None, :], codes].sum(axis=1))
            xnorm[xnorm == 0.0] = np.inf  # all-zero reconstruction
            cos = dots / (xnorm[:, None] * Qn[None, :])
            kk = min(k, len(ids))
            out = {"query_id": [], "neighbor_id": [], "_score": []}
            for j, qid in enumerate(qids):
                col = cos[:, j]
                cand = np.argpartition(-col, kk - 1)[:kk]
                cand = np.flatnonzero(col >= col[cand].min())
                cand = cand[np.lexsort((ids[cand], -col[cand]))][:kk]
                out["query_id"].extend([qid] * len(cand))
                out["neighbor_id"].extend(ids[cand])
                out["_score"].extend(col[cand])
            yield pd.DataFrame(out)

    from pyspark.sql.window import Window

    cand = corpus.select(id_col, vec_col).mapInPandas(
        _score,
        f"query_id {qid_type}, neighbor_id {nid_type}, _score double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
