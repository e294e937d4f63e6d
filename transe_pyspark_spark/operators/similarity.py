"""Similarity search: brute-force k-NN + LSH-bucketed ANN (SURVEY §2B R16/R17).

Generalizes the reference's full-vocabulary ranking (``test.py:49-62``,
a per-triple NumPy argsort against a broadcast embedding matrix) into
two engine operators:

* ``knn_relational`` — declarative cross-join + window top-k. Fully
  Catalyst-planned and oracle-checkable; right choice when the query
  side is small (the optimizer broadcasts it) and you want pushdown /
  codegen.
* ``knn_broadcast`` — the scale path for a *large* candidate side: the
  query matrix is broadcast once, candidates stream through
  ``mapInPandas`` computing a vectorized partial top-k per partition
  (NumPy, Arrow batches), then a cheap global top-k over
  n_partitions×k rows. No shuffle of the candidate table at all.
* ``ann_lsh`` — MLlib BucketedRandomProjectionLSH for approximate
  search; recall measured against the brute-force result in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transe_pyspark_spark.functions import vector as V


def knn_relational(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2_sq",
) -> DataFrame:
    """Exact top-k neighbors, declaratively.

    Plan shape: broadcast(queries) × candidates → distance expression
    (JVM higher-order functions, inside codegen) → window top-k
    partitioned by query. Candidate scan is never shuffled when the
    query side broadcasts; the window shuffles only (n_queries ×
    n_candidates) *scored* rows — acceptable when n_queries is small,
    which is the contract for this variant.
    """
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = candidates.select(F.col(cand_id).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    dist = {"l2_sq": V.l2_sq, "l1": V.l1}[metric](F.col("__qv"), F.col("__cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id").isNotNull())
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dist.alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def knn_broadcast(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2_sq",
) -> DataFrame:
    """Exact top-k with a broadcast query matrix — the 100 TB path.

    Mirrors the reference's eval kernel (broadcast matrix + per-
    partition NumPy, ``test.py:49-62``) but Arrow-vectorized and with
    partial top-k pushed into the map side: each partition emits at
    most n_queries×k rows, so the only shuffle is the tiny final
    aggregation. Candidates are scanned once, never materialized.
    """
    qrows = queries.select(query_id, vec_col).collect()  # model-sized: queries are few by contract
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_mat = spark.sparkContext.broadcast(q_mat)

    out_schema = "query_id long, neighbor_id long, dist double"

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = b_ids.value, b_mat.value
        best: dict[int, list[tuple[float, int]]] = {}
        import heapq

        for pdf in batches:
            ids = pdf[cand_id].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if metric == "l2_sq":
                # ||q||² - 2q·c + ||c||², vectorized over the whole batch
                d = (
                    (qm * qm).sum(axis=1)[:, None]
                    - 2.0 * (qm @ mat.T)
                    + (mat * mat).sum(axis=1)[None, :]
                )
            else:  # l1
                d = np.abs(qm[:, None, :] - mat[None, :, :]).sum(axis=2)
            for i in range(len(qi)):
                heap = best.setdefault(int(qi[i]), [])
                for j in range(len(ids)):
                    if ids[j] == qi[i]:
                        continue
                    # (-dist, -id): among equal distances the SMALLER id
                    # compares larger and is retained, matching the
                    # global tie-break (orderBy dist asc, neighbor_id
                    # asc) and knn_relational exactly.
                    item = (-float(d[i, j]), -int(ids[j]))
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        rows = [
            (q, -negid, -negd)
            for q, heap in best.items()
            for negd, negid in heap
        ]
        yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "dist"])

    partials = candidates.select(cand_id, vec_col).mapInPandas(partial_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        partials.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN via random-projection LSH (MLlib).

    Candidates are bucketed by hash; the join only scores colliding
    pairs — sublinear in candidate count at scale. Recall vs
    ``knn_broadcast`` is the quality metric (tests).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = candidates.select(F.col(cand_id).alias("id"), array_to_vector(F.col(vec_col)).alias("features"))
    q = queries.select(F.col(query_id).alias("id"), array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="dist")
    pairs = joined.select(
        F.col("datasetA.id").alias("query_id"),
        F.col("datasetB.id").alias("neighbor_id"),
        (F.col("dist") * F.col("dist")).alias("dist"),  # euclidean → squared, match l2_sq
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN via IVF (inverted-file) partitioning — the
    second scale path next to LSH (R17).

    Build: MLlib KMeans coarse-quantizes candidates into ``n_cells``
    cells (one shuffle); each candidate row is tagged with its cell.
    Probe: each query is compared to the (tiny, broadcast) centroid
    table, keeps its ``n_probe`` nearest cells, and scores ONLY the
    candidates in those cells — work scales with n_probe/n_cells of the
    corpus instead of all of it. Recall vs brute force is the quality
    metric (pytest)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c)
    binned = model.transform(c).select("neighbor_id", "__cv", "cell")

    centroids = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    cent_df = F.broadcast(
        queries.sparkSession.createDataFrame(centroids, "cell int, __ctr array<double>")
    )
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__cd").asc(), F.col("cell").asc())
    probes = (
        q.crossJoin(cent_df)
        .select("query_id", "__qv", "cell", V.l2_sq("__qv", "__ctr").alias("__cd"))
        .withColumn("__pr", F.row_number().over(w_probe))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "cell")
    )
    scored = (
        probes.join(binned, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", V.l2_sq("__qv", "__cv").alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _kmeans_np(X: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side sample (codebook training
    is model-sized — M·k·(d/M) floats — exactly like the TransE
    parameter server). Vectorized assignment via ‖x‖²−2xCᵀ+‖c‖²."""
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        a = d.argmin(1)
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                C[j] = pts.mean(0)
    return C


def ann_ivf_pq(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    m_subvectors: int = 8,
    n_codes: int = 64,
    train_sample: int = 4096,
    refine_factor: int = 16,
    rotate: bool = False,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ approximate k-NN — the memory-bound scale path beyond
    ``ann_ivf``: candidates are stored as ``m_subvectors`` one-byte
    codes instead of d floats (64-dim float32 → 8 bytes, a 32×
    compression), so a 100 TB embedding corpus's index fits a cluster's
    RAM.

    Build: MLlib KMeans coarse-quantizes candidates into ``n_cells``
    (one shuffle). Per-subspace codebooks are trained driver-side with
    NumPy k-means on a bounded residual sample (codebooks are
    model-sized; the sample is ``train_sample`` rows however big the
    corpus), then every candidate's RESIDUAL (vec − cell centroid) is
    encoded to codes in one Arrow ``mapInPandas`` pass — no shuffle.

    Probe: queries pick ``n_probe`` nearest cells from the broadcast
    centroid table; scoring joins probes to codes ON THE CELL KEY only,
    then ``applyInPandas`` per (query, cell) group computes the
    asymmetric-distance lookup table (M × n_codes) once and scores all
    codes in that cell by table lookup — O(M) adds per candidate, never
    touching the original vectors.

    Refine: PQ distances only SHORTLIST — the top ``k·refine_factor``
    per query are re-scored exactly against their original vectors (a
    shortlist-sized gather join, the FAISS IVFPQR pattern), which
    recovers the ordering the quantization error loses. As
    ``refine_factor`` grows, recall converges to plain IVF's at the
    same probe budget (the residual loss is cell-miss, not
    quantization — measured in ``scripts/ann_tradeoff.py``: 0.545 →
    0.690 → 0.725 at factors 4/8/16 vs IVF 0.740 on the sf0.1
    fixture); the default 16 closes to within 0.015 of the cell-miss
    bound while the re-rank join stays shortlist-sized (k·16 rows per
    query — latency measured unchanged vs factor 8). Recall vs brute
    force is the quality metric (pytest).

    ``rotate`` applies an OPQ-lite random orthonormal rotation to the
    residuals before the subspace split (Ge et al., CVPR 2013's
    non-iterative baseline): worthwhile when embedding dimensions are
    correlated or unevenly scaled; the synthetic fixture is isotropic,
    where it measures neutral-to-negative, so it defaults off."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c)
    binned = model.transform(c).select("neighbor_id", "__cv", "cell")
    cent = np.array([[float(x) for x in ctr] for ctr in model.clusterCenters()])
    d = cent.shape[1]
    if d % m_subvectors != 0:
        raise ValueError(f"dim {d} not divisible by m_subvectors={m_subvectors}")
    ds = d // m_subvectors

    # codebooks from a deterministic bounded residual sample
    samp = binned.orderBy("neighbor_id").limit(train_sample).collect()
    resid = np.array([np.asarray(r["__cv"], np.float64) - cent[r["cell"]] for r in samp])
    rng = np.random.default_rng(seed)
    # OPQ-lite rotation (Ge et al., "Optimized Product Quantization",
    # CVPR 2013 — the non-iterative baseline): residuals are rotated by
    # a seeded random orthonormal matrix before the subspace split.
    # Correlated/unevenly-scaled dimensions make some subspaces carry
    # most of the quantization error; a rotation spreads variance
    # across subspaces, cutting ADC error at ZERO query-time cost (the
    # LUT is built from rotated residuals; distances are preserved
    # because R is orthonormal).
    if rotate:
        R, _ = np.linalg.qr(rng.standard_normal((d, d)))
        resid = resid @ R
    else:
        R = None
    books = np.stack(
        [_kmeans_np(resid[:, m * ds : (m + 1) * ds], n_codes, 15, rng) for m in range(m_subvectors)]
    )  # (M, n_codes≤, ds)

    sc = candidates.sparkSession.sparkContext
    b_cent, b_books = sc.broadcast(cent), sc.broadcast(books)
    b_rot = sc.broadcast(R)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = b_books.value
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"neighbor_id": pd.Series([], dtype="int64"),
                                    "cell": pd.Series([], dtype="int32"),
                                    "codes": pd.Series([], dtype=object)})
                continue
            vecs = np.stack(pdf["__cv"].map(lambda v: np.asarray(v, np.float64)))
            res = vecs - b_cent.value[pdf["cell"].to_numpy()]
            if b_rot.value is not None:
                res = res @ b_rot.value
            codes = np.empty((len(pdf), B.shape[0]), dtype=np.int64)
            for m in range(B.shape[0]):
                sub = res[:, m * ds : (m + 1) * ds]
                dist = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ B[m].T) + (B[m] * B[m]).sum(1)[None, :]
                codes[:, m] = dist.argmin(1)
            yield pd.DataFrame({"neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                                "cell": pdf["cell"].to_numpy(np.int32),
                                "codes": list(codes)})

    coded = binned.mapInPandas(encode, schema="neighbor_id long, cell int, codes array<long>")

    cent_df = F.broadcast(
        queries.sparkSession.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(cent)], "cell int, __ctr array<double>"
        )
    )
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__cd").asc(), F.col("cell").asc())
    probes = (
        q.crossJoin(cent_df)
        .select("query_id", "__qv", "cell", V.l2_sq("__qv", "__ctr").alias("__cd"))
        .withColumn("__pr", F.row_number().over(w_probe))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "cell")
    )

    shortlist = k * refine_factor

    def score(key, pdf):
        B = b_books.value
        qv = np.asarray(pdf["__qv"].iloc[0], np.float64) - b_cent.value[key[1]]
        if b_rot.value is not None:
            qv = qv @ b_rot.value
        lut = np.empty((B.shape[0], B.shape[1]))
        for m in range(B.shape[0]):
            diff = B[m] - qv[m * ds : (m + 1) * ds][None, :]
            lut[m] = (diff * diff).sum(1)
        codes = np.stack(pdf["codes"].map(np.asarray))
        dist = lut[np.arange(B.shape[0])[None, :], codes].sum(1)
        out = pd.DataFrame({"query_id": pdf["query_id"], "neighbor_id": pdf["neighbor_id"], "dist": dist})
        # per-group partial shortlist bounds the shuffle into the window
        return out.nsmallest(shortlist, ["dist", "neighbor_id"])

    scored = (
        probes.join(coded, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "cell")
        .applyInPandas(score, schema="query_id long, neighbor_id long, dist double")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    short = (
        scored.withColumn("__pq_rank", F.row_number().over(w))
        .filter(F.col("__pq_rank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the shortlist only: original vectors are gathered
    # for k·refine_factor rows per query, never for whole cells
    exact = (
        short.join(q, "query_id")
        .join(binned.select("neighbor_id", "__cv"), "neighbor_id")
        .select("query_id", "neighbor_id", V.l2_sq("__qv", "__cv").alias("dist"))
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_quadratic: bool = False,
) -> DataFrame:
    """All pairs (a < b) with cosine similarity ≥ threshold — the exact
    embedding near-dup primitive (small/medium n; the LSH variants above
    are the scale path). Inputs above ``QUADRATIC_ROW_LIMIT`` rows raise
    unless ``allow_quadratic=True``."""
    from transe_pyspark_spark.operators._guards import require_bounded_input

    require_bounded_input(df, allow_quadratic, "cosine_pairs")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", V.cosine(F.col("__va"), F.col("__vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def ivf_build(
    candidates: DataFrame,
    index_path: str,
    n_cells: int = 16,
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Build an IVF index ONCE and persist it — the build-once /
    probe-many shape every production ANN deployment uses (``ann_ivf``
    re-trains per call, which is right for exploration and wrong for a
    serving corpus).

    Writes two tables under ``index_path``: ``centroids`` (n_cells
    rows — bytes) and ``postings`` — (id, vec, cell) PARTITIONED BY
    cell, so a probe of p cells reads exactly p directories and the
    scan's PartitionFilters prune the rest unread (asserted in
    ``test_ivf_persisted``). At 100 TB the postings rewrite is the
    one-time cost; every query after pays only n_probe/n_cells of the
    corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c)
    model.transform(c).select("neighbor_id", "vec", "cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{index_path}/postings")
    spark = candidates.sparkSession
    cents = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    spark.createDataFrame(cents, "cell int, ctr array<double>").write.mode(
        "overwrite"
    ).parquet(f"{index_path}/centroids")


def ivf_query(
    spark,
    queries: DataFrame,
    index_path: str,
    k: int,
    n_probe: int = 4,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index (see ``ivf_build``): queries rank
    the (broadcast, KB-sized) centroid table, keep their ``n_probe``
    nearest cells, and join ONLY those cells' postings — the cell
    equi-join hits the partition column, so Catalyst prunes unprobed
    cell directories at the scan (DynamicPruning / PartitionFilters).
    Same scoring and tie-break as ``ann_ivf``: given the same seed and
    data, results are identical — the index is a layout, not a
    different algorithm."""
    cent_df = F.broadcast(spark.read.parquet(f"{index_path}/centroids"))
    postings = spark.read.parquet(f"{index_path}/postings")
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__cd").asc(), F.col("cell").asc())
    probes = (
        q.crossJoin(cent_df)
        .select("query_id", "__qv", "cell", V.l2_sq("__qv", "ctr").alias("__cd"))
        .withColumn("__pr", F.row_number().over(w_probe))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "cell")
    )
    scored = (
        probes.join(postings, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", V.l2_sq("__qv", "vec").alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def semantic_near_pairs(
    df: DataFrame,
    threshold: float,
    n_cells: int = 8,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    eager_cleanup: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pair discovery (r09 —
    the embedding-level dedup modality next to the text-side exact /
    Jaccard / MinHash / SimHash family): KMeans coarse-quantizes the
    corpus into ``n_cells`` clusters and exact cosine runs ONLY inside
    a cluster — never corpus-all-pairs. Each vector is assigned to its
    ``n_assign`` nearest centroids (the IVF multi-probe idea applied
    to the index side), which repairs most boundary splits: a near
    pair is found iff the two vectors share at least one assigned
    cell, and measured recall on the fixture jumps from ~0.45
    (n_assign=1) to ~0.85 (n_assign=2) at threshold 0.4.

    Plan: one KMeans pass (model-sized centroid matrix on the
    driver, the IVF/PQ precedent); assignment is a NARROW Arrow
    kernel (mapInPandas, vectorized argpartition against the captured
    centroid matrix — no shuffle, no per-row Python); the pair join
    is a cell EQUI-join of the exploded assignments with ``id_a <
    id_b`` as residual; the multi-cell duplicate collapse is one
    (id_a, id_b) hash agg. At 100 TB, cell sizes bound the intra-cell
    quadratic exactly as cluster sizes bound SemDeDup. The exploded
    assignment is PINNED (repartition-on-cell + cache) before the
    self-join, so the Arrow assignment kernel runs ONCE over the
    corpus — not once per join side — and the cell equi-join reads
    two cell-aligned InMemoryTableScans (the repo's standing
    multi-consumer pattern; under AQE a bare cache would report
    UnknownPartitioning, the explicit repartition keeps the join
    co-partitioned).

    Returns (id_a, id_b, cos_sim round 6) with id_a < id_b, distinct.
    With the default ``eager_cleanup=True`` the pair set is
    materialized via ``localCheckpoint`` and the corpus-sized
    exploded-assignment pin is RELEASED before returning — callers
    looping ``semantic_dedup_keep`` no longer accumulate pinned
    caches (r10 advisory; the ``degree_assortativity`` idiom), and
    multi-consumer callers (components + recall census) read the
    checkpoint instead of re-running the join. ``eager_cleanup=False``
    keeps the lazy plan for the structural gate.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c)
    cent = np.array([list(ctr) for ctr in model.clusterCenters()], dtype=np.float64)
    take = min(n_assign, len(cent))
    b_cent = df.sparkSession.sparkContext.broadcast(cent)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cent.value
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"__id": pd.Series([], dtype="int64"),
                                    "__v": pd.Series([], dtype=object),
                                    "cell": pd.Series([], dtype="int32")})
                continue
            X = np.stack(pdf["__v"].map(lambda v: np.asarray(v, np.float64)))
            d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
            cells = np.argsort(d, axis=1)[:, :take]
            idx = np.repeat(np.arange(len(pdf)), take)
            yield pd.DataFrame({
                "__id": pdf["__id"].to_numpy(np.int64)[idx],
                "__v": pdf["__v"].to_numpy(object)[idx],
                "cell": cells.reshape(-1).astype(np.int32),
            })

    binned = (
        c.select("__id", "__v")
        .mapInPandas(
            assign,
            schema=f"__id long, __v {df.schema[vec_col].dataType.simpleString()}, cell int",
        )
        .repartition("cell")
        .cache()
    )
    a = binned.select("cell", F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    b = binned.select("cell", F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    out = (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", V.cosine(F.col("__va"), F.col("__vb")).alias("__cos"))
        .filter(F.col("__cos") >= threshold)
        # a pair sharing two cells scores twice with the same cosine —
        # collapse to one row per pair
        .groupBy("id_a", "id_b")
        .agg(F.round(F.max("__cos"), 6).alias("cos_sim"))
    )
    if not eager_cleanup:
        # lazy mode (plan gate): leaves the assignment pin in the
        # cache manager — library callers use the default
        return out
    out = out.localCheckpoint(eager=True)  # pair leaf — THEN release the pin
    binned.unpersist()
    return out


def semantic_dedup_keep(
    df: DataFrame,
    threshold: float,
    n_cells: int = 8,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Corpus-level semantic dedup verdicts: ``semantic_near_pairs``
    edges → connected components (Pregel min-label, the
    ``near_dedup_canonical`` machinery) → keep the min-id vector per
    component; vectors in no near pair keep themselves. Returns
    (id_col, keep: boolean) — one row per input vector."""
    from transe_pyspark_spark.operators.dedup import connected_components

    pairs = semantic_near_pairs(
        df, threshold, n_cells=n_cells, n_assign=n_assign,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    comps = connected_components(pairs, id_a="id_a", id_b="id_b")
    canonical = comps.groupBy("component").agg(F.min("id").alias("__keep_id"))
    keep_map = comps.join(canonical, "component").select(
        F.col("id").alias(id_col), (F.col("id") == F.col("__keep_id")).alias("keep")
    )
    return (
        df.select(id_col)
        .join(keep_map, id_col, "left")
        .select(id_col, F.coalesce("keep", F.lit(True)).alias("keep"))
    )


def hybrid_rrf_fuse(
    text_ranked: DataFrame,
    vector_ranked: DataFrame,
    k: int = 10,
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of two
    ranked retrieval lists — the standard hybrid-search combiner for
    "BM25 ∪ embedding" retrieval, where the lexical and semantic lists
    disagree and rank (not score) is the only comparable unit.

    Both inputs carry (query_id, doc_id, rank); the fused score is
        rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d)),
    computed here in EXACT integer nano-units — a literal BIGINT
    ``div`` expression, ``1_000_000_000L div (k_rrf + rank)`` —
    because ranks are small integers, so the fusion needs no float at
    all and the result hash-checks bit-for-bit on any engine (the
    repo's nano-quantization idiom, minus the quantization error:
    integral `div` is exact by construction, not merely
    exact-for-realistic-ranks the way floor(double/double) would be;
    r11 advisory). ``doc_id`` passes through UNTOUCHED — both lists
    must carry the same equality-comparable doc_id type (the repo's
    faces use BIGINT ids); no silent cast that could null non-numeric
    ids onto a collapsed join key.

    Plan shape: the two lists are OUTPUT-sized (≤ |queries|·k rows by
    their own contracts — `bm25_topk` WindowGroupLimit, `knn_*` top-k),
    so the full-outer join on (query_id, doc_id) and the per-query rank
    window both run on list-sized data; nothing corpus-sized enters
    this operator. Missing-from-one-list docs contribute 0 from that
    list (the RRF convention). Final order: rrf_nano DESC with doc_id
    tiebreak — deterministic ranks by construction.

    Returns (query_id, rank, doc_id, rrf_nano, in_text, in_vector),
    rank 1..k per query.
    """
    t = text_ranked.select(
        "query_id",
        "doc_id",
        F.col("rank").cast("long").alias("__rt"),
    )
    v = vector_ranked.select(
        "query_id",
        "doc_id",
        F.col("rank").cast("long").alias("__rv"),
    )
    # BIGINT integral division — exact by construction (SQL `div`),
    # never floor(double/double)
    leg = "1000000000L div ({k} + __r{leg})".format
    fused = (
        t.join(v, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf_nano",
            F.coalesce(F.expr(leg(k=int(k_rrf), leg="t")).cast("long"), F.lit(0))
            + F.coalesce(F.expr(leg(k=int(k_rrf), leg="v")).cast("long"), F.lit(0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_nano").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "rank",
            "doc_id",
            "rrf_nano",
            F.col("__rt").isNotNull().alias("in_text"),
            F.col("__rv").isNotNull().alias("in_vector"),
        )
    )
