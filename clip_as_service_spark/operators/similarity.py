"""Similarity search over an embedding column (array<float>) — the engine's
analog of the reference's cosine top-k retrieval (`/search` with AnnLite,
docs/user-guides/retriever.md:117-152; cosine scoring executors/helper.py:95-97).

- ``cosine_topk``      — exact brute-force: broadcast the query set, cosine
                         via zip_with/aggregate (JVM-side, codegen), window
                         top-k. The correctness baseline; O(N·Q·D).
- ``bucketed_topk``    — sign-LSH on the first ``n_bits`` dimensions
                         (axis-aligned hyperplanes): candidates share the
                         query's bucket; exact cosine within bucket. The
                         scale path: the bucket key is a partition-prunable
                         join key at 10^12 rows. Axis-aligned planes keep it
                         SQL-expressible (cross-engine oracle) — random
                         hyperplanes drop in by replacing `bucket_col`.
- ``cosine_pairs``     — all pairs above a cosine threshold (embedding
                         near-dup dedup), candidate-bounded by the same LSH
                         buckets.

All math in float64, summed in index order (deterministic)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def bucket_col(vec, n_bits: int = 8) -> F.Column:
    """sign-LSH bucket: bit j = 1 iff vec[j] >= 0 (axis-aligned planes)."""
    bits = [
        F.when(F.element_at(vec, j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def rh_planes(dim: int, n_bits: int = 16, seed: int = 42) -> "np.ndarray":
    """The deterministic hyperplane matrix (n_bits × dim) — exposed so SQL
    oracles can embed the identical literals."""
    return np.random.default_rng(seed).standard_normal((n_bits, dim))


def rh_bucket_col(
    vec,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    sign_round_dp: int | None = None,
) -> F.Column:
    """sign-LSH bucket from RANDOM hyperplanes: bit j = 1 iff vec·r_j ≥ 0,
    r_j ~ N(0,I) seeded — deterministic, identical on every executor.

    Unlike the axis-aligned variant (bucket_col), random planes split the
    space isotropically, so 2^n_bits buckets stay near-uniformly occupied on
    real (anisotropic) embedding distributions — axis planes collapse to a
    few hot buckets when early dimensions are correlated. The planes fold
    into the plan as float literals (n_bits·dim doubles ≈ KBs): JVM-side
    codegen, no Python, no broadcast variable to manage.

    sign_round_dp: round the dot product before taking its sign — used by
    cross-engine oracle queries so a last-ulp summation-order difference
    between engines cannot flip a boundary sign (engine-internal use leaves
    it None: raw sign)."""
    planes = rh_planes(dim, n_bits, seed)
    out = None
    for j in range(n_bits):
        r = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = _dot(vec, r)
        if sign_round_dp is not None:
            dot = F.round(dot, sign_round_dp)
        bit = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def rh_buckets_udf(
    dim: int,
    n_bits: int,
    n_tables: int,
    seed: int = 42,
    sign_round_dp: int | None = None,
):
    """Vectorized L-table bucket computation: a pandas UDF that maps an
    embedding column to array<int> of the n_tables bucket ids — ONE numpy
    matmul per Arrow batch against the shared (n_tables·n_bits × dim) plane
    matrix (guide §4.2: hand whole batches to native code). Replaces the
    per-bit aggregate/zip_with expression trees, whose construction alone
    cost n_tables·n_bits·dim py4j literal calls (~seconds) and whose
    evaluation is CodegenFallback, interpreted per element.

    Same numpy dot AnnReader._query_buckets uses driver-side, so stored and
    probe buckets agree by construction; sign_round_dp uses the shared
    HALF_UP kernel for cross-engine boundary pinning."""
    from pyspark.sql.functions import pandas_udf

    planes_t = rh_planes(dim, n_bits * n_tables, seed).T  # (dim, B)
    shifts = np.arange(n_bits, dtype=np.int64)

    @pandas_udf("array<int>")
    def _buckets(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        V = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        D = V @ planes_t  # (n, B)
        if sign_round_dp is not None:
            D = _round_half_up_np(D, sign_round_dp)
        bits = (D >= 0).astype(np.int64)
        out = np.empty((len(V), n_tables), dtype=np.int32)
        for t in range(n_tables):
            out[:, t] = (
                bits[:, t * n_bits : (t + 1) * n_bits] << shifts
            ).sum(axis=1)
        return pd.Series(list(out))

    return _buckets


def _rh_table_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_bits: int,
    n_tables: int,
    seed: int,
    sign_round_dp: int | None,
    keep_cols: list,
) -> DataFrame:
    """df + (tbl, bucket) rows — one row per (input row, LSH table), buckets
    from the vectorized UDF (posexplode index = table id)."""
    b = rh_buckets_udf(dim, n_bits, n_tables, seed, sign_round_dp)
    return df.select(
        *keep_cols, F.posexplode(b(F.col(vec_col))).alias("tbl", "bucket")
    )


def rh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 16,
    dim: int = 64,
    multi_probe: bool = True,
    n_tables: int = 1,
    seed: int = 42,
    sign_round_dp: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "qvec",
) -> DataFrame:
    """approximate top-k via random-hyperplane LSH: L independent tables,
    each with 1-bit-flip multi-probe; exact cosine over the candidate union.

    Data side: one bucket per (vector, table) — n_tables rows per vector,
    the standard L-table LSH storage trade (at scale: L partition-prunable
    index copies, each keyed by its own 2^n_bits near-uniform buckets; vs
    the axis-aligned variant whose correlated early dims collapse to a few
    hot buckets). Query side probes each table's own bucket plus every
    1-bit-flip neighbor — L·(n_bits+1) probes. Recall stacks as
    1−(1−p)^L·(probe gain); candidates dedupe on (query, vec) before the
    exact-cosine re-rank, so more tables cost candidates, never correctness
    of what's returned."""
    data = _rh_table_buckets(
        embeddings, vec_col, dim, n_bits, n_tables, seed, sign_round_dp,
        keep_cols=[id_col, vec_col],
    )
    q0 = _rh_table_buckets(
        queries, q_vec_col, dim, n_bits, n_tables, seed, sign_round_dp,
        keep_cols=[q_id_col, q_vec_col],
    )
    if multi_probe:
        # the table's own bucket plus every 1-bit-flip neighbor (JVM XOR on
        # the already-computed bucket column — no re-hash)
        flips = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j))
                for j in range(n_bits)
            ],
        )
        q = q0.select(
            q_id_col, q_vec_col, "tbl", F.explode(flips).alias("bucket")
        )
    else:
        q = q0
    joined = data.join(F.broadcast(q), ["tbl", "bucket"])
    cand = joined.dropDuplicates([q_id_col, id_col])
    scored = cand.select(
        F.col(q_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


def _table_bucket(
    vec, dim: int, n_bits: int, table: int, planes_bits: int, seed: int,
    sign_round_dp: int | None,
) -> F.Column:
    """Bucket for one LSH table: planes are the table's n_bits-slice of the
    shared (planes_bits × dim) matrix, so table 0 with n_tables=1 reproduces
    the single-table layout (oracle SQL stays valid).

    Bulk call sites use rh_buckets_udf instead (one Arrow matmul per batch);
    this expression form remains for single-table / oracle-twin use."""
    planes = rh_planes(dim, planes_bits, seed)
    if isinstance(vec, str):
        vec = F.col(vec)
    out = None
    for j in range(n_bits):
        r = F.array(*[F.lit(float(x)) for x in planes[table * n_bits + j]])
        dot = _dot(vec, r)
        if sign_round_dp is not None:
            dot = F.round(dot, sign_round_dp)
        bit = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "qvec",
) -> DataFrame:
    """exact top-k by cosine per query → (query_id, rank, vec_id, cosine)."""
    joined = embeddings.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


def bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "qvec",
) -> DataFrame:
    """approximate top-k: exact cosine within the query's LSH bucket.

    Join is an equi-join on bucket — broadcastable query side, prunable data
    side (bucket becomes a partition column of the vector table at scale)."""
    data = embeddings.withColumn("bucket", bucket_col(F.col(vec_col), n_bits))
    q = queries.withColumn("bucket", bucket_col(F.col(q_vec_col), n_bits))
    joined = data.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(q_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


def auto_n_bits(n_vectors: int, target_bucket: int = 256) -> int:
    """The sizing rule for RH-LSH pair candidates: within-bucket pair work
    is ~(N/2^n_bits)²·2^n_bits per table, so buckets must stay
    ~target_bucket-sized as N grows → n_bits ≈ log2(N / target_bucket),
    clamped to [1, 30] (e.g. N=10^9 with 1k-row buckets → 20 bits). Spend
    tables (L) to buy recall back at higher n_bits."""
    import math

    if n_vectors <= 0:
        return 1
    return max(1, min(30, math.ceil(math.log2(max(n_vectors / target_bucket, 2)))))


def rh_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_bits: int | None = None,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    sign_round_dp: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 256,
    chosen_out: dict | None = None,
) -> DataFrame:
    """embedding near-dup pairs (id_a < id_b, cosine ≥ threshold) with
    RANDOM-HYPERPLANE LSH candidates — the scale path for `cosine_pairs`.

    L independent tables of n_bits each (same shared plane matrix slicing as
    rh_bucketed_topk, so table 0 reproduces the single-table layout): two
    vectors are candidates iff they share a bucket in ≥1 table; candidates
    dedupe on (id_a, id_b) before the exact-cosine verify. Random planes keep
    the 2^n_bits buckets near-uniform on anisotropic embeddings — the
    axis-aligned variant (cosine_pairs) collapses to hot buckets with
    ~quadratic within-bucket pair counts when early dims are correlated (its
    measured pair coverage is reported next to this one in BENCH). Pair
    recall per true pair at cosine c: 1 − (1 − p^n_bits)^L, p = 1 − θ/π.

    Sizing at scale: within-bucket pair count ~ (N/2^n_bits)²·2^n_bits per
    table, so n_bits must GROW with the corpus. n_bits=None (the default)
    APPLIES that rule: one count job sizes n_bits = auto_n_bits(N,
    target_bucket) — a build-time dedup operator amortizes the extra scan;
    pass an explicit n_bits to skip it (cross-engine oracles do, for a
    deterministic plan). ``chosen_out`` (dict) receives {"n_bits", "n"} so
    callers can log/pin the choice."""
    if n_bits is None:
        n = embeddings.count()
        n_bits = auto_n_bits(n, target_bucket)
        if chosen_out is not None:
            chosen_out.update({"n_bits": n_bits, "n": n})
    elif chosen_out is not None:
        chosen_out.update({"n_bits": n_bits, "n": None})
    d = _rh_table_buckets(
        embeddings, vec_col, dim, n_bits, n_tables, seed, sign_round_dp,
        keep_cols=[id_col],
    )
    a = d.alias("a")
    b = d.alias("b")
    # dedupe BARE id pairs first, then join the vectors back once — a pair
    # colliding in all L tables would otherwise shuffle L copies of both
    # full vectors through the dropDuplicates exchange just to keep one
    cand_ids = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        cand_ids.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            cosine_col(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "qvec",
    c_id_col: str = "cell_id",
    c_vec_col: str = "centroid",
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest coarse
    centroid by cosine; a query probes its ``nprobe`` nearest cells and
    re-ranks exactly within them — the list-based counterpart to the LSH
    paths (the reference's AnnLite retriever is IVF-PQ-shaped the same way,
    docs/user-guides/retriever.md:117-152).

    ``centroids`` is a (cell_id, centroid:array) table — the coarse
    quantizer. Train it however you like (label_centroids is the fixture's
    deterministic choice; k-means at scale); this operator only requires it
    to be small enough to broadcast, which is the defining property of a
    coarse quantizer (≤ ~10⁵ cells at 10^12 vectors).

    Scale shape: data-side assignment is a broadcast join + per-cell argmin
    window (one pass, no shuffle of the vector table beyond the window's
    hash partition on vec_id — and at rest the assignment is precomputed
    once and stored as a partition column, turning every probe into
    partition pruning). Query-side probes are Q·nprobe rows, broadcast."""
    # data-side: nearest cell per vector (argmin over the broadcast quantizer)
    d_assign = _nearest_cells(
        embeddings, centroids, 1, id_col, vec_col, c_id_col, c_vec_col, "vec_rank"
    )
    # query-side: nprobe nearest cells per query
    q_assign = _nearest_cells(
        queries, centroids, nprobe, q_id_col, q_vec_col, c_id_col, c_vec_col,
        "probe_rank",
    )
    joined = d_assign.join(F.broadcast(q_assign), c_id_col)
    scored = joined.select(
        F.col(q_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


def _lloyd_train_arrow(
    train: DataFrame,
    vec_col: str,
    dim: int,
    cb0: "np.ndarray",
    metric: str,
    n_iter: int,
    round_dp: int = 9,
) -> "np.ndarray":
    """THE Lloyd's-iteration kernel, shared by the IVF coarse quantizer
    (m=1, rounded-cosine assignment) and the PQ codebooks (m subspaces,
    L2 assignment) — one implementation so the two trainers cannot drift
    numerically (VERDICT r05 #6).

    ``cb0``: (m, k, dsub) float64 initial codebook, m·dsub == dim. Per
    iteration, ONE zero-shuffle Arrow pass over the vector column: each
    batch is assigned with a BLAS matmul and collapsed to per-(subspace,
    code) partial sums BEFORE anything leaves the worker — the rows that
    travel are (#batches × m × codes-present), never N. The driver
    finishes the average in a FIXED order (sorted by (sub, code,
    partition, batch)), so training is bit-deterministic for a given
    input partitioning — no dependence on task completion order. Empty
    clusters keep their previous centroid."""
    import pyarrow as pa

    spark = train.sparkSession
    m, k, dsub = cb0.shape
    if m * dsub != dim:
        raise ValueError(f"codebook shape {cb0.shape} does not tile dim={dim}")
    vec_only = train.select(vec_col)
    out_schema = (
        "pid long, bid long, sub int, code long, n long, psum array<double>"
    )
    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast(cb0)

        def fn(batches, _bc=bc):
            from pyspark import TaskContext

            cb = _bc.value
            m_, k_, dsub_ = cb.shape
            pid = TaskContext.get().partitionId()
            for bid, b in enumerate(batches):
                V = _batch_vectors_np(b.column(0), dim)
                if V.shape[0] == 0:
                    continue
                pids, bids, subs, codes, ns, psums = [], [], [], [], [], []
                for s in range(m_):
                    Vs = V[:, s * dsub_ : (s + 1) * dsub_]
                    if metric == "cosine":
                        idx = _np_assign_cosine(
                            Vs, cb[s], np.linalg.norm(cb[s], axis=1), round_dp
                        )
                    else:
                        idx = _np_assign_l2(Vs, cb[s])
                    counts = np.bincount(idx, minlength=k_)
                    sums = np.zeros((k_, dsub_))
                    np.add.at(sums, idx, Vs)  # unbuffered: in-batch order
                    for c in np.nonzero(counts)[0]:
                        pids.append(pid)
                        bids.append(bid)
                        subs.append(s)
                        codes.append(int(c))
                        ns.append(int(counts[c]))
                        psums.append(sums[c])
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(pids, pa.int64()),
                        pa.array(bids, pa.int64()),
                        pa.array(subs, pa.int32()),
                        pa.array(codes, pa.int64()),
                        pa.array(ns, pa.int64()),
                        pa.array([list(p) for p in psums], pa.list_(pa.float64())),
                    ],
                    names=["pid", "bid", "sub", "code", "n", "psum"],
                )

        part = vec_only.mapInArrow(fn, out_schema).collect()
        part.sort(key=lambda r: (r["sub"], r["code"], r["pid"], r["bid"]))
        sums = np.zeros_like(cb0)
        counts = np.zeros((m, k))
        for r in part:
            sums[r["sub"], r["code"]] += np.asarray(r["psum"])
            counts[r["sub"], r["code"]] += r["n"]
        nxt = cb0.copy()
        mask = counts > 0
        nxt[mask] = sums[mask] / counts[mask][:, None]
        cb0 = nxt
    return cb0


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: float | None = None,
) -> DataFrame:
    """Train the IVF coarse quantizer: Lloyd's k-means with cosine
    assignment (the same metric ivf_topk probes with) → (cell_id, centroid).

    Deterministic throughout: init = the k lowest-id vectors (ids are
    content-derived or dense — either way stable); assignment ties break by
    cell_id. Each iteration is ONE zero-shuffle Arrow pass (the shared
    _lloyd_train_arrow kernel): every batch is BLAS-assigned against the
    broadcast quantizer and collapsed to per-cell partial sums on the
    worker, so only (#batches × cells-present) rows ever travel — never N,
    never N×C. Centroids live driver-side between iterations (k·dim
    doubles — KBs to MBs; that smallness is what makes a coarse quantizer
    coarse). Empty cells keep their previous centroid.

    ``sample``: train on a seeded fraction of the corpus — the standard
    practice at scale (a coarse quantizer needs ~100-1000 training vectors
    PER CELL, not 10^12; full-corpus training shuffles N·dim component rows
    per iteration for no recall benefit). Assignment at query/index time
    still covers every vector (ivf_topk)."""
    spark = embeddings.sparkSession
    # dim + init come from the UNSAMPLED corpus (the mirror of the
    # train_pq_codebooks fix): a seeded sample that happens to come back
    # EMPTY must degrade to init-only centroids, never to an empty centroid
    # table — compact_ann_index(retrain=True) would otherwise swap
    # ivf_cells (the ONLY exact vector copy of id-only/PQ indexes) for an
    # empty assignment: permanent index data loss.
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return spark.createDataFrame([], "cell_id long, centroid array<double>")
    init = [
        [float(x) for x in v]
        for (v,) in embeddings.orderBy(id_col).select(vec_col).limit(k).collect()
    ]
    if not init:
        return spark.createDataFrame([], "cell_id long, centroid array<double>")
    if sample is not None:
        embeddings = embeddings.sample(False, sample, seed=7)
    dim = int(dim_row["d"])
    cb = _lloyd_train_arrow(
        embeddings, vec_col, dim,
        np.asarray(init, dtype=np.float64)[None, :, :], "cosine", n_iter,
    )
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cb[0])],
        "cell_id long, centroid array<double>",
    )


def _round_half_up_np(arr, dp: int):
    """Spark F.round's decimal HALF_UP (half away from zero) on an ndarray
    — numpy's np.round is half-to-even, which would resolve an exact-half
    value to the OTHER neighbor and diverge from the Catalyst paths."""
    scale = 10.0 ** dp
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def _batch_vectors_np(col, dim: int) -> "np.ndarray":
    """Arrow list<float/double> column → (n, dim) float64 with NO
    per-element Python objects (flatten respects list offsets)."""
    if col.null_count:
        raise ValueError(
            "embedding column contains nulls — vector rows must be dense"
        )
    flat = np.asarray(col.flatten(), dtype=np.float64)
    if flat.size != len(col) * dim:
        raise ValueError(
            f"embedding column is not uniformly {dim}-dimensional "
            f"({flat.size} components over {len(col)} rows)"
        )
    return flat.reshape(-1, dim)


def _np_assign_cosine(V, C, Cn, round_dp: int = 9) -> "np.ndarray":
    """Row-wise nearest centroid by ROUNDED cosine, replicating the
    Catalyst min_by ordering exactly: cosine rounded HALF_UP at round_dp,
    ties to the LOWEST centroid index (C rows must be id-sorted), NaN
    cosines (zero norms) lose to every real value — and an all-NaN row
    (zero vector) falls to index 0, the lowest id, exactly as min_by
    resolves an all-equal-NaN tie by the id tie-breaker."""
    dots = V @ C.T
    Vn = np.linalg.norm(V, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = dots / (Vn[:, None] * Cn[None, :])
    cos = _round_half_up_np(cos, round_dp)
    cos = np.where(np.isnan(cos), -np.inf, cos)
    return np.argmax(cos, axis=1)


def _np_assign_l2(V, C) -> "np.ndarray":
    """Row-wise nearest centroid by squared L2, ties to the lowest index
    (argmin-first over id-sorted rows). ‖v‖² is constant per row, so the
    argmin ranks by the expansion −2·v·c + ‖c‖² — one BLAS matmul."""
    score = -2.0 * (V @ C.T) + (C * C).sum(axis=1)[None, :]
    return np.argmin(score, axis=1)


def collect_centroid_matrix(
    centroids: DataFrame, c_id_col: str = "cell_id", c_vec_col: str = "centroid"
):
    """(cell_id-sorted ids int64, (k, dim) float64) from a quantizer table
    — k·dim doubles, KBs-to-MBs by the definition of a COARSE quantizer."""
    rows = centroids.select(c_id_col, c_vec_col).collect()
    rows.sort(key=lambda r: int(r[0]))
    ids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    mat = np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    return ids, mat


def assign_nearest_cell(
    vecs: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    c_id_col: str = "cell_id",
    c_vec_col: str = "centroid",
    round_dp: int = 9,
) -> DataFrame:
    """Append every row's nearest-centroid id — the IVF assignment — as a
    ZERO-SHUFFLE Arrow map: the quantizer (k·dim doubles) is broadcast,
    each Arrow batch of vectors is scored against it with ONE BLAS matmul
    (`V @ C.T`), and the batch passes through with a cell_id column
    appended. Nothing shuffles, no compare rows ever exist even map-side —
    vs the previous min_by formulation whose per-element Catalyst lambda
    math was the build wall at auto-sized k (N×√N fold-multiplies;
    VERDICT r05 #1; the reference delegates exactly this kernel to C++,
    SURVEY §2 preamble).

    Tie/NaN semantics replicate the retired min_by plan bit-for-bit (see
    _np_assign_cosine); the 9-dp HALF_UP rounding keeps this path, the
    stored probes, AnnReader, and the SQL oracles agreeing on assignments.
    Every input column rides the Arrow batch through unchanged."""
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    spark = vecs.sparkSession
    cids, C = collect_centroid_matrix(centroids, c_id_col, c_vec_col)
    if len(cids) == 0:
        # no centroids (empty-corpus training) → no assignable rows, the
        # same result the retired crossJoin-against-empty plan produced
        return vecs.filter(F.lit(False)).withColumn(
            c_id_col, F.lit(None).cast("long")
        )
    dim = C.shape[1]
    bc = spark.sparkContext.broadcast((cids, C))
    vidx = vecs.columns.index(vec_col)
    out_schema = StructType(
        vecs.schema.fields + [StructField(c_id_col, LongType(), False)]
    )

    def fn(batches):
        cids_, C_ = bc.value
        Cn = np.linalg.norm(C_, axis=1)
        for b in batches:
            V = _batch_vectors_np(b.column(vidx), dim)
            idx = _np_assign_cosine(V, C_, Cn, round_dp)
            yield b.append_column(
                c_id_col, pa.array(cids_[idx], type=pa.int64())
            )

    return vecs.mapInArrow(fn, out_schema)


def _nearest_cells(
    vecs: DataFrame,
    centroids: DataFrame,
    n_nearest: int,
    id_col: str,
    vec_col: str,
    c_id_col: str,
    c_vec_col: str,
    rank_col: str,
) -> DataFrame:
    """(… vec cols …, cell_id) for each vector's n_nearest centroids by
    cosine (ties broken by cell_id asc — deterministic cross-engine).

    n_nearest == 1 (the DATA side — every vector in the corpus) is the
    zero-shuffle BLAS map (assign_nearest_cell): broadcast quantizer, one
    matmul per Arrow batch, cell_id appended in place. n_nearest > 1 (the
    QUERY side — Q·nprobe rows, tiny) keeps the broadcast-crossJoin window
    — it is Q×C rows of JVM expression, not a corpus-sized job."""
    if n_nearest == 1:
        return assign_nearest_cell(
            vecs, centroids, vec_col, c_id_col, c_vec_col
        )
    joined = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "_ccos", F.round(cosine_col(F.col(vec_col), F.col(c_vec_col)), 9)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_ccos"), F.asc(c_id_col))
    return (
        joined.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n_nearest)
        .drop("_ccos", rank_col, c_vec_col)
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """embedding near-dup pairs (id_a < id_b, cosine ≥ threshold), candidates
    bounded to same-LSH-bucket pairs (at 10^12 rows the full cross join does
    not exist). AXIS-ALIGNED buckets — kept as the SQL-oracle variant;
    production near-dup at scale should use rh_cosine_pairs (isotropic
    buckets, measured ~10× higher pair coverage on this fixture)."""
    d = embeddings.withColumn("bucket", bucket_col(F.col(vec_col), n_bits))
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
