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
    planes_bits = n_bits * n_tables
    tables_d = [
        F.struct(
            F.lit(t).alias("tbl"),
            _table_bucket(
                F.col(vec_col), dim, n_bits, t, planes_bits, seed, sign_round_dp
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    data = embeddings.select(
        id_col, vec_col, F.explode(F.array(*tables_d)).alias("tb")
    ).select(
        id_col, vec_col,
        F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"),
    )
    probes_q = []
    for t in range(n_tables):
        b0 = _table_bucket(
            F.col(q_vec_col), dim, n_bits, t, planes_bits, seed, sign_round_dp
        )
        probes_q.append(F.struct(F.lit(t).alias("tbl"), b0.alias("bucket")))
        if multi_probe:
            probes_q += [
                F.struct(
                    F.lit(t).alias("tbl"),
                    b0.bitwiseXOR(F.lit(1 << j)).alias("bucket"),
                )
                for j in range(n_bits)
            ]
    q = queries.select(
        q_id_col, q_vec_col, F.explode(F.array(*probes_q)).alias("tb")
    ).select(
        q_id_col, q_vec_col,
        F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"),
    )
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
    the single-table layout (oracle SQL stays valid)."""
    planes = rh_planes(dim, planes_bits, seed)
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
    planes_bits = n_bits * n_tables
    tables_d = [
        F.struct(
            F.lit(t).alias("tbl"),
            _table_bucket(
                F.col(vec_col), dim, n_bits, t, planes_bits, seed, sign_round_dp
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    d = embeddings.select(
        id_col, F.explode(F.array(*tables_d)).alias("tb")
    ).select(
        id_col,
        F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"),
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
    cell_id. Each iteration is ONE broadcast-join + map-side-combinable
    argmin pass over the corpus (see _nearest_cells) and ONE component
    aggregate — per-iteration shuffle is N assignment rows + k·dim
    component rows, never N×C. Centroids live driver-side between
    iterations (k·dim doubles — KBs to MBs; that smallness is what makes a
    coarse quantizer coarse). Empty cells keep their previous centroid.

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
        (int(i), [float(x) for x in v])
        for i, (v,) in enumerate(
            embeddings.orderBy(id_col).select(vec_col).limit(k).collect()
        )
    ]
    if sample is not None:
        embeddings = embeddings.sample(False, sample, seed=7)
    cents = spark.createDataFrame(init, "cell_id long, centroid array<double>")
    for _ in range(n_iter):
        assign = _nearest_cells(
            embeddings.select(id_col, vec_col), cents, 1,
            id_col, vec_col, "cell_id", "centroid", "_r",
        )
        comp = assign.select(
            "cell_id", F.posexplode(vec_col).alias("i", "v")
        ).groupBy("cell_id", "i").agg(
            F.avg(F.col("v").cast("double")).alias("c")
        )
        new_rows = {
            int(r["cell_id"]): r["arr"]
            for r in comp.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("s"))
            .select(
                "cell_id", F.transform("s", lambda x: x["c"]).alias("arr")
            )
            .collect()
        }
        init = [
            (cid, [float(x) for x in new_rows.get(cid, old)])
            for cid, old in init
        ]
        cents = spark.createDataFrame(
            init, "cell_id long, centroid array<double>"
        )
    return cents


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

    n_nearest == 1 (the DATA side — every vector in the corpus) uses a
    map-side-combinable min_by aggregate: the N×C comparison rows collapse
    to one row per vector BEFORE the exchange, so only N rows shuffle. A
    window/rank here would shuffle all N×C rows — a 10^5× amplification at
    10^12 vectors with a 10^5-cell quantizer. The compare work itself is
    N×C either way (that IS IVF assignment); the shuffle must not be.
    n_nearest > 1 (the QUERY side — Q·nprobe rows, tiny) keeps the window."""
    joined = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "_ccos", F.round(cosine_col(F.col(vec_col), F.col(c_vec_col)), 9)
    )
    if n_nearest == 1:
        order = F.struct(
            (-F.col("_ccos")).alias("nc"), F.col(c_id_col).alias("cid")
        )
        carried = [c for c in vecs.columns if c != id_col]
        return joined.groupBy(id_col).agg(
            F.min_by(c_id_col, order).alias(c_id_col),
            *[F.first(c).alias(c) for c in carried],
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
