"""Product quantization (PQ) — compact approximate vector codes for the
ANN index payload.

The public technique (Jégou, Douze, Schmid 2011; the FAISS IVF-PQ design;
the reference's AnnLite also names PQ as its compression option,
docs/user-guides/retriever.md): split each dim-D vector into ``m``
subvectors, k-means each subspace to ``n_codes`` centroids, store only the
m one-byte codes per vector. A query then scores candidates with
ASYMMETRIC DISTANCE COMPUTATION (ADC): one m×n_codes lookup table of
partial dot products per query, so scoring a candidate is m table adds —
no vector fetch at all. Exact re-rank fetches true vectors only for the
per-query survivors.

Cosine under ADC, with v̂ the PQ reconstruction of v:

    dot(q, v̂)  = Σ_s  q_s · cb[s, code_s]          (lut column ``pdot``)
    ‖v̂‖²       = Σ_s  ‖cb[s, code_s]‖²             (lut column ``pn2``)
    approx_cos = dot / (‖q‖ · sqrt(‖v̂‖²))

Scale shape: training is the IVF k-means pattern per subspace — the N×m×
n_codes compare rows are generated map-side against a BROADCAST codebook
and collapse to N×m assignment rows via a combinable min_by before any
exchange (never shuffled at compare cardinality). Encoding is the same
single pass. Codebooks are m·n_codes·(D/m) doubles — KBs; always broadcast,
persisted beside the index. All expressions are JVM built-ins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CODEBOOK_SCHEMA = "subspace int, code int, centroid array<double>"


def _sub_slices(vec_col, dim: int, m: int) -> list:
    """m struct(subspace, subvec) expressions slicing a vector column."""
    dsub = dim // m
    return [
        F.struct(
            F.lit(s).alias("subspace"),
            F.slice(vec_col, s * dsub + 1, dsub).alias("subvec"),
        )
        for s in range(m)
    ]


def _l2sq(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _validate(dim: int, m: int, n_codes: int) -> None:
    if m <= 0 or dim % m != 0:
        raise ValueError(f"pq: dim={dim} must be divisible by m={m}")
    if not 1 <= n_codes <= 32767:
        raise ValueError("pq: n_codes must fit a smallint code")


def _assign(sub: DataFrame, codebooks: DataFrame, id_col: str) -> DataFrame:
    """(id, subspace, subvec) × broadcast codebooks → (id, subspace, code,
    subvec): nearest centroid per subspace by squared L2, ties to the
    lowest code — a combinable min_by, so only the assignment rows ever
    shuffle (the compare rows exist map-side only)."""
    joined = sub.join(F.broadcast(codebooks), "subspace").withColumn(
        "_d", _l2sq(F.col("subvec"), F.col("centroid"))
    )
    order = F.struct(F.col("_d").alias("d"), F.col("code").alias("c"))
    return joined.groupBy(id_col, "subspace").agg(
        F.min_by("code", order).alias("code"),
        F.first("subvec").alias("subvec"),
    )


def train_pq_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 256,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: float | None = None,
) -> DataFrame:
    """Train per-subspace codebooks → (subspace, code, centroid).

    Deterministic like kmeans_centroids: init = the n_codes lowest-id
    vectors' subvectors (fewer vectors than codes → fewer codes; PQ still
    works, codes just don't reach n_codes), assignment ties break to the
    lowest code, empty codes keep their previous centroid. ``sample``
    trains on a seeded fraction — PQ needs ~1k training points per code,
    not the corpus. Init is taken from the UNSAMPLED corpus: a sample that
    happens to come back empty must not silently produce empty codebooks
    (pq_encode's inner join would then drop every corpus row into an
    empty-but-'successful' index); with init from the corpus head, an
    empty sample degrades to init-only codebooks, never to data loss."""
    _validate(dim, m, n_codes)
    spark = embeddings.sparkSession
    init_rows = (
        embeddings.orderBy(id_col).select(vec_col).limit(n_codes).collect()
    )
    if sample is not None:
        embeddings = embeddings.sample(False, sample, seed=11)
    if not init_rows:
        return spark.createDataFrame([], CODEBOOK_SCHEMA)
    dsub = dim // m
    cb = [
        (s, c, [float(x) for x in row[0][s * dsub : (s + 1) * dsub]])
        for s in range(m)
        for c, row in enumerate(init_rows)
    ]
    sub = embeddings.select(
        id_col, F.explode(F.array(*_sub_slices(F.col(vec_col), dim, m))).alias("t")
    ).select(id_col, "t.subspace", "t.subvec")
    for _ in range(n_iter):
        cb_df = spark.createDataFrame(cb, CODEBOOK_SCHEMA)
        assign = _assign(sub, cb_df, id_col)
        comp = (
            assign.select(
                "subspace", "code", F.posexplode("subvec").alias("i", "v")
            )
            .groupBy("subspace", "code", "i")
            .agg(F.avg("v").alias("c"))
        )
        new = {
            (int(r["subspace"]), int(r["code"])): r["arr"]
            for r in comp.groupBy("subspace", "code")
            .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("s"))
            .select(
                "subspace", "code",
                F.transform("s", lambda x: x["c"]).alias("arr"),
            )
            .collect()
        }
        cb = [
            (s, c, [float(x) for x in new.get((s, c), old)]) for s, c, old in cb
        ]
    return spark.createDataFrame(cb, CODEBOOK_SCHEMA)


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_col, pq_code: array<smallint>) under the GIVEN (stored)
    codebooks — shared by build and append, like the IVF quantizer."""
    sub = embeddings.select(
        id_col, F.explode(F.array(*_sub_slices(F.col(vec_col), dim, m))).alias("t")
    ).select(id_col, "t.subspace", "t.subvec")
    assign = _assign(sub, codebooks, id_col)
    return (
        assign.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))).alias("s")
        )
        .select(
            id_col,
            F.transform("s", lambda x: x["code"].cast("smallint")).alias(
                "pq_code"
            ),
        )
    )


def pq_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    q_id_col: str = "query_id",
    q_vec_col: str = "qvec",
) -> DataFrame:
    """ADC lookup table → (query_id, subspace, code, pdot, pn2):
    Q × m × n_codes rows (KBs per query — always broadcast into the
    candidate scoring join)."""
    qsub = queries.select(
        q_id_col,
        F.explode(F.array(*_sub_slices(F.col(q_vec_col), dim, m))).alias("t"),
    ).select(q_id_col, "t.subspace", F.col("t.subvec").alias("qsub"))
    return qsub.join(F.broadcast(codebooks), "subspace").select(
        q_id_col,
        "subspace",
        "code",
        _dot(F.col("qsub"), F.col("centroid")).alias("pdot"),
        _dot(F.col("centroid"), F.col("centroid")).alias("pn2"),
    )


def pq_score(
    candidates: DataFrame,
    lut: DataFrame,
    q_norms: DataFrame,
    q_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, pq_code) × broadcast lut → (query_id, vec_id,
    approx_cos). Scoring a candidate is m lookup adds (the ADC promise);
    the groupBy collapses map-side. Zero-norm reconstructions rank last
    (-inf) — the exact re-rank never sees them unless nothing else
    survived."""
    exploded = candidates.select(
        q_id_col, "vec_id", F.posexplode("pq_code").alias("subspace", "code")
    ).withColumn("code", F.col("code").cast("int"))
    agg = (
        exploded.join(F.broadcast(lut), [q_id_col, "subspace", "code"])
        .groupBy(q_id_col, "vec_id")
        .agg(F.sum("pdot").alias("_dot"), F.sum("pn2").alias("_n2"))
    )
    return agg.join(F.broadcast(q_norms), q_id_col).select(
        q_id_col,
        "vec_id",
        F.when(
            (F.col("_n2") > 0) & (F.col("_qnorm") > 0),
            F.col("_dot") / (F.col("_qnorm") * F.sqrt(F.col("_n2"))),
        )
        .otherwise(F.lit(float("-inf")))
        .alias("approx_cos"),
    )
