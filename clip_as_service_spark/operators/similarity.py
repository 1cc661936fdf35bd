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


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """embedding near-dup pairs (id_a < id_b, cosine ≥ threshold), candidates
    bounded to same-LSH-bucket pairs (at 10^12 rows the full cross join does
    not exist; neighboring-bucket probing widens recall if needed)."""
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
