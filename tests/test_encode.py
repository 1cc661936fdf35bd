"""Feature-hashing encode verb: deterministic embeddings, zero-vector edge
cases, and the reference's encode → index → search flow end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clip_as_service_spark.operators import ann_index, encode

DIM = 32


def test_hash_embed_deterministic_and_tf_weighted(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha beta alpha"), (3, "gamma")],
        "id long, text string",
    )
    out = {
        r["id"]: r["embedding"]
        for r in encode.hash_embed(df, "id", "text", dim=DIM).collect()
    }
    assert out[1] == out[2]  # same text → same vector
    assert out[1] != out[3]
    assert all(len(v) == DIM for v in out.values())
    # tf weighting: 'alpha' twice contributes twice its sign at its index
    one = {
        r["id"]: r["embedding"]
        for r in encode.hash_embed(
            spark.createDataFrame([(1, "alpha beta")], "id long, text string"),
            "id", "text", dim=DIM,
        ).collect()
    }
    diff = [a - b for a, b in zip(out[1], one[1])]
    assert sum(1 for d in diff if d != 0.0) == 1  # only alpha's component
    assert sum(abs(d) for d in diff) == 1.0


def test_hash_embed_empty_and_whitespace_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "word")],
        "id long, text string",
    )
    out = {
        r["id"]: r["embedding"]
        for r in encode.hash_embed(df, "id", "text", dim=DIM).collect()
    }
    assert len(out) == 4  # every doc embeds — zero vector for empties
    for i in (1, 2, 3):
        assert all(v == 0.0 for v in out[i])
    assert any(v != 0.0 for v in out[4])
    # normalize leaves zero vectors zero (no division blow-up)
    norm = {
        r["id"]: r["embedding"]
        for r in encode.hash_embed(
            df, "id", "text", dim=DIM, normalize=True
        ).collect()
    }
    assert all(v == 0.0 for v in norm[1])
    assert sum(v * v for v in norm[4]) == pytest.approx(1.0, rel=1e-9)


def test_encode_index_search_flow(spark, tmp_path):
    """The reference's whole pipeline on this engine: encode the corpus
    (hash_embed) → persist the ANN index → search it. Each probe document's
    own vector must return itself at rank 1 with cosine ≈ 1."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = encode.hash_embed(docs, "doc_id", "text", dim=DIM, normalize=True)
    emb = emb.filter(  # ANN over non-degenerate docs only
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0
    )
    out = str(tmp_path / "flow_ann")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM, rh_n_bits=6, rh_n_tables=4,
        ivf_k=8, ivf_n_iter=2, id_col="id", vec_col="embedding",
    )
    queries = emb.filter(F.col("id") <= 5).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    n_q = queries.count()
    assert n_q > 0
    got = ann_index.rh_topk_stored(spark, out, queries, k=3)
    top1 = {
        r["query_id"]: (r["vec_id"], r["cosine"])
        for r in got.collect()
        if r["rank"] == 1
    }
    assert len(top1) == n_q
    for q, (vid, cos) in top1.items():
        assert vid == q  # self-hit at rank 1 (an LSH bucket contains itself)
        assert cos == pytest.approx(1.0, rel=1e-9)
