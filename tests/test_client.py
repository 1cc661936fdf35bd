"""Five-verb client facade: the reference user's call sites, end to end."""

from __future__ import annotations

import pytest

from clip_as_service_spark.client import CasSparkClient

CORPUS = [
    "spark shuffles data between stages during wide transformations",
    "parquet stores columns with min max statistics per row group",
    "the quick brown fox jumps over the lazy dog",
    "broadcast joins avoid shuffling the large fact table",
    "a dog sleeps lazily in the warm afternoon sun",
    "window functions rank rows within each partition",
]


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    c = CasSparkClient(
        spark, str(tmp_path_factory.mktemp("ws")), dim=32,
        rh_n_bits=4, rh_n_tables=4, ivf_k=2,
    )
    c.index(c.encode(CORPUS))
    return c


def test_encode_shapes(client):
    emb = client.encode(CORPUS).collect()
    assert len(emb) == len(CORPUS)
    assert all(len(r["embedding"]) == 32 for r in emb)
    norms = [sum(v * v for v in r["embedding"]) for r in emb]
    assert all(n == pytest.approx(1.0, rel=1e-9) for n in norms)


@pytest.mark.parametrize("method", ["rh", "ivf"])
def test_search_self_hit(client, method):
    got = client.search([CORPUS[0], CORPUS[2]], k=3, method=method)
    top1 = {r["query_id"]: r["vec_id"] for r in got.collect() if r["rank"] == 1}
    assert top1 == {0: 0, 1: 2}  # identical text → cosine 1 self-hit


def test_index_append_then_search(client):
    extra = ["completely novel appended document about xylophones"]
    client.index_append(client.encode(extra, id_offset=100))
    got = client.search(extra, k=1).collect()
    assert [(r["rank"], r["vec_id"]) for r in got] == [(1, 100)]


def test_rank_orders_by_relevance(client):
    out = client.rank(
        "lazy dog sleeping in the sun",
        [CORPUS[1], CORPUS[4], CORPUS[2]],
    ).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    best = next(r for r in out if r["rank"] == 1)
    assert best["id"] in (1, 2)  # a dog sentence outranks the parquet one
    assert best["id"] != 0


def test_profile(client):
    p = client.profile()
    assert p["meta"]["dim"] == 32
    assert p["rh_buckets"]["rows"] >= len(CORPUS) * 4  # n_tables copies
    assert p["ivf_cells"]["rows"] >= len(CORPUS)


def test_reader_interactive(client):
    emb0 = client.encode(CORPUS).filter("id = 0").collect()[0]["embedding"]
    reader = client.reader()
    got = reader.search(emb0, k=1)
    assert got and got[0][1] == 0  # self-hit, zero Spark jobs


def test_search_unknown_method_raises(client):
    with pytest.raises(ValueError, match="unknown search method"):
        client.search(["x"], method="hnsw")


def test_index_delete_and_update(client):
    """/delete and /update through the facade (runs last — mutates the
    module-scoped workspace like test_index_append_then_search does)."""
    extra = ["completely novel appended document about xylophones"]
    # delete the id appended earlier: its self-query must stop finding it
    assert client.index_delete([100]) == 1
    got = client.search(extra, k=3).collect()
    assert all(r["vec_id"] != 100 for r in got)
    # update doc 0's vector to the xylophone text: the xylophone query's
    # new self-hit is id 0 at cosine 1
    client.index_update(client.encode(extra, id_offset=0))
    got = client.search(extra, k=1).collect()
    assert [(r["rank"], r["vec_id"]) for r in got] == [(1, 0)]
    assert got[0]["cosine"] == pytest.approx(1.0, rel=1e-9)
    # the reader sees the same state after refresh-by-construction
    emb = client.encode(extra).collect()[0]["embedding"]
    r = client.reader().search(emb, k=1)
    assert r and r[0][1] == 0
