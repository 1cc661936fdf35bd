"""Rank fusion (operators/fusion): RRF math pinned against a pure-Python
recompute, and the serving-path hybrid (WAND block index + stored ANN)
end to end over the pages fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clip_as_service_spark import fixtures
from clip_as_service_spark.operators import ann_index, fusion
from clip_as_service_spark.operators.encode import hash_embed
from clip_as_service_spark.operators.index_build import build_index
from clip_as_service_spark.operators import wand

DIM = 32
POOL = 15
K = 5
RRF_K = 60


def test_rrf_fuse_matches_hand_computation(spark):
    """Two arms with partial overlap: rrf, per-arm rank carry-through
    (0 = missed), and the (rrf DESC, doc_id ASC) tie-break."""
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id int, doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)],
        "query_id int, doc_id long, rank int",
    )
    out = {
        (r["query_id"], r["doc_id"]): (
            r["rank"], r["rrf"], r["rank_bm25"], r["rank_cos"]
        )
        for r in fusion.rrf_fuse(
            {"bm25": lex, "cos": sem}, k=10, rrf_k=RRF_K
        ).collect()
    }

    def rrf(*ranks):
        return round(sum(1.0 / (RRF_K + r) for r in ranks if r), 9)

    # q1: 11 fused from both arms wins; 10/12/13 single-arm, rrf desc then
    # doc_id asc (10 and 13 share rank-1-worth? no: 10 has lex rank 1,
    # 13 has sem rank 2 — distinct rrf)
    assert out[(1, 11)] == (1, rrf(2, 1), 2, 1)
    assert out[(1, 10)] == (2, rrf(1), 1, 0)
    assert out[(1, 12)][1] == rrf(3)
    assert out[(1, 13)][1] == rrf(2)
    # 12 (lex 3) vs 13 (sem 2): rrf(2) > rrf(3) → 13 ranks ahead
    assert out[(1, 13)][0] < out[(1, 12)][0]
    # q2: 20 in both arms beats 21
    assert out[(2, 20)] == (1, rrf(1, 2), 1, 2)
    assert out[(2, 21)] == (2, rrf(1), 0, 1)


def test_rrf_fuse_tiebreak_by_doc_id(spark):
    """Equal rrf (same single-arm rank) must order by doc_id ascending."""
    arm = spark.createDataFrame(
        [(1, 7, 1), (1, 3, 1)], "query_id int, doc_id long, rank int"
    )
    # impossible from one real engine (duplicate rank), but pins the sort
    rows = fusion.rrf_fuse({"only": arm}, k=10).collect()
    got = [(r["rank"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == [(1, 3), (2, 7)]


@pytest.fixture(scope="module")
def hybrid_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hybrid")
    pages_df = fixtures.pages_spark_df(spark, 120)
    text_idx = str(root / "text_idx")
    build_index(
        spark, pages_df, text_idx, n_shards=4, salt_cutoff=30,
        target_sublist=20, doc_id_method="hash",
    )
    docs = pages_df.select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    emb = hash_embed(docs, "doc_id", "text", dim=DIM)
    emb = emb.filter(  # ANN index over non-degenerate docs (flow contract)
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0
    )
    ann_idx = str(root / "ann_idx")
    ann_index.build_ann_index(
        spark, emb, ann_idx, dim=DIM, rh_n_bits=6, rh_n_tables=4,
        ivf_k=8, ivf_n_iter=2, id_col="id", vec_col="embedding",
    )
    return text_idx, ann_idx


def test_hybrid_search_stored_fuses_both_persisted_arms(spark, hybrid_setup):
    """hybrid_search_stored must equal a pure-Python RRF recompute from the
    two arms run independently (WAND over the block index; hash-embed →
    stored RH probe) — pins the wiring: same encode dim as the index, same
    pools, vec_id treated as doc_id."""
    text_idx, ann_idx = hybrid_setup
    queries = fixtures.make_queries()[:4]
    qdf = spark.createDataFrame(
        [(q["query_id"], q["text"]) for q in queries],
        "query_id int, text string",
    )

    got = fusion.hybrid_search_stored(
        spark, text_idx, ann_idx, qdf, k=K, pool=POOL
    )
    got_rows = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["rrf"])
        for r in got.collect()
    }
    assert got_rows

    lex = wand.search_topk(spark, text_idx, qdf, k=POOL).collect()
    qe = hash_embed(qdf, "query_id", "text", dim=DIM).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    sem = ann_index.rh_topk_stored(spark, ann_idx, qe, k=POOL).collect()

    arms: dict[tuple, list[int]] = {}
    for r in lex:
        arms.setdefault((r["query_id"], int(r["doc_id"])), []).append(r["rank"])
    for r in sem:
        arms.setdefault((r["query_id"], int(r["vec_id"])), []).append(r["rank"])
    fused = {}
    for (qid, did), ranks in arms.items():
        fused.setdefault(qid, []).append(
            (round(sum(1.0 / (RRF_K + rk) for rk in ranks), 9), did)
        )
    want = {}
    for qid, lst in fused.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for i, (score, did) in enumerate(lst[:K], 1):
            want[(qid, did)] = (i, score)
    assert got_rows == want
    # both arms genuinely contribute (some fused doc carries both ranks)
    both = [
        r for r in got.collect() if r["rank_bm25"] > 0 and r["rank_cos"] > 0
    ]
    assert both, "no doc fused from both arms — arms misaligned?"


def test_hash_embed_py_matches_spark(spark):
    """The pure-Python query encode must be bit-identical to the Spark
    encode verb — HybridReader's semantic arm depends on it."""
    texts = [
        "the quick brown fox", "", "solo", "repeat repeat repeat",
        "ünïcode tökens graph query",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    got = {
        r["id"]: list(r["embedding"])
        for r in hash_embed(df, "id", "text", dim=DIM).collect()
    }
    from clip_as_service_spark.operators.encode import hash_embed_py

    for i, t in enumerate(texts):
        assert got[i] == hash_embed_py(t, dim=DIM), t


def test_hybrid_reader_parity_with_stored_path(spark, hybrid_setup):
    """VERDICT r05 #4: the zero-Spark HybridReader (IndexReader ⊕ AnnReader
    ⊕ python RRF) must return exactly hybrid_search_stored's page for the
    same indexes and queries — rank, doc, rrf, and per-arm rank carries."""
    text_idx, ann_idx = hybrid_setup
    queries = fixtures.make_queries()[:4]
    qdf = spark.createDataFrame(
        [(q["query_id"], q["text"]) for q in queries],
        "query_id int, text string",
    )
    want: dict[int, list[tuple]] = {}
    for r in fusion.hybrid_search_stored(
        spark, text_idx, ann_idx, qdf, k=K, pool=POOL
    ).collect():
        want.setdefault(r["query_id"], []).append(
            (r["rank"], int(r["doc_id"]), round(r["rrf"], 9),
             r["rank_bm25"], r["rank_cos"])
        )
    reader = fusion.HybridReader(text_idx, ann_idx)
    for q in queries:
        got = [
            (rank, did, round(rrf, 9), rb, rc)
            for rank, did, rrf, rb, rc in reader.search(
                q["text"], k=K, pool=POOL
            )
        ]
        assert got == sorted(want.get(q["query_id"], [])), q["text"]
    assert any(want.values())


def test_hybrid_search_cli_interactive(spark, hybrid_setup, capsys):
    """`hybrid-search --interactive` serves through HybridReader (no Spark
    session construction) and emits the same row shape as the Spark path."""
    import json as _json

    from clip_as_service_spark.__main__ import main

    text_idx, ann_idx = hybrid_setup
    q = fixtures.make_queries()[0]
    rc = main([
        "hybrid-search", "--text-index", text_idx, "--ann-index", ann_idx,
        "--query", q["text"], "-k", str(K), "--pool", str(POOL),
        "--interactive",
    ])
    assert rc == 0
    rows = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert rows and [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    want = {
        int(r["doc_id"]): (r["rank"], round(r["rrf"], 9))
        for r in fusion.hybrid_search_stored(
            spark, text_idx, ann_idx,
            spark.createDataFrame(
                [(0, q["text"])], "query_id int, text string"
            ),
            k=K, pool=POOL,
        ).collect()
    }
    got = {r["doc_id"]: (r["rank"], round(r["rrf"], 9)) for r in rows}
    assert got == want
