"""ANN delete/update (merge-on-read tombstones) — VERDICT r05 #2.

Reference analog: the `/delete` and `/update` endpoints routed over the
resident AnnLite index (docs/user-guides/retriever.md:203-204,225). The
contract pinned here: a deleted id disappears from ALL FOUR probe paths
(rh/ivf stored Spark paths + both AnnReader probes) without any physical
rewrite; an update serves exactly the new vector; compaction physically
reclaims the bytes and its result is indistinguishable from a fresh build
over the surviving rows (same quantizer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clip_as_service_spark.operators import ann_index, similarity as sim
from clip_as_service_spark.sources.tables import IndexStorage

SF_DIR = "/root/testdata/sf0.001"
K = 10
DIM = 64
N_BITS = 6
N_TABLES = 4
IVF_K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def quantizer(spark, emb):
    """ONE pre-trained coarse quantizer shared by every build in this file:
    fresh-build-over-survivors comparisons are only meaningful when both
    indexes assign cells under the same centroids."""
    return sim.kmeans_centroids(
        emb, k=IVF_K, n_iter=3, id_col="vec_id", vec_col="embedding"
    ).cache()


def _build(spark, df, out, quantizer, **kw):
    return ann_index.build_ann_index(
        spark, df, out, dim=DIM, rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_centroids=quantizer, **kw,
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["cosine"], 9))
        for r in df.collect()
    )


def _all_paths(spark, idx, queries, **kw):
    """Results from all four probe paths: two Spark stored paths + the two
    AnnReader probes (reader rebuilt per call — snapshot semantics)."""
    rh = _rows(ann_index.rh_topk_stored(spark, idx, queries, k=K, **kw))
    ivf = _rows(
        ann_index.ivf_topk_stored(spark, idx, queries, k=K, nprobe=2, **kw)
    )
    reader = ann_index.AnnReader(idx)
    q_rows = queries.collect()
    r_rh, r_ivf = [], []
    for qr in q_rows:
        for rank, vid, cos in reader.search(qr["qvec"], k=K, **kw):
            r_rh.append((qr["query_id"], rank, vid, round(cos, 9)))
        for rank, vid, cos in reader.search_ivf(
            qr["qvec"], k=K, nprobe=2, **kw
        ):
            r_ivf.append((qr["query_id"], rank, vid, round(cos, 9)))
    return rh, ivf, sorted(r_rh), sorted(r_ivf)


def test_delete_hides_id_from_all_probe_paths(
    spark, emb, queries, quantizer, tmp_path
):
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    # each query's own vector is its cosine-1.0 top hit — delete the first
    # two query ids, the strongest possible presence in every result page
    victims = [0, 1]
    before = _all_paths(spark, idx, queries)
    assert any(vid in victims for res in before for (_, _, vid, _) in res)
    n = ann_index.delete_ann_vectors(spark, idx, victims)
    assert n == 2
    after = _all_paths(spark, idx, queries)
    assert not any(vid in victims for res in after for (_, _, vid, _) in res)
    # and the results equal a FRESH build over the survivors (same planes
    # — seed-deterministic — and the same pre-trained quantizer)
    fresh = str(tmp_path / "fresh")
    _build(
        spark, emb.filter(~F.col("vec_id").isin(victims)), fresh, quantizer
    )
    assert after == _all_paths(spark, fresh, queries)
    # delete is idempotent and tolerates absent ids
    assert ann_index.delete_ann_vectors(spark, idx, victims + [10**9]) == 3
    assert _all_paths(spark, idx, queries) == after


def test_update_serves_exactly_the_new_vector(
    spark, emb, queries, quantizer, tmp_path
):
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    # re-encode vec_id 0 as the negation of vec_id 1's vector
    newv = (
        emb.filter(F.col("vec_id") == 1)
        .select(
            F.lit(0).cast("long").alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    ann_index.update_ann_vectors(spark, idx, newv)
    got = _all_paths(spark, idx, queries)
    fresh = str(tmp_path / "fresh")
    _build(
        spark, emb.filter(F.col("vec_id") != 0).unionByName(newv), fresh,
        quantizer,
    )
    assert got == _all_paths(spark, fresh, queries)


def test_append_rejects_live_id_but_accepts_deleted(
    spark, emb, queries, quantizer, tmp_path
):
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    row0 = emb.filter(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="live"):
        ann_index.append_ann_vectors(spark, idx, row0)
    ann_index.delete_ann_vectors(spark, idx, [0])
    ann_index.append_ann_vectors(spark, idx, row0)  # re-append after delete
    # the re-appended row is live again and identical to the original build
    fresh = str(tmp_path / "fresh")
    _build(spark, emb, fresh, quantizer)
    assert _all_paths(spark, idx, queries) == _all_paths(
        spark, fresh, queries
    )
    # a second delete kills the re-appended generation too
    ann_index.delete_ann_vectors(spark, idx, [0])
    assert not any(
        vid == 0
        for res in _all_paths(spark, idx, queries)
        for (_, _, vid, _) in res
    )


def test_compact_reclaims_bytes_and_preserves_results(
    spark, emb, queries, quantizer, tmp_path
):
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    n_total = emb.count()
    victims = [0, 2, 7]
    ann_index.delete_ann_vectors(spark, idx, victims)
    store = IndexStorage(idx)
    pre_bytes = store.table_bytes("ivf_cells")
    before = _all_paths(spark, idx, queries)
    ann_index.compact_ann_index(spark, idx)
    # tombstones cleared, dead rows physically gone, results unchanged
    assert not store.exists("deleted_ids")
    assert store.read(spark, "ivf_cells").count() == n_total - len(victims)
    assert (
        store.read(spark, "rh_buckets").count()
        == (n_total - len(victims)) * N_TABLES
    )
    assert store.table_bytes("ivf_cells") < pre_bytes
    assert _all_paths(spark, idx, queries) == before
    # WATERMARK: post-compact mutations must stamp past the cleared
    # tombstones' generations — delete a survivor and it must still hide
    ann_index.delete_ann_vectors(spark, idx, [1])
    assert not any(
        vid == 1
        for res in _all_paths(spark, idx, queries)
        for (_, _, vid, _) in res
    )


def test_compact_retrain_after_update_uses_new_vectors(
    spark, emb, queries, quantizer, tmp_path
):
    """Retrain-compact over an updated index must train/assign from the
    LIVE rows only and keep serving the updated vector."""
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    newv = emb.filter(F.col("vec_id") == 3).select(
        F.lit(0).cast("long").alias("vec_id"),
        F.col("embedding"),
    )
    ann_index.update_ann_vectors(spark, idx, newv)
    before = _all_paths(spark, idx, queries)
    ann_index.compact_ann_index(spark, idx, retrain=True)
    store = IndexStorage(idx)
    assert not store.exists("deleted_ids")
    assert store.read(spark, "ivf_cells").count() == emb.count()
    # retrain moves cell boundaries, so compare against a fresh RETRAINED
    # build over the same live set (deterministic k-means: same data, same
    # config → same quantizer)
    fresh = str(tmp_path / "fresh")
    ann_index.build_ann_index(
        spark,
        emb.filter(F.col("vec_id") != 0).unionByName(newv),
        fresh, dim=DIM, rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=5,
    )
    assert _all_paths(spark, idx, queries) == _all_paths(
        spark, fresh, queries
    )
    # RH results must also match the pre-compact (non-retrained) serving
    # view: rh planes are seed-deterministic, immune to retrain
    assert _all_paths(spark, idx, queries)[0] == before[0]


def test_delete_on_id_only_and_pq_payloads(
    spark, emb, queries, quantizer, tmp_path
):
    """The fetch-from-ivf_cells paths (_fetch_exact_vectors / AnnReader
    _fetch_vectors) must not hand back a superseded twin of an updated id."""
    for name, kw in (
        ("ids", dict(store_vectors=False)),
        ("pq", dict(store_vectors=False, pq=True, pq_m=8, pq_codes=16)),
    ):
        idx = str(tmp_path / f"idx_{name}")
        _build(spark, emb, idx, quantizer, **kw)
        newv = emb.filter(F.col("vec_id") == 5).select(
            F.lit(0).cast("long").alias("vec_id"), F.col("embedding")
        )
        ann_index.update_ann_vectors(spark, idx, newv)
        ann_index.delete_ann_vectors(spark, idx, [1])
        got = _all_paths(spark, idx, queries)
        fresh = str(tmp_path / f"fresh_{name}")
        _build(
            spark,
            emb.filter(~F.col("vec_id").isin([0, 1])).unionByName(newv),
            fresh, quantizer, **kw,
        )
        assert got == _all_paths(spark, fresh, queries), name


def test_tombstone_filter_is_broadcast_hash_anti_join(
    spark, emb, queries, quantizer, tmp_path
):
    """Plan pin: the liveness filter must stay a BroadcastHashJoin
    (LeftAnti, vec_id equi-key, gen inequality as the riding condition)
    under the pruned scan — a fall to BroadcastNestedLoopJoin would make
    every probe O(candidates × tombstones)."""
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    ann_index.delete_ann_vectors(spark, idx, [0, 1])
    out = ann_index.rh_topk_stored(spark, idx, queries, k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(
        "LeftAnti" in line and "BroadcastHashJoin" in line
        for line in plan.splitlines()
    )
    # the bucket pushdown must survive the added join
    assert "PushedFilters: [Or(In(bucket" in plan or "In(bucket" in plan


def test_delete_requires_gen_support(spark, emb, quantizer, tmp_path):
    import json
    import os

    idx = str(tmp_path / "idx")
    store = _build(spark, emb, idx, quantizer)
    meta = store.read_meta()
    meta["version"] = 1
    with open(os.path.join(idx, "_meta.json"), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="version < 2"):
        ann_index.delete_ann_vectors(spark, idx, [0])


def test_cli_delete_update_stats_roundtrip(
    spark, emb, queries, quantizer, tmp_path, capsys
):
    """ann-delete / ann-update / ann-stats through the CLI surface: the
    stats view must show the tombstone bookkeeping a refresh pipeline
    reads before deciding to compact."""
    import json

    from clip_as_service_spark.__main__ import main

    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    assert main(["ann-delete", "--index", idx, "--ids", "0,1"]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "deleted": 2
    }
    upd = str(tmp_path / "upd.parquet")
    emb.filter(F.col("vec_id") == 2).select(
        F.lit(0).cast("long").alias("vec_id"), "embedding"
    ).write.parquet(upd)
    assert main(["ann-update", "--index", idx, "--input", upd]) == 0
    capsys.readouterr()
    assert main(["ann-stats", "--index", idx]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n = emb.count()
    # live = n - 2 deleted + 1 re-added (id 0 updated, id 1 still dead)
    assert stats["live_vectors"] == n - 1
    assert stats["ivf_cells"]["rows"] == n + 1  # dead twin of 0 + new row
    assert stats["dead_rows_pending_compact"] == 2
    assert stats["tombstoned_ids"] == 2


def test_update_refuses_bad_batches_before_tombstoning(
    spark, emb, quantizer, tmp_path
):
    """Both foreseeable batch rejections (duplicate ids, wrong dimension)
    must fire BEFORE any tombstone lands — a post-delete rejection would
    leave the batch ids dark with no replacement rows."""
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    dup = emb.filter(F.col("vec_id") == 0).unionByName(
        emb.filter(F.col("vec_id") == 0)
    )
    with pytest.raises(ValueError, match="more than once"):
        ann_index.update_ann_vectors(spark, idx, dup)
    short = emb.filter(F.col("vec_id") == 0).select(
        "vec_id", F.slice("embedding", 1, 3).alias("embedding")
    )
    with pytest.raises(ValueError, match="dimensional"):
        ann_index.update_ann_vectors(spark, idx, short)
    # nothing was tombstoned — id 0 is still live
    assert not IndexStorage(idx).exists("deleted_ids")
    # an empty delete batch must not materialize a zero-row tombstone
    # table (its existence alone taxes every probe until compact)
    assert ann_index.delete_ann_vectors(spark, idx, emb.filter(F.lit(False)).select("vec_id")) == 0
    assert not IndexStorage(idx).exists("deleted_ids")


def test_delete_racing_nonretrain_compact_survives(
    spark, emb, queries, quantizer, tmp_path, monkeypatch
):
    """ADVICE r06: a delete_ann_vectors landing AFTER a layout-only compact
    read its tombstone snapshot must NOT be discarded by the end-of-compact
    cleanup (the old rmtree resurrected its rows). The cleanup now removes
    only the snapshot's files, so the racing tombstone survives and keeps
    masking its rows."""
    idx = str(tmp_path / "idx")
    _build(spark, emb, idx, quantizer)
    ann_index.delete_ann_vectors(spark, idx, [0])
    orig = ann_index._tombstones
    fired = {}

    def hooked(sp, store):
        ts = orig(sp, store)
        if not fired:  # only on the compact's own snapshot read
            fired["yes"] = True
            # concurrent delete lands after the snapshot was read
            ann_index.delete_ann_vectors(spark, idx, [2])
        return ts

    monkeypatch.setattr(ann_index, "_tombstones", hooked)
    ann_index.compact_ann_index(spark, idx)
    monkeypatch.setattr(ann_index, "_tombstones", orig)
    store = IndexStorage(idx)
    # the racing tombstone survived the cleanup...
    assert store.exists("deleted_ids")
    live_ts = store.read(spark, "deleted_ids").select("vec_id").collect()
    assert {r["vec_id"] for r in live_ts} == {2}
    # ...and its rows stay hidden on every probe path
    assert not any(
        vid in (0, 2)
        for res in _all_paths(spark, idx, queries)
        for (_, _, vid, _) in res
    )
