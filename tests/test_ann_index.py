"""Persisted ANN index (operators/ann_index): stored-path queries must be
identical to the recompute paths, and the stored scans must be PRUNED to
the probed buckets/cells — the whole point of persisting the assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clip_as_service_spark.operators import ann_index, similarity as sim

SF_DIR = "/root/testdata/sf0.001"
K = 10
DIM = 64
N_BITS = 6
N_TABLES = 4
IVF_K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def ann_dir(spark, emb, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "annidx")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=3,
    )
    return out


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in df.collect()
    )


def test_rh_stored_equals_recomputed(spark, emb, queries, ann_dir):
    stored = ann_index.rh_topk_stored(spark, ann_dir, queries, k=K)
    recomputed = sim.rh_bucketed_topk(
        emb, queries, k=K, n_bits=N_BITS, dim=DIM, n_tables=N_TABLES
    )
    assert _rows(stored) == _rows(recomputed)
    assert _rows(stored)  # non-empty


def test_ivf_stored_equals_recomputed(spark, emb, queries, ann_dir):
    from clip_as_service_spark.sources.tables import IndexStorage

    cents = IndexStorage(ann_dir).read(spark, "ivf_centroids")
    stored = ann_index.ivf_topk_stored(spark, ann_dir, queries, k=K, nprobe=2)
    recomputed = sim.ivf_topk(emb, queries, cents, k=K, nprobe=2)
    assert _rows(stored) == _rows(recomputed)
    assert _rows(stored)


def test_ivf_scan_prunes_to_probed_cells(spark, queries, ann_dir):
    """The ivf_cells read under a probe must touch ONLY the probed cells'
    partition directories (hive pruning) — asserted on the physical plan's
    partition count, not just the filter text."""
    from clip_as_service_spark.sources.tables import IndexStorage

    store = IndexStorage(ann_dir)
    cents = store.read(spark, "ivf_cells")
    n_cells = cents.select("cell_id").distinct().count()

    q_assign = sim._nearest_cells(
        queries, store.read(spark, "ivf_centroids"), 2,
        "query_id", "qvec", "cell_id", "centroid", "probe_rank",
    )
    probed = sorted(
        {int(r["cell_id"]) for r in q_assign.select("cell_id").distinct().collect()}
    )
    assert 0 < len(probed) < n_cells  # the probe is genuinely selective
    out = ann_index.ivf_topk_stored(spark, ann_dir, queries, k=K, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # cell_id must be a PARTITION filter on the ivf_cells scan (directory
    # pruning), not a post-scan data filter
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell_id" in p and "IN" in p for p in pf), plan[:3000]


def test_rh_scan_pushes_bucket_filter(spark, queries, ann_dir):
    """The stored RH probe must push (tbl, bucket) predicates into the
    parquet scan: tbl prunes directories, bucket rides the within-file
    sort. Assert PushedFilters/PartitionFilters mention both columns."""
    out = ann_index.rh_topk_stored(spark, ann_dir, queries, k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan
    # partition dirs touched must be a subset of tables probed (all of them
    # here) and the row-group filter must carry bucket values
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in p for p in pushed), plan[:2000]


def test_build_is_resumable(spark, emb, ann_dir, tmp_path):
    """Re-invoking build over an existing index is a no-op (checkpoint
    markers), and a missing ivf_cells stage rebuilds without touching
    rh_buckets."""
    import os
    import shutil

    from clip_as_service_spark.sources.tables import IndexStorage

    out = str(tmp_path / "ann2")
    shutil.copytree(ann_dir, out)
    store = IndexStorage(out)
    rh_mtime = os.path.getmtime(os.path.join(store.path("rh_buckets"), "_SUCCESS"))
    shutil.rmtree(store.path("ivf_cells"))
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES, ivf_k=IVF_K, ivf_n_iter=3,
    )
    assert store.exists("ivf_cells")
    assert rh_mtime == os.path.getmtime(
        os.path.join(store.path("rh_buckets"), "_SUCCESS")
    )


def test_filtered_search_equals_prefiltered_corpus(spark, emb, queries, tmp_path):
    """AnnLite-style filtered search: a `where` over stored meta_cols must
    equal running the unfiltered operators over the PRE-FILTERED corpus
    (bucketing/assignment are per-vector, so the two factorizations are the
    same candidate set)."""
    out = str(tmp_path / "ann_meta")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=3, meta_cols=("label",),
    )
    pred = "label = 3"
    sub = emb.filter(pred)
    assert 0 < sub.count() < emb.count()

    got_rh = ann_index.rh_topk_stored(spark, out, queries, k=K, where=pred)
    want_rh = sim.rh_bucketed_topk(
        sub, queries, k=K, n_bits=N_BITS, dim=DIM, n_tables=N_TABLES
    )
    assert _rows(got_rh) == _rows(want_rh)
    assert _rows(got_rh)

    from clip_as_service_spark.sources.tables import IndexStorage

    cents = IndexStorage(out).read(spark, "ivf_centroids")
    got_ivf = ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2, where=pred)
    want_ivf = sim.ivf_topk(sub, queries, cents, k=K, nprobe=2)
    assert _rows(got_ivf) == _rows(want_ivf)
    assert _rows(got_ivf)

    # the filter is PUSHED into the stored scan, not applied post-join
    plan = got_ivf._jdf.queryExecution().executedPlan().toString()
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("label" in p for p in pushed), plan[:3000]


def test_append_ann_vectors_incremental(spark, emb, queries, tmp_path):
    """Build on half the corpus, append the other half: stored queries must
    equal the recompute paths over the FULL corpus (RH: same buckets; IVF:
    assignment under the STORED half-trained quantizer — appends never
    retrain, so old rows' cell geometry is preserved)."""
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    out = str(tmp_path / "ann_inc")
    ann_index.build_ann_index(
        spark, half, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES, ivf_k=IVF_K, ivf_n_iter=3,
    )
    ann_index.append_ann_vectors(spark, out, rest)

    got_rh = ann_index.rh_topk_stored(spark, out, queries, k=K)
    want_rh = sim.rh_bucketed_topk(
        emb, queries, k=K, n_bits=N_BITS, dim=DIM, n_tables=N_TABLES
    )
    assert _rows(got_rh) == _rows(want_rh)
    assert _rows(got_rh)

    from clip_as_service_spark.sources.tables import IndexStorage

    cents = IndexStorage(out).read(spark, "ivf_centroids")
    got_ivf = ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2)
    want_ivf = sim.ivf_topk(emb, queries, cents, k=K, nprobe=2)
    assert _rows(got_ivf) == _rows(want_ivf)
    assert _rows(got_ivf)


def test_ann_reader_interactive_matches_stored_paths(spark, emb, queries, tmp_path):
    """AnnReader (zero-Spark-job pyarrow serving path) must return the
    same ranked results as the Spark stored paths. Built with
    sign_round_dp so the reader's numpy probe bucketing is pinned to the
    Spark fold's (boundary signs rounded before sign on both sides)."""
    out = str(tmp_path / "ann_reader")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=3, sign_round_dp=9,
    )
    reader = ann_index.AnnReader(out)
    q_rows = queries.collect()

    spark_rh = {}
    for r in ann_index.rh_topk_stored(spark, out, queries, k=K).collect():
        spark_rh.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], round(r["cosine"], 9))
        )
    spark_ivf = {}
    for r in ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2).collect():
        spark_ivf.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], round(r["cosine"], 9))
        )
    for qr in q_rows:
        got = [
            (rk, vid, round(c, 9))
            for rk, vid, c in reader.search(qr["qvec"], k=K)
        ]
        assert got == sorted(spark_rh[qr["query_id"]]), qr["query_id"]
        got_ivf = [
            (rk, vid, round(c, 9))
            for rk, vid, c in reader.search_ivf(qr["qvec"], k=K, nprobe=2)
        ]
        assert got_ivf == sorted(spark_ivf[qr["query_id"]]), qr["query_id"]


def test_append_rejects_colliding_ids(spark, emb, ann_dir, tmp_path):
    """Appending vectors whose ids are LIVE in the index must raise —
    query-path dedup would otherwise pick an arbitrary one of two
    different vectors. (A tombstoned id may be re-appended: that is
    update_ann_vectors — tests/test_ann_delete.py.)"""
    import shutil

    out = str(tmp_path / "ann_clash")
    shutil.copytree(ann_dir, out)
    with pytest.raises(ValueError, match="is live\\s+in the index"):
        ann_index.append_ann_vectors(spark, out, emb.limit(3))


def test_append_rejects_batch_internal_duplicates(spark, emb, ann_dir, tmp_path):
    """A batch whose OWN rows share a vec_id must raise too — .distinct()
    on the id column would otherwise hide the collision and append both
    vectors under one id."""
    import shutil

    out = str(tmp_path / "ann_batchdup")
    shutil.copytree(ann_dir, out)
    fresh = emb.limit(2).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    dup = fresh.union(
        fresh.limit(1).withColumn(
            "embedding", F.transform("embedding", lambda x: x * 2)
        )
    )
    with pytest.raises(ValueError, match="IN THE APPEND BATCH"):
        ann_index.append_ann_vectors(spark, out, dup)


def test_build_auto_sizes_from_corpus(spark, tmp_path):
    """rh_n_bits=None / ivf_k=None size the index from the corpus (one
    count job): auto_n_bits(N) and ~ceil(sqrt(N)) cells, persisted in
    _meta.json — a fixed cell count stops pruning as N grows."""
    import math

    from clip_as_service_spark.sources.tables import IndexStorage

    dim = 8
    for n in (300, 5000):
        emb_n = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.sin(F.col("id") * i + i).cast("double"),
            ).alias("embedding"),
        )
        out = str(tmp_path / f"auto_{n}")
        ann_index.build_ann_index(
            spark, emb_n, out, dim=dim, ivf_n_iter=1
        )
        meta = IndexStorage(out).read_meta()
        assert meta["n_at_build"] == n
        assert meta["rh_n_bits"] == sim.auto_n_bits(n)
        assert meta["ivf_k"] == ann_index.auto_ivf_k(n) == math.isqrt(n - 1) + 1
    # the two sizes must actually choose DIFFERENT geometry
    m300 = IndexStorage(str(tmp_path / "auto_300")).read_meta()
    m5000 = IndexStorage(str(tmp_path / "auto_5000")).read_meta()
    assert m300["ivf_k"] < m5000["ivf_k"]
    assert m300["rh_n_bits"] < m5000["rh_n_bits"]


def test_build_pretrained_quantizer_fixes_ivf_k(spark, emb, tmp_path):
    """ivf_k=None with a pre-trained quantizer takes the quantizer's OWN
    cell count (the geometry is already fixed), not the corpus rule."""
    from clip_as_service_spark.sources.tables import IndexStorage

    cents = sim.kmeans_centroids(emb, k=5, n_iter=1)
    out = str(tmp_path / "ann_pretrained")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM, rh_n_bits=N_BITS, ivf_centroids=cents
    )
    assert IndexStorage(out).read_meta()["ivf_k"] == 5


def test_build_config_mismatch_raises(spark, emb, ann_dir):
    """Re-calling build_ann_index over an existing index with explicit
    arguments that contradict the persisted config must raise — the rows
    on disk were assigned under the stored geometry. Matching args (or the
    None autos) resume silently."""
    # same args → resume, no raise
    ann_index.build_ann_index(
        spark, emb, ann_dir, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES, ivf_k=IVF_K, ivf_n_iter=3,
    )
    # None autos defer to stored → no raise
    ann_index.build_ann_index(
        spark, emb, ann_dir, dim=DIM,
        rh_n_bits=None, rh_n_tables=N_TABLES, ivf_k=None, ivf_n_iter=3,
    )
    with pytest.raises(ValueError, match="rh_seed"):
        ann_index.build_ann_index(
            spark, emb, ann_dir, dim=DIM,
            rh_n_bits=N_BITS, rh_n_tables=N_TABLES, ivf_k=IVF_K,
            ivf_n_iter=3, rh_seed=7,
        )


def test_round_half_up_matches_spark_not_numpy():
    """_round_half_up must replicate Spark F.round (HALF_UP, away from
    zero) — np.round's half-to-even resolves exact halves differently and
    would probe different cells/buckets than the stored Spark paths."""
    import numpy as np

    vals = np.array([2.5e-9, -2.5e-9, 1.5e-9, -1.5e-9, 0.0])
    got = ann_index._round_half_up(vals, 9)
    want = np.array([3e-9, -3e-9, 2e-9, -2e-9, 0.0])
    assert np.allclose(got, want, atol=1e-18)
    # and np.round genuinely disagrees on the even-neighbor halves
    assert not np.allclose(np.round(vals, 9), want, atol=1e-18)


def test_id_only_payload_matches_full(spark, emb, queries, tmp_path):
    """store_vectors=False: rh_buckets keeps (vec_id, meta, tbl, bucket)
    only and the probe re-ranks by fetching candidate vectors from
    ivf_cells — results must be identical to the full-payload index, and
    the id-only rh_buckets must be materially smaller on disk."""
    import os

    full = str(tmp_path / "ann_full")
    slim = str(tmp_path / "ann_slim")
    for out, sv in ((full, True), (slim, False)):
        ann_index.build_ann_index(
            spark, emb, out, dim=DIM,
            rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
            ivf_k=IVF_K, ivf_n_iter=3, meta_cols=("label",),
            store_vectors=sv,
        )
    got = ann_index.rh_topk_stored(spark, slim, queries, k=K)
    want = ann_index.rh_topk_stored(spark, full, queries, k=K)
    assert _rows(got) == _rows(want)
    assert _rows(got)
    # filtered search works through the id-only path too
    got_f = ann_index.rh_topk_stored(spark, slim, queries, k=K, where="label = 3")
    want_f = ann_index.rh_topk_stored(spark, full, queries, k=K, where="label = 3")
    assert _rows(got_f) == _rows(want_f)
    assert _rows(got_f)

    def _bytes(root, table):
        total = 0
        for dp, _, fns in os.walk(os.path.join(root, table)):
            total += sum(
                os.path.getsize(os.path.join(dp, f))
                for f in fns
                if f.endswith(".parquet")
            )
        return total

    assert _bytes(slim, "rh_buckets") < 0.5 * _bytes(full, "rh_buckets")
    # ivf_cells (the single vector copy) is the same either way
    assert abs(_bytes(slim, "ivf_cells") - _bytes(full, "ivf_cells")) < 0.2 * _bytes(
        full, "ivf_cells"
    )


def test_reader_where_and_id_only_parity(spark, emb, queries, tmp_path):
    """AnnReader filtered search (pyarrow `where=`) must match the Spark
    stored paths' `where=` — on both the full-payload and id-only
    layouts."""
    import pyarrow.compute as pc

    pred_sql, pred_pa = "label = 3", pc.field("label") == 3
    q_rows = queries.collect()
    for sv in (True, False):
        out = str(tmp_path / f"ann_rdr_{int(sv)}")
        ann_index.build_ann_index(
            spark, emb, out, dim=DIM,
            rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
            ivf_k=IVF_K, ivf_n_iter=3, sign_round_dp=9,
            meta_cols=("label",), store_vectors=sv,
        )
        reader = ann_index.AnnReader(out)
        spark_rh = {}
        for r in ann_index.rh_topk_stored(
            spark, out, queries, k=K, where=pred_sql
        ).collect():
            spark_rh.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"], round(r["cosine"], 9))
            )
        spark_ivf = {}
        for r in ann_index.ivf_topk_stored(
            spark, out, queries, k=K, nprobe=2, where=pred_sql
        ).collect():
            spark_ivf.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"], round(r["cosine"], 9))
            )
        for qr in q_rows:
            got = [
                (rk, vid, round(c, 9))
                for rk, vid, c in reader.search(qr["qvec"], k=K, where=pred_pa)
            ]
            assert got == sorted(spark_rh.get(qr["query_id"], [])), (sv, qr["query_id"])
            got_ivf = [
                (rk, vid, round(c, 9))
                for rk, vid, c in reader.search_ivf(
                    qr["qvec"], k=K, nprobe=2, where=pred_pa
                )
            ]
            assert got_ivf == sorted(spark_ivf.get(qr["query_id"], [])), (
                sv, qr["query_id"],
            )
        assert any(spark_rh.values()) and any(spark_ivf.values())


def _parquet_files(root, table):
    import os

    return [
        os.path.join(dp, f)
        for dp, _, fns in os.walk(os.path.join(root, table))
        for f in fns
        if f.endswith(".parquet")
    ]


def test_ann_compact_bounds_files_and_preserves_results(
    spark, emb, queries, tmp_path
):
    """N appends accumulate one file set per call; ann-compact must rewrite
    to a bounded layout WITHOUT changing any query result, and
    retrain=True must equal a FRESH build over the union (deterministic
    k-means: same init, same config)."""
    out = str(tmp_path / "ann_cpt")
    thirds = [emb.filter(F.col("vec_id") % 3 == r) for r in range(3)]
    ann_index.build_ann_index(
        spark, thirds[0], out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES, ivf_k=IVF_K, ivf_n_iter=3,
    )
    ann_index.append_ann_vectors(spark, out, thirds[1])
    ann_index.append_ann_vectors(spark, out, thirds[2])

    before_files = len(_parquet_files(out, "rh_buckets"))
    rh_before = _rows(ann_index.rh_topk_stored(spark, out, queries, k=K))
    ivf_before = _rows(
        ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2)
    )
    assert rh_before and ivf_before

    ann_index.compact_ann_index(spark, out)
    after_files = len(_parquet_files(out, "rh_buckets"))
    assert after_files < before_files
    # layout-only compaction: results bit-identical
    assert _rows(ann_index.rh_topk_stored(spark, out, queries, k=K)) == rh_before
    assert (
        _rows(ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2))
        == ivf_before
    )

    # retrain ≡ fresh build over the union
    fresh = str(tmp_path / "ann_cpt_fresh")
    ann_index.build_ann_index(
        spark, emb, fresh, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES, ivf_k=IVF_K, ivf_n_iter=3,
    )
    ann_index.compact_ann_index(spark, out, retrain=True)
    assert _rows(
        ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2)
    ) == _rows(ann_index.ivf_topk_stored(spark, fresh, queries, k=K, nprobe=2))
    assert _rows(ann_index.rh_topk_stored(spark, out, queries, k=K)) == _rows(
        ann_index.rh_topk_stored(spark, fresh, queries, k=K)
    )


# ---------------------------------------------------------------------------
# Product-quantized payload (operators/pq)
# ---------------------------------------------------------------------------

PQ_M = 8
PQ_CODES = 64


def _build_pq(spark, emb, out, **kw):
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=3,
        store_vectors=False, pq=True, pq_m=PQ_M, pq_codes=PQ_CODES,
        pq_n_iter=3, **kw,
    )


def test_pq_rerank_all_equals_full_payload(spark, emb, queries, ann_dir, tmp_path):
    """rerank=None fetches every bucket candidate for the exact re-rank —
    the PQ index must then return BIT-IDENTICAL results to the
    full-payload index (same candidates, same exact scoring), while its
    rh_buckets is a fraction of the size."""
    import os

    out = str(tmp_path / "ann_pq")
    _build_pq(spark, emb, out)
    got = ann_index.rh_topk_stored(spark, out, queries, k=K, rerank=None)
    want = ann_index.rh_topk_stored(spark, ann_dir, queries, k=K)
    assert _rows(got) == _rows(want)
    assert _rows(got)

    def _bytes(root, table):
        total = 0
        for dp, _, fns in os.walk(os.path.join(root, table)):
            total += sum(
                os.path.getsize(os.path.join(dp, f))
                for f in fns if f.endswith(".parquet")
            )
        return total

    assert _bytes(out, "rh_buckets") < 0.5 * _bytes(ann_dir, "rh_buckets")


def test_pq_bounded_rerank_recall(spark, emb, queries, ann_dir, tmp_path):
    """A bounded rerank pool (ADC picks the fetch set) must keep high
    recall vs the exact full-payload top-k on this fixture — the
    codebooks are trained on the corpus itself, so reconstruction is
    accurate. Deterministic: fixed data, fixed training."""
    out = str(tmp_path / "ann_pq_r")
    _build_pq(spark, emb, out)
    got = ann_index.rh_topk_stored(spark, out, queries, k=K, rerank=3 * K)
    want = ann_index.rh_topk_stored(spark, ann_dir, queries, k=K)
    got_sets = {}
    for r in got.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for r in want.collect():
        total += 1
        if r["vec_id"] in got_sets.get(r["query_id"], set()):
            hits += 1
    assert total > 0
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_pq_reader_parity_and_append(spark, emb, queries, tmp_path):
    """AnnReader over a PQ index (rerank=None) must equal the Spark stored
    path; appends encode under the STORED codebooks (never retrained) and
    the union still matches the full-payload result exactly."""
    out = str(tmp_path / "ann_pq_rdr")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    _build_pq(spark, half, out, sign_round_dp=9)
    ann_index.append_ann_vectors(spark, out, rest)

    full = str(tmp_path / "ann_full_ref")
    ann_index.build_ann_index(
        spark, emb, full, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=3, sign_round_dp=9,
    )
    got = ann_index.rh_topk_stored(spark, out, queries, k=K, rerank=None)
    want = ann_index.rh_topk_stored(spark, full, queries, k=K)
    assert _rows(got) == _rows(want)
    assert _rows(got)

    reader = ann_index.AnnReader(out)
    spark_rows = {}
    for r in got.collect():
        spark_rows.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], round(r["cosine"], 9))
        )
    for qr in queries.collect():
        rdr = [
            (rk, vid, round(c, 9))
            for rk, vid, c in reader.search(qr["qvec"], k=K)
        ]
        assert rdr == sorted(spark_rows.get(qr["query_id"], [])), qr["query_id"]


def test_pq_compact_retrain_rebuilds_codes(spark, emb, queries, tmp_path):
    """ann-compact --retrain on a PQ index retrains codebooks and
    re-encodes every vector from ivf_cells — results (exact, rerank=None)
    are preserved and the codebook/code artifacts equal a fresh build over
    the same corpus (deterministic training)."""
    out = str(tmp_path / "ann_pq_cpt")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    _build_pq(spark, half, out)
    ann_index.append_ann_vectors(spark, out, rest)
    ann_index.compact_ann_index(spark, out, retrain=True)

    fresh = str(tmp_path / "ann_pq_fresh")
    _build_pq(spark, emb, fresh)
    from clip_as_service_spark.sources.tables import IndexStorage

    cb_a = sorted(
        (r["subspace"], r["code"], tuple(r["centroid"]))
        for r in IndexStorage(out).read(spark, "pq_codebooks").collect()
    )
    cb_b = sorted(
        (r["subspace"], r["code"], tuple(r["centroid"]))
        for r in IndexStorage(fresh).read(spark, "pq_codebooks").collect()
    )
    assert cb_a == cb_b
    got = ann_index.rh_topk_stored(spark, out, queries, k=K, rerank=None)
    want = ann_index.rh_topk_stored(spark, fresh, queries, k=K, rerank=None)
    assert _rows(got) == _rows(want)
    assert _rows(got)


def test_pq_ivf_rerank_paths(spark, emb, queries, ann_dir, tmp_path):
    """IVF probes over a PQ index: rerank=None is the exact full-column
    scan (≡ plain index); rerank=all-candidates ADC path returns the same
    exact result (final scoring is exact); a bounded rerank keeps ≥0.8
    recall; AnnReader's cells-ADC twin matches the Spark path."""
    out = str(tmp_path / "ann_pq_ivf")
    _build_pq(spark, out=out, emb=emb, sign_round_dp=9)
    want = ann_index.ivf_topk_stored(spark, ann_dir, queries, k=K, nprobe=2)
    # exact path (no rerank): identical to the plain index
    got_exact = ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2)
    assert _rows(got_exact) == _rows(want)
    # ADC path with an effectively-unbounded pool: same exact result
    got_all = ann_index.ivf_topk_stored(
        spark, out, queries, k=K, nprobe=2, rerank=10_000
    )
    assert _rows(got_all) == _rows(want)
    # bounded pool: recall vs exact
    got_b = ann_index.ivf_topk_stored(
        spark, out, queries, k=K, nprobe=2, rerank=3 * K
    )
    got_sets = {}
    for r in got_b.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for r in want.collect():
        total += 1
        if r["vec_id"] in got_sets.get(r["query_id"], set()):
            hits += 1
    assert total and hits / total >= 0.8, f"recall {hits}/{total}"
    # reader cells-ADC twin ≡ Spark ADC path (same rerank pool)
    reader = ann_index.AnnReader(out)
    spark_rows = {}
    for r in got_all.collect():
        spark_rows.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], round(r["cosine"], 9))
        )
    for qr in queries.collect():
        rdr = [
            (rk, vid, round(c, 9))
            for rk, vid, c in reader.search_ivf(
                qr["qvec"], k=K, nprobe=2, rerank=10_000
            )
        ]
        assert rdr == sorted(spark_rows.get(qr["query_id"], [])), qr["query_id"]


def test_id_only_fetch_pushes_vec_id_filter(spark, emb, queries, tmp_path):
    """The exact-vector fetch for id-only/PQ probes must PUSH the candidate
    ids into the ivf_cells scan as an In filter (row-group skipping on the
    vec_id within-file sort) for interactive-sized candidate sets — a full
    ivf_cells column scan per results page is the 100-TB failure mode."""
    import re

    out = str(tmp_path / "ann_slim_push")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=3, store_vectors=False,
    )
    got = ann_index.rh_topk_stored(spark, out, queries, k=K)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # (regexing the PushedFilters list is unreliable — the In list itself
    # contains "]"; assert on the pushed predicate text directly)
    assert "In(vec_id" in plan, plan[:3000]
    assert _rows(got)


def test_compact_marker_fences_and_heals(spark, emb, queries, ann_dir, tmp_path):
    """A retrain swap interrupted mid-sequence leaves every _SUCCESS
    intact — only the _compact_pending marker records the hazard. Probes
    and layout-only compaction must REFUSE to serve through it;
    compact(retrain=True) heals (everything re-derives from the cells'
    vectors) and clears it."""
    import os
    import shutil

    out = str(tmp_path / "ann_marker")
    shutil.copytree(ann_dir, out)
    marker = os.path.join(out, "_compact_pending")
    open(marker, "w").write("simulated mid-swap crash\n")

    with pytest.raises(ValueError, match="pending"):
        ann_index.rh_topk_stored(spark, out, queries, k=K)
    with pytest.raises(ValueError, match="pending"):
        ann_index.ivf_topk_stored(spark, out, queries, k=K, nprobe=2)
    with pytest.raises(ValueError, match="pending"):
        ann_index.AnnReader(out)
    with pytest.raises(ValueError, match="retrain"):
        ann_index.compact_ann_index(spark, out, retrain=False)

    ann_index.compact_ann_index(spark, out, retrain=True)
    assert not os.path.exists(marker)
    got = ann_index.rh_topk_stored(spark, out, queries, k=K)
    want = ann_index.rh_topk_stored(spark, ann_dir, queries, k=K)
    assert _rows(got) == _rows(want) and _rows(got)


def test_ivf_empty_training_sample_never_empties_index(spark, emb, queries, tmp_path):
    """The coarse-quantizer twin of the PQ fix below: an ivf_train_sample
    so small the seeded draw comes back EMPTY must degrade to init-only
    centroids (taken from the unsampled corpus head) — and, critically,
    compact_ann_index(retrain=True) must NOT swap ivf_cells (the only
    exact vector copy of an id-only index) for an empty assignment."""
    from clip_as_service_spark.sources.tables import IndexStorage

    out = str(tmp_path / "ann_ivf_tiny_sample")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=2, ivf_train_sample=1e-9,
        store_vectors=False,
    )
    store = IndexStorage(out)
    n_corpus = emb.count()
    assert store.read(spark, "ivf_centroids").count() > 0
    assert store.read(spark, "ivf_cells").count() == n_corpus

    # the r05 data-loss path: retrain re-samples (empty again) — the
    # retrained quantizer must still assign every row, and the swap must
    # leave the index whole
    ann_index.compact_ann_index(spark, out, retrain=True)
    assert store.read(spark, "ivf_centroids").count() > 0
    assert store.read(spark, "ivf_cells").count() == n_corpus
    got = ann_index.rh_topk_stored(spark, out, queries, k=K)
    assert _rows(got)


def test_pq_empty_training_sample_never_empties_index(spark, emb, queries, tmp_path):
    """A pq_train_sample so small the seeded sample comes back EMPTY must
    degrade to init-only codebooks (taken from the unsampled corpus head),
    never to an empty codebook table whose inner join silently drops every
    corpus row into an empty-but-'successful' index."""
    out = str(tmp_path / "ann_pq_tiny_sample")
    ann_index.build_ann_index(
        spark, emb, out, dim=DIM,
        rh_n_bits=N_BITS, rh_n_tables=N_TABLES,
        ivf_k=IVF_K, ivf_n_iter=2,
        store_vectors=False, pq=True, pq_m=PQ_M, pq_codes=PQ_CODES,
        pq_n_iter=2, pq_train_sample=1e-9,
    )
    from clip_as_service_spark.sources.tables import IndexStorage

    store = IndexStorage(out)
    assert store.read(spark, "pq_codebooks").count() > 0
    n_corpus = emb.count()
    # every corpus row made it into both tables
    assert store.read(spark, "ivf_cells").count() == n_corpus
    assert (
        store.read(spark, "rh_buckets").select("vec_id").distinct().count()
        == n_corpus
    )
    # and the exact path still answers
    got = ann_index.rh_topk_stored(spark, out, queries, k=K, rerank=None)
    assert _rows(got)
