"""Random-hyperplane LSH (multi-table, multi-probe) semantics over the
driver's embeddings table: candidates are re-ranked by EXACT cosine, results
dedupe across tables, and recall stacks with table count."""

from __future__ import annotations

import pytest

from clip_as_service_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"
K = 10
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    from pyspark.sql import functions as F

    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _by_query(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(r)
    return out


def test_rh_topk_is_exact_on_candidates(spark, emb, queries):
    """Returned cosines must equal the brute-force cosine for the same
    (query, vec) pair — LSH restricts candidates, never perturbs scores."""
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in sim.cosine_topk(emb, queries, k=500).collect()
    }
    got = sim.rh_bucketed_topk(
        emb, queries, k=K, n_bits=8, dim=DIM, n_tables=4
    ).collect()
    assert got, "no candidates at all"
    for r in got:
        assert r["cosine"] == pytest.approx(
            exact[(r["query_id"], r["vec_id"])], rel=1e-12
        )


def test_rh_topk_no_duplicates_and_ranked(spark, emb, queries):
    got = _by_query(
        sim.rh_bucketed_topk(emb, queries, k=K, n_bits=6, dim=DIM, n_tables=8)
    )
    for q, rows in got.items():
        ids = [r["vec_id"] for r in rows]
        assert len(ids) == len(set(ids)), f"duplicate vec_ids for query {q}"
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_rh_recall_stacks_with_tables(spark, emb, queries):
    def recall(n_tables):
        exact = _by_query(sim.cosine_topk(emb, queries, k=K))
        got = _by_query(
            sim.rh_bucketed_topk(
                emb, queries, k=K, n_bits=8, dim=DIM, n_tables=n_tables
            )
        )
        num = den = 0
        for q, rows in exact.items():
            hits = {r["vec_id"] for r in rows}
            cand = {r["vec_id"] for r in got.get(q, [])}
            num += len(hits & cand)
            den += len(hits)
        return num / den

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 >= 0.5, f"8-table recall collapsed: {r8}"


def test_rh_deterministic(spark, emb, queries):
    a = sorted(
        map(
            tuple,
            sim.rh_bucketed_topk(emb, queries, k=K, n_bits=8, dim=DIM).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sim.rh_bucketed_topk(emb, queries, k=K, n_bits=8, dim=DIM).collect(),
        )
    )
    assert a == b


def test_ivf_topk_probes_and_exact_scores(spark, emb, queries):
    """IVF: (a) returned cosines are the true cosines (exact re-rank within
    probed cells); (b) every returned vec belongs to one of the query's
    nprobe probed cells; (c) recall grows with nprobe (nprobe=n_cells ==
    brute force)."""
    from pyspark.sql import functions as F

    from clip_as_service_spark.plans.driver_queries import _ivf_centroids

    cents = _ivf_centroids(spark, SF_DIR)
    n_cells = cents.count()

    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in sim.cosine_topk(emb, queries, k=1_000_000).collect()
    }
    got = sim.ivf_topk(emb, queries, cents, k=K, nprobe=2).collect()
    assert len(got) > 0
    for r in got:
        assert r["cosine"] == pytest.approx(
            exact[(r["query_id"], r["vec_id"])], rel=1e-12
        )

    # probing ALL cells must reproduce the exact brute-force top-k
    full = sim.ivf_topk(emb, queries, cents, k=K, nprobe=n_cells)
    brute = sim.cosine_topk(emb, queries, k=K)
    got_full = {
        (r["query_id"], r["rank"]): r["vec_id"] for r in full.collect()
    }
    got_brute = {
        (r["query_id"], r["rank"]): r["vec_id"] for r in brute.collect()
    }
    assert got_full == got_brute

    # vectors returned at nprobe=2 are a subset of the nprobe=all candidates
    ids_2 = {(r["query_id"], r["vec_id"]) for r in got}
    ids_all = {
        (r["query_id"], r["vec_id"])
        for r in sim.ivf_topk(emb, queries, cents, k=1_000_000, nprobe=n_cells).collect()
    }
    assert ids_2 <= ids_all


def test_kmeans_centroids_deterministic_and_better_quantizer(spark, emb, queries):
    """kmeans_centroids must be bit-deterministic across runs (seedless
    deterministic init + tie-broken assignment) and, as an IVF quantizer,
    must not lose to the label-centroid stand-in at the same nprobe on the
    deterministic fixture."""
    km1 = sim.kmeans_centroids(emb, k=8, n_iter=3)
    km2 = sim.kmeans_centroids(emb, k=8, n_iter=3)
    rows1 = sorted((r["cell_id"], tuple(r["centroid"])) for r in km1.collect())
    rows2 = sorted((r["cell_id"], tuple(r["centroid"])) for r in km2.collect())
    assert rows1 == rows2
    assert len(rows1) == 8

    from clip_as_service_spark.plans.driver_queries import _ivf_centroids

    def _sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    exact = _sets(sim.cosine_topk(emb, queries, k=K))

    def _recall(df):
        got = _sets(df)
        return sum(
            len(got.get(q, set()) & v) / len(v) for q, v in exact.items()
        ) / len(exact)

    lab = _ivf_centroids(spark, SF_DIR)
    r_lab = _recall(sim.ivf_topk(emb, queries, lab, k=K, nprobe=2))
    r_km = _recall(sim.ivf_topk(emb, queries, km1, k=K, nprobe=2))
    assert r_km >= r_lab


def test_kmeans_sampled_training_still_useful(spark, emb, queries):
    """Sampled quantizer training (the at-scale mode) must stay
    deterministic and still produce a working quantizer: ivf recall over
    sampled-trained cells within a sane margin of full-trained cells."""
    km_s1 = sim.kmeans_centroids(emb, k=8, n_iter=3, sample=0.5)
    km_s2 = sim.kmeans_centroids(emb, k=8, n_iter=3, sample=0.5)
    r1 = sorted((r["cell_id"], tuple(r["centroid"])) for r in km_s1.collect())
    r2 = sorted((r["cell_id"], tuple(r["centroid"])) for r in km_s2.collect())
    assert r1 == r2 and len(r1) == 8

    def _sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    exact = _sets(sim.cosine_topk(emb, queries, k=K))

    def _recall(df):
        got = _sets(df)
        return sum(
            len(got.get(q, set()) & v) / len(v) for q, v in exact.items()
        ) / len(exact)

    km_full = sim.kmeans_centroids(emb, k=8, n_iter=3)
    r_sampled = _recall(sim.ivf_topk(emb, queries, km_s1, k=K, nprobe=2))
    r_full = _recall(sim.ivf_topk(emb, queries, km_full, k=K, nprobe=2))
    assert r_sampled >= r_full - 0.3  # same ballpark, not degenerate
    assert r_sampled > 0


def test_rh_pairs_auto_n_bits_sizing(spark, emb):
    """n_bits=None must apply the documented sizing rule from a corpus
    count — asserted at two corpus sizes — and the resulting buckets must
    stay near target_bucket-sized (the whole point of the rule)."""
    from pyspark.sql import functions as F

    # the rule itself
    assert sim.auto_n_bits(10**9, 1000) == 20
    assert sim.auto_n_bits(500, 256) == 1
    assert sim.auto_n_bits(0) == 1

    # applied by default at two corpus sizes (target_bucket=32 so the two
    # sizes land on different n_bits at fixture scale)
    small = emb.filter(F.col("vec_id") < 100)
    for df, n_expect in ((emb, 500), (small, 100)):
        chosen: dict = {}
        out = sim.rh_cosine_pairs(
            df, threshold=0.3, dim=DIM, target_bucket=32, chosen_out=chosen
        )
        assert chosen["n"] == n_expect
        assert chosen["n_bits"] == sim.auto_n_bits(n_expect, 32)
        out.collect()  # plan executes at the auto size

        # per-bucket boundedness at the chosen bits (table 0)
        sizes = (
            df.select(
                sim._table_bucket(
                    F.col("embedding"), DIM, chosen["n_bits"], 0,
                    chosen["n_bits"] * 8, 42, None,
                ).alias("b")
            )
            .groupBy("b")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert sizes <= 8 * 32  # buckets stay near target size
