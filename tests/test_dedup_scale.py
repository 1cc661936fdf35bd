"""Scale-shape regression tests for the dedup operators (VERDICT r02 #1/#5):

1. the candidate-driven Jaccard verify must never execute the unbounded
   shingle self-join — its join work is asserted ≪ df² on a fixture where
   ~10³ docs share one boilerplate shingle;
2. the SimHash Hamming join must band over DISTINCT fingerprints, so a
   degenerate hot group (50 empty-ish docs, identical fingerprint) is ONE
   join row per band, not a quadratic bucket.
"""

from __future__ import annotations

from clip_as_service_spark.operators import dedup


def _py_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_candidate_driven_jaccard_is_bounded(spark):
    """~10³ docs all share the 'boiler plate text' shingle. The unbounded
    self-join would produce n·(n−1)/2 ≈ 5·10⁵ rows for that shingle alone;
    the candidate-driven verify must touch only the candidate docs'
    shingles. Σ inter == the exact number of rows the verify join produced,
    so asserting it small IS asserting the compute bound."""
    n = 1000
    rows = [(i, f"boiler plate text unique{i} word{i} tail{i}") for i in range(n)]
    texts = dict(rows)
    df = spark.createDataFrame(rows, "id long, text string")
    cand_pairs = [(1, 2), (10, 11), (500, 501)]
    cand = spark.createDataFrame(cand_pairs, "id_a long, id_b long")

    sh = dedup.shingles(df, "id", "text", k=3)
    inter_rows = dedup.candidate_intersections(sh, cand).collect()
    total_join_rows = sum(r["inter"] for r in inter_rows)
    max_possible = sum(len(_py_shingles(texts[a])) for a, _ in cand_pairs)
    assert total_join_rows <= max_possible  # ≤ Σ|shingles(cand docs)| = 12
    assert total_join_rows < n * (n - 1) / 100  # ≪ df² ≈ 5·10⁵

    got = {(r["id_a"], r["id_b"]): r["inter"] for r in inter_rows}
    exp = {
        (a, b): len(_py_shingles(texts[a]) & _py_shingles(texts[b]))
        for a, b in cand_pairs
    }
    assert got == {k: v for k, v in exp.items() if v > 0}

    out = dedup.ngram_jaccard_pairs(
        df, "id", "text", k=3, threshold=0.01, candidates=cand
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == set(cand_pairs)
    for r in out:
        sa, sb = _py_shingles(texts[r["id_a"]]), _py_shingles(texts[r["id_b"]])
        assert r["jaccard"] == round(len(sa & sb) / len(sa | sb), 6)


def test_candidate_jaccard_equals_unbounded_filtered(spark):
    """Candidate-driven verify ≡ unbounded verify semi-joined to candidates
    (the pre-fix semantics) on a mixed near-dup fixture."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "totally different content about spark engines and parquet"),
        (4, "totally different content about spark engines and arrow"),
        (5, "short"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4), (0, 3), (5, 6)],
        "id_a long, id_b long",
    )
    bounded = dedup.ngram_jaccard_pairs(
        df, "id", "text", k=3, threshold=0.1, candidates=cand
    ).collect()
    unbounded = dedup.ngram_jaccard_pairs(
        df, "id", "text", k=3, threshold=0.1
    ).collect()
    cand_set = {(0, 1), (0, 2), (1, 2), (3, 4), (0, 3), (5, 6)}
    exp = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in unbounded
        if (r["id_a"], r["id_b"]) in cand_set
    }
    assert {(r["id_a"], r["id_b"], r["jaccard"]) for r in bounded} == exp


def test_candidate_orientation_normalized(spark):
    """Caller-supplied pairs in the WRONG orientation (id_a > id_b), as
    self-pairs, or duplicated both ways must normalize to one (id_a < id_b)
    row — the output convention dedup_survivors' anti-join on id_b needs."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    messy = spark.createDataFrame(
        [(1, 0), (0, 1), (2, 0), (1, 1)],  # reversed, dup-both-ways, self
        "id_a long, id_b long",
    )
    clean = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    got_m = dedup.ngram_jaccard_pairs(
        df, "id", "text", k=3, threshold=0.1, candidates=messy
    ).collect()
    got_c = dedup.ngram_jaccard_pairs(
        df, "id", "text", k=3, threshold=0.1, candidates=clean
    ).collect()
    as_set = lambda rs: {(r["id_a"], r["id_b"], r["jaccard"]) for r in rs}
    assert as_set(got_m) == as_set(got_c)
    assert all(r["id_a"] < r["id_b"] for r in got_m)


def test_connected_components_transitive(spark):
    """Chained pairs must cluster transitively to the min id; nodes with no
    pair stay singleton clusters; convergence must beat max_iter on a chain
    longer than one hop."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 11), (5, 6), (8, 9), (9, 10)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 6, 8, 9, 10, 11, 20]], "id long")
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, nodes=nodes).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 11: 1,
        5: 5, 6: 5,
        8: 8, 9: 8, 10: 8,
        20: 20,
    }
    # greedy pairwise (q_dedup_survivors policy) would keep {1,5,8,20} too
    # here, but the cluster form also yields the cluster membership itself
    survivors = {i for i, c in got.items() if i == c}
    assert survivors == {1, 5, 8, 20}


def test_connected_components_long_chain_and_nonconvergence(spark):
    """A 40-link chain (diameter 39) must fully collapse given enough
    rounds, and must FAIL LOUDLY — never silently return split clusters —
    when max_iter is too small."""
    import pytest as _pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(chain, max_iter=50).collect()
    }
    assert set(got.values()) == {0}
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=3).collect()


def test_cc_star_equals_minlabel(spark):
    """algorithm='star' must produce exactly the min-label clustering on a
    mixed graph (chains, a triangle, singletons)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 11), (5, 6), (8, 9), (9, 10), (10, 8), (2, 1)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 5, 6, 8, 9, 10, 11, 20]], "id long"
    )
    want = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, nodes=nodes).collect()
    }
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(
            pairs, nodes=nodes, algorithm="star"
        ).collect()
    }
    assert got == want


def test_cc_star_chain_converges_in_log_rounds(spark):
    """The adversarial case min-label is wrong for: a 100-link chain
    (diameter 100) must converge within ~2·log2(n) alternation rounds —
    max_iter=16 would raise otherwise (log2(101) ≈ 6.7)."""
    n = 101
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(
            chain, max_iter=16, algorithm="star"
        ).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == n


def test_simhash_distinct_fp_banding_degenerate(spark):
    """50 empty-ish docs share one all-identical fingerprint: the banded
    join must see ONE fingerprint-pair row for the group (compute bound);
    the 50·49/2 Hamming-0 doc pairs are expansion OUTPUT and must all be
    emitted (semantics unchanged)."""
    rows = [(i, "") for i in range(50)] + [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "the quick brown fox jumps over the lazy cat"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    fp = dedup.simhash_fingerprints(df, "id", "text", n_bits=60)
    assert fp.select("simhash").distinct().count() <= 3

    fpp = dedup.fp_candidate_pairs(fp, n_bits=60, n_bands=4, max_hamming=3)
    fpp_rows = fpp.collect()
    # the hot group contributes exactly one (s, s, 0) row — never 50²/2
    assert len(fpp_rows) <= 3
    assert sum(1 for r in fpp_rows if r["sh_a"] == r["sh_b"]) >= 1

    pairs = dedup.simhash_candidate_pairs(
        df, "id", "text", n_bits=60, n_bands=4
    ).collect()
    zero = {(r["id_a"], r["id_b"]) for r in pairs if r["hamming"] == 0}
    expected_zero = {(a, b) for a in range(50) for b in range(a + 1, 50)}
    assert expected_zero <= zero
    # normalized ordering + dedup: every pair once, id_a < id_b
    seen = [(r["id_a"], r["id_b"]) for r in pairs]
    assert len(seen) == len(set(seen))
    assert all(a < b for a, b in seen)
