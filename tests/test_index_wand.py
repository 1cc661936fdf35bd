"""M2/M3/M4 tests: compressed index build, WAND exactness, resume, and
partition-invariance (SURVEY.md §7 hard parts 1-4)."""

from __future__ import annotations

import hashlib

import pytest

from clip_as_service_spark import fixtures
from clip_as_service_spark.operators import index_build, wand
from clip_as_service_spark.oracle import BM25Oracle
from clip_as_service_spark.sources.tables import IndexStorage

N_PAGES = 200
K = 10
# tiny thresholds so the salting path is exercised at fixture scale.
# doc_id_method: the oracle keys docs by row_number over url, so tests use
# dense_sorted (url-ordered, scale-safe — no single-partition window); the
# build default is input-order `dense`.
SALT_KW = dict(
    salt_cutoff=30, target_sublist=20, n_shards=4, doc_id_method="dense_sorted"
)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "index")
    pages = fixtures.pages_spark_df(spark, N_PAGES, partitions=6)
    index_build.build_index(spark, pages, out, **SALT_KW)
    return out


@pytest.fixture(scope="module")
def oracle():
    return BM25Oracle.from_pages(fixtures.make_pages(N_PAGES))


def _collect_topk(df):
    out = {}
    for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    return out


def _assert_matches_oracle(got, oracle):
    for q in fixtures.make_queries():
        expected = oracle.topk(q["text"], k=K)
        g = got.get(q["query_id"], [])
        assert [(r, d) for r, d, _ in g] == [(r, d) for r, d, _ in expected], (
            f"mismatch for {q}"
        )
        for (_, _, se), (_, _, sg) in zip(expected, g):
            assert sg == pytest.approx(se, rel=1e-12)


def test_wand_exact_topk(spark, index_dir, oracle):
    queries = fixtures.queries_spark_df(spark)
    got = _collect_topk(wand.search_topk(spark, index_dir, queries, k=K, mode="wand"))
    _assert_matches_oracle(got, oracle)


def test_wand_exact_topk_python_wand_fallback(spark, index_dir, oracle, monkeypatch):
    """The per-posting Python WAND branch (taken only past the in-task TAAT
    memory bound) must stay exact — force it by zeroing the crossover."""
    monkeypatch.setattr(wand, "_BATCH_TAAT_MAX_POSTINGS", 0)
    queries = fixtures.queries_spark_df(spark)
    got = _collect_topk(wand.search_topk(spark, index_dir, queries, k=K, mode="wand"))
    _assert_matches_oracle(got, oracle)


def test_auto_mode_routes_heavy_queries_exactly(spark, index_dir, oracle):
    """mode=auto with a tiny heavy threshold: head-term queries take the
    distributed exploded plan, tail queries take WAND — the union must be
    rank-identical to the oracle (routing changes physics, not results)."""
    queries = fixtures.queries_spark_df(spark)
    got = _collect_topk(
        wand.search_topk(
            spark, index_dir, queries, k=K, mode="auto", heavy_postings=50
        )
    )
    _assert_matches_oracle(got, oracle)


def test_exploded_exact_topk(spark, index_dir, oracle):
    queries = fixtures.queries_spark_df(spark)
    got = _collect_topk(
        wand.search_topk(spark, index_dir, queries, k=K, mode="exploded")
    )
    _assert_matches_oracle(got, oracle)


@pytest.mark.parametrize(
    ("engine", "strategy"),
    [("pyarrow", "taat"), ("pyarrow", "wand"), ("spark", "auto")],
)
def test_index_reader_interactive_exact(spark, index_dir, oracle, engine, strategy):
    reader = wand.IndexReader(spark, index_dir, engine=engine, strategy=strategy)
    for q in fixtures.make_queries()[:20]:
        expected = oracle.topk(q["text"], k=K)
        got = reader.search(q["text"], k=K)
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in expected]
        for (_, _, se), (_, _, sg) in zip(expected, got):
            assert sg == pytest.approx(se, rel=1e-12)
    # memoized term cursors answer repeat queries identically
    q0 = fixtures.make_queries()[0]
    assert reader.search(q0["text"], k=K) == reader.search(q0["text"], k=K)


def test_taat_early_stop_chunked_exact(spark, index_dir, oracle):
    """chunk_blocks=1 forces the early-stop machinery through many rounds
    (bound re-checks, mid-stream stop, phase-B decode of skipped blocks) —
    results must stay rank- and score-identical to the oracle."""
    from clip_as_service_spark.operators.wand import taat_topk
    from clip_as_service_spark.textnorm import tokenize_words

    reader = wand.IndexReader(None, index_dir, engine="pyarrow")
    for q in fixtures.make_queries()[:25]:
        terms = sorted(set(tokenize_words(q["text"])))
        rows = reader._fetch_rows(terms) if terms else []
        if not rows:
            continue
        got = taat_topk(
            rows, K, reader._bm25,
            n_docs=reader.meta["n_docs"], chunk_blocks=1,
        )
        expected = oracle.topk(q["text"], k=K)
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in expected], q
        for (_, _, se), (_, _, sg) in zip(expected, got):
            assert sg == pytest.approx(se, rel=1e-12)


def test_reader_caches_byte_bounded(spark, index_dir, oracle):
    """A long-lived reader over a broad query stream must keep BOTH caches
    (raw block rows + decoded terms) within their byte budgets and rotate
    the query log — while results stay exact after evictions."""
    # budgets are constructor-sizable (deployments size them to the shard's
    # head-term working set); tiny values force constant eviction here
    reader = wand.IndexReader(
        None, index_dir, engine="pyarrow",
        raw_cache_bytes=4096, decoded_cache_bytes=4096,
    )
    assert reader.RAW_CACHE_MAX_BYTES == 4096
    assert reader.DECODED_CACHE_MAX_BYTES == 4096
    reader.QUERY_LOG_MAX = 5
    queries = fixtures.make_queries()
    vocab = sorted(
        {t for q in queries for t in q["text"].split()}
    )
    for t in vocab:  # one-term queries: many distinct terms through search
        reader.search(t, k=K)
    assert reader._decoded_bytes <= reader.DECODED_CACHE_MAX_BYTES
    assert len(reader._decoded_cache) < len(vocab)  # eviction happened
    assert sum(reader._decoded_sizes.values()) == reader._decoded_bytes
    # raw cache: bounded up to the protected (current-query) terms
    assert len(reader._term_rows_cache) < len(vocab)
    assert sum(reader._raw_sizes.values()) == reader._raw_bytes
    assert set(reader._raw_sizes) == set(reader._term_rows_cache)
    assert len(reader.query_log) == 5  # rotated, oldest dropped
    # correctness after heavy eviction: full oracle rank+score identity
    for q in queries[:10]:
        got = reader.search(q["text"], k=K)
        expected = oracle.topk(q["text"], k=K)
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in expected]
        for (_, _, se), (_, _, sg) in zip(expected, got):
            assert sg == pytest.approx(se, rel=1e-12)


def test_reader_oversize_entry_never_sticks(spark, index_dir, oracle):
    """An entry whose size ALONE exceeds the cache budget must not be left
    resident after its query (r03 advisory: the while-loop emptied the cache
    then inserted it anyway, pinning the cache over budget). With a 1-byte
    budget EVERY entry is oversize: results stay exact, and both caches are
    empty between queries."""
    reader = wand.IndexReader(
        None, index_dir, engine="pyarrow",
        raw_cache_bytes=1, decoded_cache_bytes=1,
    )
    for q in fixtures.make_queries()[:10]:
        got = reader.search(q["text"], k=K)
        expected = oracle.topk(q["text"], k=K)
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in expected]
        assert reader._decoded_bytes == 0 and not reader._decoded_cache
        # zero-byte entries (terms with no postings) may stay — they cost
        # nothing; everything with actual payload must be gone
        assert reader._raw_bytes == 0
        assert all(not rows for rows in reader._term_rows_cache.values())


def test_reader_rejects_v1_index(spark, index_dir, tmp_path):
    """A v1 (raw-weight payload) index must be rejected loudly, not decoded
    into garbage scores."""
    import json
    import os
    import shutil

    old = str(tmp_path / "idx_v1")
    shutil.copytree(index_dir, old)
    meta_path = os.path.join(old, "_meta.json")
    meta = json.load(open(meta_path))
    meta["version"] = 1
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="block format"):
        wand.IndexReader(None, old, engine="pyarrow")


def test_salting_created_sublists(spark, index_dir):
    blocks = IndexStorage(index_dir).read(spark, "blocks")
    n_salted = blocks.filter("salt > 0").count()
    assert n_salted > 0, "salt_cutoff should have split head terms"


def test_build_log_lineage(spark, index_dir):
    rows = index_build.iter_build_log(spark, IndexStorage(index_dir))
    stages = {r["stage"] for r in rows}
    assert {"postings", "stats", "termdf", "blocks"} <= stages
    block_rows = [r for r in rows if r["stage"] == "blocks"]
    assert all(r["bytes"] is not None and r["bytes"] > 0 for r in block_rows)
    assert all(r["wall_ms"] >= 0 for r in rows)


def test_resume_after_kill(spark, tmp_path, oracle, monkeypatch):
    """Kill during stage 3 (termdf) → resume → identical results, earlier
    stages not rebuilt (north rule resumability)."""
    out = str(tmp_path / "idx_resume")
    pages = fixtures.pages_spark_df(spark, N_PAGES, partitions=6)

    original_write = IndexStorage.write

    def failing_write(self, df, table, partition_by=None):
        if table == "termdf":
            raise RuntimeError("simulated mid-build kill")
        return original_write(self, df, table, partition_by)

    monkeypatch.setattr(IndexStorage, "write", failing_write)
    with pytest.raises(RuntimeError, match="simulated"):
        index_build.build_index(spark, pages, out, **SALT_KW)
    monkeypatch.setattr(IndexStorage, "write", original_write)

    store = IndexStorage(out)
    assert store.exists("postings") and store.exists("stats")
    assert not store.exists("termdf")
    import os

    postings_mtime = os.path.getmtime(
        os.path.join(store.path("postings"), "_SUCCESS")
    )
    index_build.build_index(spark, pages, out, **SALT_KW)
    # stage 1 was NOT rebuilt on resume
    assert postings_mtime == os.path.getmtime(
        os.path.join(store.path("postings"), "_SUCCESS")
    )
    queries = fixtures.queries_spark_df(spark)
    got = _collect_topk(wand.search_topk(spark, out, queries, k=K, mode="wand"))
    _assert_matches_oracle(got, oracle)


def test_dense_ids_equal_row_number(spark):
    from clip_as_service_spark.operators.tokenize import assign_doc_ids

    pages = fixtures.pages_spark_df(spark, 300, partitions=5)
    dense_sorted = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(pages, "dense_sorted").select("url", "doc_id").collect()
    }
    rn = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(pages, "row_number").select("url", "doc_id").collect()
    }
    assert dense_sorted == rn
    assert sorted(dense_sorted.values()) == list(range(1, 301))
    # input-order dense: a permutation of 1..N, stable across repeat runs
    d1 = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(pages, "dense").select("url", "doc_id").collect()
    }
    d2 = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(pages, "dense").select("url", "doc_id").collect()
    }
    assert sorted(d1.values()) == list(range(1, 301))
    assert d1 == d2


def test_scale_safe_id_plans(spark):
    """Default + dense_sorted id assignment must contain NO global window and
    NO single-partition exchange (the row_number scale-killer)."""
    import inspect

    from clip_as_service_spark.operators.tokenize import assign_doc_ids

    sig = inspect.signature(index_build.build_index)
    assert sig.parameters["doc_id_method"].default == "dense"

    pages = fixtures.pages_spark_df(spark, 50, partitions=4)
    for method in ("dense", "dense_sorted"):
        plan = (
            assign_doc_ids(pages, method)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan, method
        assert "SinglePartition" not in plan, method


def test_hierarchical_merge_equals_single_build(spark, tmp_path):
    """Two partial builds merged ≡ one build over the union (hash doc ids)."""
    pages = fixtures.make_pages(N_PAGES)
    half = N_PAGES // 2

    def build(rows, out):
        df = spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        kw = {**SALT_KW, "doc_id_method": "hash"}
        index_build.build_index(spark, df, out, **kw)
        return out

    a = build(pages[:half], str(tmp_path / "part_a"))
    b = build(pages[half:], str(tmp_path / "part_b"))
    full = build(pages, str(tmp_path / "full"))
    merged = str(tmp_path / "merged")
    merge_kw = {k: v for k, v in SALT_KW.items() if k != "doc_id_method"}
    index_build.merge_indexes(spark, [a, b], merged, **merge_kw)

    queries = fixtures.queries_spark_df(spark)
    got_m = _collect_topk(wand.search_topk(spark, merged, queries, k=K))
    got_f = _collect_topk(wand.search_topk(spark, full, queries, k=K))
    assert got_m == got_f
    assert len(got_f) > 20


def test_merge_carries_and_validates_term_mode(spark, tmp_path):
    """Merging BPE-term partial indexes must produce a BPE-term merged index
    (term_mode rides the meta — a word-tokenizing query path against BPE
    terms would silently miss everything); mixing vocabularies must raise."""
    pages = fixtures.make_pages(40)
    half = 20

    def build(rows, out, **extra):
        df = spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        kw = {**SALT_KW, "doc_id_method": "hash", **extra}
        index_build.build_index(spark, df, out, **kw)
        return out

    a = build(pages[:half], str(tmp_path / "bpe_a"), term_mode="bpe")
    b = build(pages[half:], str(tmp_path / "bpe_b"), term_mode="bpe")
    w = build(pages[half:], str(tmp_path / "word_b"))  # word-mode part

    merged = str(tmp_path / "bpe_merged")
    merge_kw = {k: v for k, v in SALT_KW.items() if k != "doc_id_method"}
    index_build.merge_indexes(spark, [a, b], merged, **merge_kw)
    meta = IndexStorage(merged).read_meta()
    assert meta["term_mode"] == "bpe"

    # merged BPE index ≡ one BPE build over the union (reader tokenizes BPE
    # on both sides because term_mode rode the meta)
    full = build(pages, str(tmp_path / "bpe_full"), term_mode="bpe")
    r_merged = wand.IndexReader(None, merged, engine="pyarrow")
    r_full = wand.IndexReader(None, full, engine="pyarrow")
    hits = 0
    for q in fixtures.make_queries()[:6]:
        got = r_merged.search(q["text"], k=5)
        assert got == r_full.search(q["text"], k=5), q
        hits += len(got)
    assert hits > 0

    with pytest.raises(ValueError, match="term_mode"):
        index_build.merge_indexes(
            spark, [a, w], str(tmp_path / "bad_merge"), **merge_kw
        )


def test_index_bitwise_partition_invariance(spark, tmp_path, index_dir):
    """Same input at different parallelism → bit-identical index content."""
    out2 = str(tmp_path / "idx_p2")
    pages = fixtures.pages_spark_df(spark, N_PAGES, partitions=2)
    index_build.build_index(spark, pages, out2, **SALT_KW)

    def digest(d):
        blocks = IndexStorage(d).read(spark, "blocks")
        rows = sorted(
            (
                r["term"], r["salt"], r["block_id"], r["n"], r["first_doc"],
                r["last_doc"], repr(r["max_w"]), repr(r["idf"]),
                bytes(r["docs"]).hex(), bytes(r["tfs"]).hex(),
                bytes(r["dls"]).hex(),
            )
            for r in blocks.collect()
        )
        h = hashlib.sha256()
        for row in rows:
            h.update(repr(row).encode())
        return h.hexdigest()

    assert digest(index_dir) == digest(out2)
