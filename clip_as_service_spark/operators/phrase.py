"""Positional phrase search — exact token-sequence matching over a
positional token table, the classic phrase-query plan of a fulltext engine.

The reference has no phrase operator (its retrieval is embedding-based);
this extends the BM25 index family the way every production fulltext engine
does: store token positions, intersect posting lists with position
alignment. Implemented as chained equi-joins on (doc, aligned-start):

    term_0 candidates (doc, pos)
      ⋈ term_1 shifted to (doc, pos−1)
      ⋈ term_2 shifted to (doc, pos−2) …

Scale shape: every join is an equi-join keyed on (doc_id, aligned start
position) — a near-unique key, so no skew; each successive join only
SHRINKS the candidate set (the rarest-term-first ordering a planner would
pick is a straightforward extension). No window functions, no cross joins,
no Python. At rest, the positional table is stored term-partitioned exactly
like the block index (shard = pmod(xxhash64(term))), so the per-term
filters below become partition pruning + row-group skipping rather than
full scans — phrase_positions itself is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_positions(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """→ (id, pos, term): 0-based token positions (split on single space —
    the documents-table convention; the index path would emit positions from
    the byte-identity tokenizer the same way)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )


def build_positions_index(
    spark,
    pages_with_ids: DataFrame,
    store,
    n_shards: int,
    text_col: str = "text",
) -> None:
    """Persist a term-sharded POSITIONAL table next to the block index:
    (term, doc_id, pos) partitioned by shard = pmod(xxhash64(term)) and
    sorted by term within files — the same two-level pruning the block scan
    gets (PLANS.md §2), so an indexed phrase query reads only its terms'
    shards/row-groups. Tokens come from the byte-identity tokenizer (the
    index vocabulary), not split-on-space."""
    from ..functions.text import tokenize_udf

    toks = pages_with_ids.select(
        "doc_id", F.posexplode(tokenize_udf(F.col(text_col))).alias("pos", "term")
    )
    out = toks.select(
        "term",
        F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int").alias("shard"),
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
    )
    target = max(pages_with_ids.sparkSession.sparkContext.defaultParallelism * 2, n_shards)
    splits = max(1, -(-target // n_shards))
    out = out.repartition(
        target, F.col("shard"), F.pmod(F.xxhash64("term"), F.lit(splits))
    ).sortWithinPartitions("shard", "term", "doc_id", "pos")
    store.write(out, "positions", partition_by=["shard"])


def phrase_search_indexed(
    spark, index_dir: str, phrase: str, k: int | None = None
) -> DataFrame:
    """→ (doc_id, start_pos) occurrences of `phrase` via the PERSISTED
    positional table: the scan is pruned to the phrase terms' shards
    (driver-side xxhash64) and to their row groups (term min/max stats) —
    at 10^12 docs a phrase query touches only its own posting lists, the
    same access path as BM25 blocks. Requires build_index(...,
    positions=True). The phrase is tokenized with the index's vocabulary's
    WORD pipeline (positions always store word tokens — BPE splits words
    into pieces, which would make 'adjacent' mean sub-word adjacency)."""
    from ..sources.tables import IndexStorage
    from ..functions.hashing import term_shard
    from ..textnorm import tokenize_words

    store = IndexStorage(index_dir)
    meta = store.read_meta()
    terms = tokenize_words(phrase)
    if not terms:
        return spark.createDataFrame([], "id long, start_pos int")
    shards = sorted({term_shard(t, meta["n_shards"]) for t in terms})
    # rarest-term-first planning: pull df for just the phrase terms from the
    # term dictionary (|phrase| rows collected; the termdf scan prunes by
    # the term predicate's row-group stats). Word-mode only — a BPE index's
    # termdf keys are BPE ids, while positions always store word tokens.
    term_df: dict[str, int] = {}
    if store.exists("termdf") and meta.get("term_mode", "word") == "word":
        term_df = {
            r["term"]: int(r["df"])
            for r in store.read(spark, "termdf")
            .where(F.col("term").isin(sorted(set(terms))))
            .select("term", "df")
            .collect()
        }
    pos = (
        store.read(spark, "positions")
        .where(F.col("shard").isin(shards) & F.col("term").isin(sorted(set(terms))))
        .select(F.col("doc_id").alias("id"), "pos", "term")
    )
    if store.exists("deleted_docs"):
        # merge-on-read doc deletes (index_build.delete_docs): tombstoned
        # docs drop out of phrase results the same way they drop out of
        # BM25 ranking; snippets inherit via the masked results page
        tomb = (
            store.read(spark, "deleted_docs")
            .select(F.col("doc_id").alias("id"))
            .distinct()
        )
        pos = pos.join(F.broadcast(tomb), "id", "left_anti")
    out = phrase_positions(pos, terms, term_df=term_df)
    # deterministic truncation (same order as IndexReader.phrase) — a bare
    # limit on an unordered plan returns an arbitrary, plan-dependent subset
    return out.orderBy("id", "start_pos").limit(k) if k is not None else out


def snippet_hits(
    results: DataFrame,
    query_terms: DataFrame,
    positions: DataFrame,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ (query_id, doc_id, pos): earliest matching-term token position per
    result row — the position source for snippet windows.

    ``results``: (query_id, doc_id) rows (e.g. a top-k result page);
    ``query_terms``: (query_id, term); ``positions``: (id, pos, term) —
    storage-agnostic like phrase_positions: feed token_positions for ad-hoc
    tables or the PERSISTED positions table for indexed corpora (where the
    per-term filters prune shards/row-groups). Join work is keyed on
    (doc_id, term) and bounded by the result page × query terms — documents
    outside the page are never touched. Result docs containing none of the
    query's terms drop out (inner join — a BM25 hit always contains ≥1
    term, but callers merging external result pages should left-join if
    they need row preservation).

    ``carry_cols``: result-page columns (e.g. rank, score) to carry through
    the aggregation — per-(query, doc) constants, taken with F.first — so
    callers never re-join (and re-execute) the result-page subplan."""
    pos = positions.select(
        F.col("id").alias("doc_id"), "pos", "term"
    )
    return (
        results.select("query_id", "doc_id", *carry_cols)
        .join(query_terms, "query_id")
        .join(pos, ["doc_id", "term"])
        .groupBy("query_id", "doc_id")
        .agg(
            F.min("pos").alias("pos"),
            *[F.first(c).alias(c) for c in carry_cols],
        )
    )


def attach_snippets(
    hits: DataFrame,
    documents: DataFrame,
    before: int = 3,
    width: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_hits: bool = True,
) -> DataFrame:
    """→ hits + ``snippet``: a ``width``-token window starting ``before``
    tokens ahead of each hit position. The text column is read ONCE, for
    exactly the hit docs: hits (a result page — small by construction) are
    broadcast against the documents table, so a k=10 page over 10^6 queries
    joins 10^7 doc rows out of the corpus, never rescanning documents per
    term. Tokens split on single space (the documents-table convention —
    the indexed twin re-tokenizes with the index vocabulary instead).

    ``broadcast_hits``: the default hint is right for interactive result
    pages (k·|queries| rows). A bulk re-scoring batch whose page set
    exceeds the driver/broadcast budget should pass False — the hint is
    dropped and AQE picks the join strategy from the OBSERVED size at
    runtime (broadcast if it still fits, shuffle join if not)."""
    docs = documents.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    start = F.greatest(F.col("pos") - before, F.lit(0))
    return (
        docs.join(F.broadcast(hits) if broadcast_hits else hits, "doc_id")
        .withColumn(
            "snippet",
            F.array_join(
                F.slice(F.split(F.col("_text"), " "), start + 1, width), " "
            ),
        )
        .drop("_text")
    )


def snippets_indexed(
    spark,
    index_dir: str,
    results: DataFrame,
    queries: DataFrame,
    documents: DataFrame,
    before: int = 3,
    width: int = 8,
    q_text_col: str = "qtext",
    broadcast_hits: bool = True,
) -> DataFrame:
    """→ (query_id, doc_id, pos, snippet) for a result page, reading term
    positions from the PERSISTED positions table: the scan prunes to the
    union of all queries' terms (shard dirs + term row groups), and the
    text column is windowed once via attach_snippets — a results page never
    re-scans documents per term. Tokenization matches the index vocabulary
    (tokenize_words), including for the window slicing.

    Plan shape (load-bearing): documents joins the (small) hit set FIRST
    and the tokenize UDF is projected ABOVE that join, so only the
    k·|queries| surviving rows ever cross the Python boundary — the corpus
    is never tokenized per results page (reference analog: matches are
    windowed per result, never per corpus — executors/helper.py:120-124).
    Pinned by a plan-position test (ArrowEvalPython above the join).

    ``broadcast_hits``: see attach_snippets — False drops the hint for
    oversized page batches and lets AQE choose from the runtime size."""
    from ..functions.hashing import term_shard
    from ..functions.text import tokenize_udf
    from ..sources.tables import IndexStorage
    from ..textnorm import tokenize_words

    store = IndexStorage(index_dir)
    meta = store.read_meta()
    q_rows = queries.select("query_id", q_text_col).collect()
    qt = [
        (int(r["query_id"]), t)
        for r in q_rows
        for t in sorted(set(tokenize_words(r[q_text_col])))
    ]
    if not qt:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, pos int, snippet string"
        )
    terms = sorted({t for _, t in qt})
    shards = sorted({term_shard(t, meta["n_shards"]) for t in terms})
    pos = (
        store.read(spark, "positions")
        .where(F.col("shard").isin(shards) & F.col("term").isin(terms))
        .select(F.col("doc_id").alias("id"), "pos", "term")
    )
    query_terms = spark.createDataFrame(qt, "query_id long, term string")
    hits = snippet_hits(results, query_terms, pos)
    docs = documents.select("doc_id", F.col("text").alias("_text"))
    start = F.greatest(F.col("pos") - before, F.lit(0))
    # join BEFORE tokenizing: the UDF projection sits above the join, so it
    # evaluates only over rows that survived the hit semi-join — never the
    # whole corpus (Catalyst does not push Python UDF projections through
    # joins, so writing the plan in this order IS the guarantee)
    joined = docs.join(
        F.broadcast(hits) if broadcast_hits else hits, "doc_id"
    )
    return joined.select(
        "query_id",
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(
            F.slice(tokenize_udf(F.col("_text")), start + 1, width), " "
        ).alias("snippet"),
    )


def phrase_positions(
    positions: DataFrame,
    phrase_terms: list[str],
    term_df: dict[str, int] | None = None,
) -> DataFrame:
    """→ (id, start_pos) one row per exact occurrence of the token sequence.

    Empty phrase → empty result (validation short-circuit, P5).

    RAREST-TERM-FIRST planning: when ``term_df`` (term → document frequency)
    is given, joins run in ascending-df order — term i contributes
    (id, pos−i) regardless of join order, so the intersection is
    order-independent but the INTERMEDIATE size is bounded by the rarest
    term's postings instead of the head term's ("the quick zyzzyva" starts
    from zyzzyva's list, not `the`'s). A term ABSENT from term_df sorts
    FIRST (df = 0): the map comes from the index dictionary, so absence
    means the term occurs nowhere — its empty posting list short-circuits
    every later join (IndexReader.phrase makes the same choice by counting
    fetched rows). Correctness note: a negative aligned start from a
    non-first rare term cannot survive — term 0 joins with shift 0, and
    its positions are all ≥ 0."""
    if not phrase_terms:
        spark = positions.sparkSession
        return spark.createDataFrame([], "id long, start_pos int")
    order = list(range(len(phrase_terms)))
    if term_df:
        order.sort(key=lambda i: (term_df.get(phrase_terms[i], 0), i))
    i0 = order[0]
    cur = positions.filter(F.col("term") == phrase_terms[i0]).select(
        "id", (F.col("pos") - i0).alias("start_pos")
    )
    for i in order[1:]:
        nxt = positions.filter(F.col("term") == phrase_terms[i]).select(
            "id", (F.col("pos") - i).alias("start_pos")
        )
        cur = cur.join(nxt, ["id", "start_pos"])
    return cur.select("id", F.col("start_pos").cast("int").alias("start_pos"))
