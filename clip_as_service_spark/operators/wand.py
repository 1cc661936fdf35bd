"""Query path over the compressed index: exact top-k via block-max WAND —
the *search* verb (SURVEY.md §3.3).

Reference semantics: per-shard local top-k then global merge
(retriever.md:178-225 ANY/ALL polling); exactly `limit` results
(tests/test_search.py:41-44); descending order (tests/test_ranker.py:34-35).

Two physical strategies, same results:

- ``search_topk(..., mode="wand")`` — per-query document-at-a-time WAND with
  a bounded min-heap inside applyInPandas. Blocks are decoded lazily; whole
  blocks are skipped via last_doc (advance) and pruning uses admissible
  term-level upper bounds (idf · max block max_w), inflated by 1+1e-9 so
  float-rounding of the UB sum can never prune a true top-k doc → EXACT.
  The low-latency interactive path.

- ``search_topk(..., mode="exploded")`` — decode every candidate block via
  mapInPandas into (term, doc_id, w) rows, broadcast-join query idfs,
  ordered-fold sum, window top-k. Shuffle-heavy but fully distributed; the
  high-QPS batch path (thousands of queries amortize one index scan).

Both prune the blocks scan to the query terms' shards (directory-level
partition pruning on shard=pmod(xxhash64(term), n_shards)) and terms
(parquet row-group stats on the term column).

Determinism: scores are bit-identical to oracle.BM25Oracle — per-doc
partials idf·w summed in ascending-term order; tie-break (score DESC,
doc_id ASC).
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.codec import vbyte_decode
from ..sources.tables import IndexStorage
from .bm25 import query_terms

TOPK_SCHEMA = "query_id int, rank int, doc_id long, score double"
_UB_SAFETY = 1.0 + 1e-9


def _candidate_blocks(
    spark: SparkSession, store: IndexStorage, qt_idf: DataFrame, n_shards: int
) -> DataFrame:
    """blocks scan pruned to the query terms (shard dirs + term row-groups)."""
    terms = [r["term"] for r in qt_idf.select("term").distinct().collect()]
    if not terms:
        return None
    shards = sorted(
        {
            r["shard"]
            for r in spark.createDataFrame([(t,) for t in terms], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int").alias("shard"))
            .distinct()
            .collect()
        }
    )
    blocks = store.read(spark, "blocks")
    return blocks.where(
        F.col("shard").isin(shards) & F.col("term").isin(terms)
    )


def search_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    mode: str = "wand",
) -> DataFrame:
    """→ (query_id, rank, doc_id, score); queries(query_id, text)."""
    store = IndexStorage(index_dir)
    meta = store.read_meta()
    stats = store.read(spark, "stats").collect()[0]
    qt = query_terms(queries)
    termdf = store.read(spark, "termdf")
    # query side is tiny — broadcast it into the dictionary lookup
    qt_idf = (
        F.broadcast(qt).join(termdf, "term").select("query_id", "term", "idf")
    )
    cand = _candidate_blocks(spark, store, qt_idf, meta["n_shards"])
    if cand is None:
        return spark.createDataFrame([], TOPK_SCHEMA)
    cand = attach_env(cand, float(stats["avgdl"]), meta["k1"], meta["b"])

    if mode == "wand":
        joined = cand.join(F.broadcast(qt_idf), "term")
        out = joined.groupBy("query_id").applyInPandas(
            _make_wand(k), schema=TOPK_SCHEMA
        )
        return out
    if mode == "exploded":
        return _search_exploded(cand, qt_idf, k)
    raise ValueError(f"unknown mode {mode!r}")


# ---------------------------------------------------------------------------
# exploded (distributed batch) path
# ---------------------------------------------------------------------------


def _search_exploded(cand: DataFrame, qt_idf: DataFrame, k: int) -> DataFrame:
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, docs, ws = [], [], []
            for row in pdf.itertuples(index=False):
                n = row.n
                gaps = vbyte_decode(row.docs, n)
                doc_ids = np.cumsum(gaps)
                w = _weights_from_block(row, n)
                terms.append(np.repeat(np.array([row.term], dtype=object), n))
                docs.append(doc_ids)
                ws.append(w)
            if not terms:
                yield pd.DataFrame({"term": [], "doc_id": [], "w": []})
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs),
                    "w": np.concatenate(ws),
                }
            )

    decoded = cand.select("term", "n", "docs", "tfs", "dls", "k1", "b", "avgdl")
    postings = decoded.mapInPandas(_decode, schema="term string, doc_id long, w double")
    partials = postings.join(F.broadcast(qt_idf), "term").select(
        "query_id",
        "doc_id",
        "term",
        (F.col("idf") * F.col("w")).alias("partial"),
    )
    scores = (
        partials.groupBy("query_id", "doc_id")
        .agg(F.collect_list(F.struct("term", "partial")).alias("parts"))
        .select(
            "query_id",
            "doc_id",
            F.aggregate(
                F.array_sort("parts"),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x["partial"],
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _weights_from_block(row, n: int) -> np.ndarray:
    """Recompute float64 impact weights from the block's tf/dl payloads.

    Stored max_w was computed from the same arrays at build time, so bounds
    are admissible by construction; k1/b/avgdl come in via the closure-free
    _BlockEnv columns attached before the join (see _attach_env)."""
    from ..functions.codec import impact_weights

    tfs = vbyte_decode(row.tfs, n)
    dls = vbyte_decode(row.dls, n)
    return impact_weights(tfs, dls, row.avgdl, row.k1, row.b)


def attach_env(cand: DataFrame, avgdl: float, k1: float, b: float) -> DataFrame:
    return (
        cand.withColumn("avgdl", F.lit(avgdl))
        .withColumn("k1", F.lit(k1))
        .withColumn("b", F.lit(b))
    )


# ---------------------------------------------------------------------------
# WAND (document-at-a-time, bounded min-heap) path
# ---------------------------------------------------------------------------


class _Cursor:
    __slots__ = (
        "term", "idf", "ub", "blocks", "bi", "pos",
        "doc_ids", "ws", "env",
    )

    def __init__(self, term: str, idf: float, blocks: list, env: tuple):
        # blocks: list of row namedtuples sorted by first_doc
        self.term = term
        self.idf = idf
        self.env = env
        self.blocks = blocks
        self.ub = idf * max(b.max_w for b in blocks)
        self.bi = 0
        self.pos = 0
        self._load_block()

    def _load_block(self):
        row = self.blocks[self.bi]
        n = row.n
        gaps = vbyte_decode(row.docs, n)
        self.doc_ids = np.cumsum(gaps)
        tfs = vbyte_decode(row.tfs, n)
        dls = vbyte_decode(row.dls, n)
        avgdl, k1, b = self.env
        from ..functions.codec import impact_weights

        self.ws = impact_weights(tfs, dls, avgdl, k1, b)
        self.pos = 0

    @property
    def doc(self) -> int:
        return int(self.doc_ids[self.pos])

    @property
    def exhausted(self) -> bool:
        return self.bi >= len(self.blocks)

    def partial(self) -> float:
        return self.idf * float(self.ws[self.pos])

    def advance(self) -> bool:
        """next posting; False when exhausted."""
        self.pos += 1
        if self.pos >= len(self.doc_ids):
            self.bi += 1
            if self.exhausted:
                return False
            self._load_block()
        return True

    def seek(self, target: int) -> bool:
        """advance to first doc >= target, skipping blocks via last_doc."""
        while self.blocks[self.bi].last_doc < target:
            self.bi += 1
            if self.exhausted:
                return False
            self.pos = -1  # mark: block not loaded
        if self.pos == -1:
            self._load_block()
        idx = int(np.searchsorted(self.doc_ids, target, side="left"))
        if idx >= len(self.doc_ids):
            # target fell in a gap past this block's tail
            self.bi += 1
            if self.exhausted:
                return False
            self._load_block()
            return True
        self.pos = idx
        return True


def _make_wand(k: int):
    def _wand(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {"query_id": [], "rank": [], "doc_id": [], "score": []}
            )
        query_id = int(pdf["query_id"].iloc[0])
        avgdl = float(pdf["avgdl"].iloc[0])
        k1 = float(pdf["k1"].iloc[0])
        b = float(pdf["b"].iloc[0])
        env = (avgdl, k1, b)

        cursors: list[_Cursor] = []
        for (term, salt), grp in pdf.groupby(["term", "salt"], sort=False):
            rows = sorted(grp.itertuples(index=False), key=lambda r: r.first_doc)
            cursors.append(_Cursor(term, float(rows[0].idf), rows, env))

        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
        alive = [c for c in cursors if not c.exhausted]
        while alive:
            alive.sort(key=lambda c: c.doc)
            theta = heap[0][0] if len(heap) >= k else None
            # pivot: smallest prefix whose UB sum could reach theta
            acc = 0.0
            pivot = None
            for i, c in enumerate(alive):
                acc += c.ub
                if theta is None or acc * _UB_SAFETY >= theta:
                    pivot = i
                    break
            if pivot is None:
                break  # no doc can make the heap
            pivot_doc = alive[pivot].doc
            if alive[0].doc == pivot_doc:
                # fully score pivot_doc: ascending-term float64 fold
                parts = []
                for c in alive:
                    if c.doc != pivot_doc:
                        break
                    parts.append((c.term, c.partial()))
                parts.sort(key=lambda p: p[0])
                score = 0.0
                for _, p in parts:
                    score += p
                entry = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry > heap[0]:
                    heapq.heapreplace(heap, entry)
                for c in alive:
                    if c.doc == pivot_doc:
                        c.advance()
                alive = [c for c in alive if not c.exhausted]
            else:
                # advance the first cursor (smallest doc) to >= pivot_doc
                c = alive[0]
                c.seek(pivot_doc)
                alive = [x for x in alive if not x.exhausted]

        result = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return pd.DataFrame(
            {
                "query_id": np.full(len(result), query_id, dtype=np.int64),
                "rank": np.arange(1, len(result) + 1, dtype=np.int64),
                "doc_id": np.array([-d for _, d in result], dtype=np.int64),
                "score": np.array([s for s, _ in result], dtype=np.float64),
            }
        )

    return _wand
