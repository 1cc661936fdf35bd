"""Single-node brute-force BM25 oracle (pure Python/numpy) — the judge for
every Spark result (SURVEY.md §7 M0).

Mirrors the reference's scored-top-k semantics: descending sort with stable
deterministic order (reference executors/helper.py:120-124 relies on Python's
stable sort; we pin the tie-break as (score DESC, doc_id ASC)), exactly
``limit`` results (tests/test_search.py:41-44), empty query → empty result
(tests/test_client.py:83-98).

BM25 (Okapi): idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
              score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
k1=1.2, b=0.75 (BASELINE.md). All math in float64; per-doc partials summed in
ascending-term order to fix float association (rank-identity under any Spark
partitioning).
"""

from __future__ import annotations

import math
from collections import Counter

from . import B, K1
from .textnorm import extract_text_from_html, tokenize_words


class BM25Oracle:
    def __init__(
        self,
        docs: list[tuple[int, str]],
        k1: float = K1,
        b: float = B,
        tokenizer=None,
    ):
        """docs: (doc_id, text) pairs; text is raw (normalization applied here).
        tokenizer: text → list[str]; defaults to the word-term pipeline —
        pass a BPE-term callable to judge a term_mode='bpe' index."""
        self.k1 = k1
        self.b = b
        self._tokenize = tokenizer or tokenize_words
        self.doc_ids: list[int] = []
        self.doc_len: dict[int, int] = {}
        # postings: term -> {doc_id: tf}
        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, text in docs:
            terms = self._tokenize(text)
            self.doc_ids.append(doc_id)
            self.doc_len[doc_id] = len(terms)
            for term, tf in Counter(terms).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.doc_ids)
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    @classmethod
    def from_pages(
        cls, pages: list[dict], use_html: bool = False, tokenizer=None
    ) -> "BM25Oracle":
        """doc_id = row_number over url ascending (deterministic, matches the
        Spark build's id assignment)."""
        ordered = sorted(pages, key=lambda r: r["url"])
        docs = []
        for i, row in enumerate(ordered, start=1):
            text = (
                extract_text_from_html(row["html"]) if use_html else row["text"]
            )
            docs.append((i, text))
        return cls(docs, tokenizer=tokenizer)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_all(self, query_text: str) -> dict[int, float]:
        """BM25 score for every doc matching ≥1 query term.

        Duplicate query terms contribute once per unique term (standard BM25
        over the query's term set — matches the Spark path which joins on
        DISTINCT query terms)."""
        terms = sorted(set(self._tokenize(query_text)))
        scores: dict[int, float] = {}
        for term in terms:  # ascending-term order fixes float association
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                # association pinned as idf * (w) with w = tf*(k1+1)/denom so the
                # impact-ordered index path (codec.impact_weights) is bit-identical
                partial = idf * (tf * (self.k1 + 1.0) / denom)
                scores[doc_id] = scores.get(doc_id, 0.0) + partial
        return scores

    def topk(self, query_text: str, k: int = 10) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] sorted (score DESC, doc_id ASC), len ≤ k."""
        scores = self.score_all(query_text)
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(rank, doc_id, s) for rank, (doc_id, s) in enumerate(ordered, 1)]

    def topk_batch(
        self, queries: list[dict], k: int = 10
    ) -> list[tuple[int, int, int, float]]:
        """[(query_id, rank, doc_id, score)] over the whole query set."""
        out = []
        for q in queries:
            for rank, doc_id, score in self.topk(q["text"], k=k):
                out.append((q["query_id"], rank, doc_id, score))
        return out
