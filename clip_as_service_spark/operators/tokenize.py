"""pages → postings: the *encode* stage of the reference re-expressed.

Reference lifecycle (SURVEY.md §3.1): client.encode streams Documents to a
GPU executor that maps batches through a tokenizer and writes embeddings
(executors/clip_torch.py:135-224). Our analog: one declarative job —

    pages → [doc_id assignment] → tokenize (Arrow pandas UDF, the ONLY
    Python crossing) → explode(terms) → groupBy(doc_id, term).count() as tf

Scale notes (100 TB):
- explode + groupBy(doc_id, term) is map-side combinable (partial_count
  before shuffle) and the (doc_id, term) key space is near-uniform — doc_id
  spreads every head term across all partitions, so THIS shuffle has no skew
  problem. Skew appears later when grouping by term alone (index build);
  handled there (index_build.py).
- doc_len is derived from the same postings (sum of tf), no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize_udf


def assign_doc_ids(pages: DataFrame, method: str = "row_number") -> DataFrame:
    """Add a dense int64 ``doc_id`` keyed on url (SURVEY.md §7 locked decision).

    - ``row_number``: deterministic 1..N by url ascending. One-time global
      sort — acceptable as a build-time cost and required for the
      oracle-matching fixtures; the sort is a single SortExec over the url
      column only (Catalyst prunes the rest until the window).
    - ``hash``: xxhash64(url) — shuffle-free, the 100 TB default when dense
      ids aren't required (collision check left to the caller at 10^12 docs:
      64-bit birthday bound needs monitoring, or widen to (hash, url) keys).
    """
    if method == "hash":
        return pages.withColumn("doc_id", F.xxhash64(F.col("url")))
    w = Window.orderBy(F.col("url"))
    return pages.withColumn("doc_id", F.row_number().over(w).cast("long"))


def tokenize_pages(pages_with_ids: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, terms:array<string>) via the byte-identity tokenizer."""
    return pages_with_ids.select(
        "doc_id", tokenize_udf(F.col(text_col)).alias("terms")
    )


def build_postings(pages_with_ids: DataFrame, text_col: str = "text") -> DataFrame:
    """→ postings rows (term, doc_id, tf, dl) — SHUFFLE-FREE.

    tf and dl are per-document quantities, counted inside the tokenize UDF
    (tokenize_tf_udf), so the plan is scan → ArrowEvalPython → explode: no
    exchange at all. dl is denormalized onto every posting row so the query
    path never joins an N-row doc-length table (standard impact-ordered-index
    practice; SURVEY.md §7 M1).
    """
    from ..functions.text import tokenize_tf_udf

    toks = pages_with_ids.select(
        "doc_id", tokenize_tf_udf(F.col(text_col)).alias("t")
    )
    return toks.select(
        "doc_id",
        F.col("t.dl").alias("dl"),
        F.explode(F.arrays_zip("t.terms", "t.tfs")).alias("p"),
    ).select(
        F.col("p.terms").alias("term"),
        "doc_id",
        F.col("p.tfs").alias("tf"),
        "dl",
    )


def corpus_stats(postings: DataFrame) -> dict:
    """Global N and avgdl — exact (BM25 scoring), single pass.

    avgdl is computed as exact-integer Σdl / N (bit-identical to the oracle's
    float64 division of exact ints)."""
    per_doc = postings.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    row = per_doc.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    ).collect()[0]
    n_docs = row["n_docs"]
    avgdl = (row["total_dl"] / n_docs) if n_docs else 0.0
    return {"n_docs": int(n_docs), "avgdl": float(avgdl)}


def term_df(postings: DataFrame) -> DataFrame:
    """→ (term, df) — exact document frequency per term.

    (doc_id is unique per (term, doc_id) posting row by construction, so
    count(*) == countDistinct(doc_id) without the distinct shuffle.)"""
    return postings.groupBy("term").agg(F.count("*").alias("df"))
