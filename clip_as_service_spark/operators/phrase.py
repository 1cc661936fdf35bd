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
no Python.
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


def phrase_positions(positions: DataFrame, phrase_terms: list[str]) -> DataFrame:
    """→ (id, start_pos) one row per exact occurrence of the token sequence.

    Empty phrase → empty result (validation short-circuit, P5)."""
    if not phrase_terms:
        spark = positions.sparkSession
        return spark.createDataFrame([], "id long, start_pos int")
    cur = positions.filter(F.col("term") == phrase_terms[0]).select(
        "id", F.col("pos").alias("start_pos")
    )
    for i, term in enumerate(phrase_terms[1:], start=1):
        nxt = positions.filter(F.col("term") == term).select(
            "id", (F.col("pos") - i).alias("start_pos")
        )
        cur = cur.join(nxt, ["id", "start_pos"])
    return cur.select("id", F.col("start_pos").cast("int").alias("start_pos"))
