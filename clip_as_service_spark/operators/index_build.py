"""Index build: pages → sharded, block-compressed posting lists — the
*index* verb of the reference (client.py:541-713, AnnLite persist) as a
resumable multi-stage Spark job (SURVEY.md §7 M2/M4).

Stages (each a durable, idempotent parquet write; `_SUCCESS` = checkpoint):
  1. postings — tokenize + groupBy(term, doc_id) [the one Python crossing]
  2. stats    — exact N, Σdl, avgdl
  3. termdf   — (term, df, idf); idf via Python math.log (bit-identity)
  4. blocks   — per-(term, salt) sorted doc lists → BLOCK_SIZE-doc blocks,
                delta-gap + vByte docs/tfs/dls, per-block (first/last doc,
                max impact weight) → partitioned by shard=pmod(xxhash64(term))

Skew handling (SURVEY.md §7 hard part 3): head terms (df > salt_cutoff,
detected EXACTLY from the termdf stage — at 100 TB this would be the sampled
histogram, but termdf is already materialized here so exact df is free) are
salted by pmod(xxhash64(doc_id), n_salts(df)), splitting a Zipf-head posting
list into bounded sub-lists built by independent tasks. Sub-lists are
disjoint-by-doc and individually sorted; the query path treats each as its
own cursor, so exactness is unaffected.

Scale shape: the groupBy(term, salt) shuffle is the build's only big shuffle
after the postings agg; its key space is uniform *after* salting. Blocks are
written partitioned by shard so query-time term lookups prune directories.

Lineage (north rule): every stage appends (stage, shard, rows, bytes,
wall_ms) rows to build_log; restart skips completed stages.
"""

from __future__ import annotations

import math
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from .. import B, K1
from ..functions.codec import BLOCK_SIZE, encode_posting_block, impact_weights
from ..sources.tables import IndexStorage
from . import tokenize as tok

BLOCKS_SCHEMA = (
    "term string, shard int, salt int, block_id int, n int, "
    "first_doc long, last_doc long, max_w double, "
    "docs binary, tfs binary, dls binary"
)


@pandas_udf(DoubleType())
def _idf_udf(df_col: pd.Series, n_docs: pd.Series) -> pd.Series:
    return pd.Series(
        [
            math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            for d, n in zip(df_col.astype("int64"), n_docs.astype("int64"))
        ],
        dtype="float64",
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    salt_cutoff: int = 50_000,
    target_sublist: int = 50_000,
    doc_id_method: str = "row_number",
    text_col: str = "text",
) -> IndexStorage:
    """Run all build stages, skipping any whose checkpoint already exists."""
    store = IndexStorage(out_dir)
    if not store.has_meta():
        store.write_meta(
            {
                "n_shards": n_shards,
                "block_size": BLOCK_SIZE,
                "k1": K1,
                "b": B,
                "salt_cutoff": salt_cutoff,
                "target_sublist": target_sublist,
                "doc_id_method": doc_id_method,
                "version": 1,
            }
        )
    meta = store.read_meta()
    n_shards = meta["n_shards"]

    # -- stage 1: postings checkpoint --------------------------------------
    if not store.exists("postings"):
        t0 = time.perf_counter()
        with_ids = tok.assign_doc_ids(pages, method=meta["doc_id_method"])
        postings = tok.build_postings(with_ids, text_col=text_col)
        store.write(postings, "postings")
        _log(spark, store, "postings", t0)

    postings = store.read(spark, "postings")

    # -- stage 2: corpus stats ---------------------------------------------
    if not store.exists("stats"):
        t0 = time.perf_counter()
        per_doc = postings.groupBy("doc_id").agg(F.first("dl").alias("dl"))
        stats = per_doc.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
        ).withColumn("avgdl", F.col("total_dl") / F.col("n_docs"))
        store.write(stats, "stats")
        _log(spark, store, "stats", t0)

    stats_row = store.read(spark, "stats").collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"])

    # -- stage 3: term dictionary (df + idf) --------------------------------
    if not store.exists("termdf"):
        t0 = time.perf_counter()
        tdf = (
            postings.groupBy("term")
            .agg(F.count("*").alias("df"))
            .withColumn("idf", _idf_udf(F.col("df"), F.lit(n_docs)))
        )
        store.write(tdf, "termdf")
        _log(spark, store, "termdf", t0)

    # -- stage 4: compressed block build ------------------------------------
    if not store.exists("blocks"):
        t0 = time.perf_counter()
        tdf = store.read(spark, "termdf")
        salt_cutoff = meta["salt_cutoff"]
        target = meta["target_sublist"]
        # n_salts per term: 1 for the tail, ceil(df/target) for the Zipf head
        salted_terms = tdf.filter(F.col("df") > salt_cutoff).select(
            "term",
            F.ceil(F.col("df") / F.lit(target)).cast("int").alias("n_salts"),
        )
        p = postings.join(F.broadcast(salted_terms), "term", "left").withColumn(
            "salt",
            F.when(
                F.col("n_salts").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        p = p.withColumn(
            "shard", F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int")
        )

        def _build_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
            out: dict[str, list] = {
                k: []
                for k in (
                    "term", "shard", "salt", "block_id", "n", "first_doc",
                    "last_doc", "max_w", "docs", "tfs", "dls",
                )
            }
            term = pdf["term"].iloc[0]
            shard = int(pdf["shard"].iloc[0])
            salt = int(pdf["salt"].iloc[0])
            order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
            doc_ids = pdf["doc_id"].to_numpy()[order]
            tfs = pdf["tf"].to_numpy()[order]
            dls = pdf["dl"].to_numpy()[order]
            for b0 in range(0, len(doc_ids), BLOCK_SIZE):
                d = doc_ids[b0 : b0 + BLOCK_SIZE]
                t = tfs[b0 : b0 + BLOCK_SIZE]
                l = dls[b0 : b0 + BLOCK_SIZE]
                docs_b, tfs_b, dls_b = encode_posting_block(d, t, l)
                w = impact_weights(t, l, avgdl, K1, B)
                out["term"].append(term)
                out["shard"].append(shard)
                out["salt"].append(salt)
                out["block_id"].append(b0 // BLOCK_SIZE)
                out["n"].append(len(d))
                out["first_doc"].append(int(d[0]))
                out["last_doc"].append(int(d[-1]))
                out["max_w"].append(float(np.max(w)))
                out["docs"].append(docs_b)
                out["tfs"].append(tfs_b)
                out["dls"].append(dls_b)
            return pd.DataFrame(out)

        blocks = p.groupBy("term", "salt").applyInPandas(
            _build_blocks, schema=BLOCKS_SCHEMA
        )
        store.write(blocks, "blocks", partition_by=["shard"])
        _log(spark, store, "blocks", t0, per_shard=True)

    return store


def _log(
    spark: SparkSession,
    store: IndexStorage,
    stage: str,
    t0: float,
    per_shard: bool = False,
):
    """Append per-stage (and for blocks, per-shard) lineage + metrics rows."""
    wall_ms = int((time.perf_counter() - t0) * 1000)
    df = store.read(spark, stage)
    if per_shard and "shard" in df.columns:
        sizes = df.groupBy("shard").agg(
            F.count("*").alias("rows"),
            F.sum(
                F.length("docs") + F.length("tfs") + F.length("dls")
            ).alias("bytes"),
        )
        log = sizes.select(
            F.lit(stage).alias("stage"),
            F.col("shard").cast("int").alias("shard"),
            F.col("rows").cast("long").alias("rows"),
            F.col("bytes").cast("long").alias("bytes"),
            F.lit(wall_ms).alias("wall_ms"),
        )
    else:
        log = df.agg(F.count("*").alias("rows")).select(
            F.lit(stage).alias("stage"),
            F.lit(-1).cast("int").alias("shard"),
            F.col("rows").cast("long").alias("rows"),
            F.lit(None).cast("long").alias("bytes"),
            F.lit(wall_ms).alias("wall_ms"),
        )
    store.append(log, "build_log")


def iter_build_log(spark: SparkSession, store: IndexStorage):
    return store.read(spark, "build_log").collect()
