"""Sub-phase profile of the blocks stage (stage 4) at one parallelism level:
(a) postings scan + salt join + collect_list groupBy (forced via size-sum),
(b) + mapInPandas pack (forced via count),
(c) full stage incl. re-attach join, repartition(shard), sort, write.

Usage: python tools/profile_stage4.py <cores> <pages_path> [n_shards]
Run it at 8 and 32 to see which sub-phase stops scaling.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/spark_graft_bench")


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from clip_as_service_spark.operators import index_build
    from clip_as_service_spark.session import get_spark
    from clip_as_service_spark.sources.tables import IndexStorage

    out = f"{WORK}/s4prof_c{cores}"
    spark = get_spark(app_name=f"s4prof-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")

    # ensure stages 1-3 exist once (shared across runs of this script at the
    # same pages_path — they are NOT what we're measuring here)
    shared = f"{WORK}/s4prof_shared"
    if not IndexStorage(shared).exists("termdf"):
        pages = spark.read.parquet(pages_path)
        try:
            index_build.build_index(spark, pages, shared, n_shards=n_shards)
        except Exception:
            pass  # blocks may fail/abort; stages 1-3 are what we need
    store = IndexStorage(shared)
    meta = store.read_meta()
    postings = store.read(spark, "postings")
    stats = store.read(spark, "stats").collect()[0]
    avgdl = float(stats["avgdl"])

    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    tdf = store.read(spark, "termdf")
    tdf_tid = tdf.select(F.xxhash64("term").alias("tid"), "term", "idf", "df")
    salted = tdf_tid.filter(F.col("df") > meta["salt_cutoff"]).select(
        "tid",
        F.ceil(F.col("df") / F.lit(meta["target_sublist"])).cast("int").alias("n_salts"),
    )
    p = postings.filter(F.col("term").isNotNull()).select(
        F.xxhash64("term").alias("tid"), "doc_id", "tf", "dl"
    )
    p = p.join(F.broadcast(salted), "tid", "left").withColumn(
        "salt",
        F.when(
            F.col("n_salts").isNotNull(),
            F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"),
        ).otherwise(F.lit(0)),
    )
    grouped = p.groupBy("tid", "salt").agg(
        F.collect_list("doc_id").alias("doc_ids"),
        F.collect_list("tf").alias("tfs_a"),
        F.collect_list("dl").alias("dls_a"),
    )

    t0 = time.perf_counter()
    n_groups = grouped.select(F.sum(F.size("doc_ids"))).collect()
    t_group = time.perf_counter() - t0

    # reuse the real pack UDF
    import clip_as_service_spark.operators.index_build as ib
    import numpy as np
    import pandas as pd
    from clip_as_service_spark import B, K1
    from clip_as_service_spark.functions.codec import (
        BLOCK_SIZE, encode_doc_gap_blocks, impact_weights,
    )

    def _pack(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                doc_ids = np.asarray(row.doc_ids, dtype=np.int64)
                tfs = np.asarray(row.tfs_a, dtype=np.int64)
                dls = np.asarray(row.dls_a, dtype=np.int64)
                order = np.argsort(doc_ids, kind="stable")
                doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
                n = len(doc_ids)
                docs_b = encode_doc_gap_blocks(doc_ids)
                w = impact_weights(tfs, dls, avgdl, K1, B)
                starts = np.arange(0, n, BLOCK_SIZE)
                ends = np.minimum(starts + BLOCK_SIZE, n)
                w_le = w.astype("<f8")
                yield pd.DataFrame(
                    {
                        "tid": np.full(len(starts), int(row.tid), dtype=np.int64),
                        "n": (ends - starts).astype(np.int32),
                        "first_doc": doc_ids[starts],
                        "docs": docs_b,
                        "ws": [w_le[s:e].tobytes() for s, e in zip(starts, ends)],
                    }
                )

    merged = grouped.mapInPandas(
        _pack, schema="tid long, n int, first_doc long, docs binary, ws binary"
    )
    t0 = time.perf_counter()
    merged.count()
    t_pack = time.perf_counter() - t0

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    blocks = merged.join(F.broadcast(tdf_tid.select("tid", "term", "idf")), "tid").select(
        "term",
        F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int").alias("shard"),
        "n", "first_doc", "max_w" if False else F.lit(0.0).alias("max_w"),
        "idf", "docs", "ws",
    )
    blocks = blocks.repartition("shard").sortWithinPartitions("term")
    blocks.write.mode("overwrite").partitionBy("shard").parquet(out)
    t_write = time.perf_counter() - t0

    print(
        f"cores={cores} group+scan={t_group:.1f}s pack_total={t_pack:.1f}s "
        f"(pack_delta={t_pack - t_group:.1f}s) write_total={t_write:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
