"""ANN at-rest scale evidence: stored-index probes vs per-query recompute
at a corpus size where the data side dominates (default 1M × 64-dim).

The sf0.1 bench (5k vectors) is probe-overhead-bound — this run shows the
actual asymmetry the persisted index buys: the recompute paths scan and
re-bucket/re-assign all N vectors per query batch, while the stored paths
read only the probed buckets/cells.

Usage: python tools/bench_ann_scale.py [n_vectors] [dim]
Prints one JSON line; intermediate data under /tmp/ann_scale_bench.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/ann_scale_bench"


def _complete(d: str) -> bool:
    """Reuse a finished build (all stages checkpointed) — the builds are
    resumable artifacts; re-timing them every run re-pays the most
    expensive part of the tool for no new information. A reused build
    reports build_sec = -1 (cached)."""
    from clip_as_service_spark.sources.tables import IndexStorage

    st = IndexStorage(d)
    return st.has_meta() and all(
        st.exists(t) for t in ("rh_buckets", "ivf_centroids", "ivf_cells")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from pyspark.sql import functions as F

    from clip_as_service_spark.operators import ann_index, similarity as sim
    from clip_as_service_spark.session import get_spark

    spark = get_spark(app_name="ann-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic vectors, generated distributed (numpy per
    # partition, seeded by partition id — no driver materialization)
    emb_path = f"{WORK}/emb_n{n}_d{dim}"
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        import numpy as np
        import pandas as pd

        n_parts = 64
        per = -(-n // n_parts)

        def _gen(batches):
            for pdf in batches:
                for pid in pdf["pid"]:
                    rng = np.random.default_rng(1000 + int(pid))
                    lo = int(pid) * per
                    hi = min(lo + per, n)
                    if lo >= hi:
                        continue
                    vecs = rng.standard_normal((hi - lo, dim))
                    yield pd.DataFrame(
                        {
                            "vec_id": np.arange(lo, hi, dtype=np.int64),
                            "embedding": [row.tolist() for row in vecs],
                        }
                    )

        seed_df = spark.range(n_parts).toDF("pid").repartition(n_parts)
        seed_df.mapInPandas(
            _gen, "vec_id long, embedding array<double>"
        ).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)

    ann_dir = f"{WORK}/idx_n{n}_d{dim}"
    if _complete(ann_dir):
        build_sec = -1.0
    else:
        shutil.rmtree(ann_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ann_index.build_ann_index(
            spark, emb, ann_dir, dim=dim,
            rh_n_bits=12, rh_n_tables=4,  # 4096 buckets/table ≈ 244 rows each
            ivf_k=64, ivf_n_iter=4, ivf_train_sample=0.02,
        )
        build_sec = round(time.perf_counter() - t0, 2)

    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    def timed(fn) -> float:
        t1 = time.perf_counter()
        fn().count()
        return round(time.perf_counter() - t1, 2)

    from clip_as_service_spark.sources.tables import IndexStorage

    cents = IndexStorage(ann_dir).read(spark, "ivf_centroids")
    out = {
        "metric": "ann_stored_vs_recomputed_scale",
        "n_vectors": n,
        "dim": dim,
        "build_sec": build_sec,
        "rh_stored_sec": timed(
            lambda: ann_index.rh_topk_stored(spark, ann_dir, queries, k=10)
        ),
        "rh_recomputed_sec": timed(
            lambda: sim.rh_bucketed_topk(
                emb, queries, k=10, n_bits=12, dim=dim, n_tables=4
            )
        ),
        "ivf_stored_sec": timed(
            lambda: ann_index.ivf_topk_stored(
                spark, ann_dir, queries, k=10, nprobe=4
            )
        ),
        "ivf_recomputed_sec": timed(
            lambda: sim.ivf_topk(emb, queries, cents, k=10, nprobe=4)
        ),
    }
    out["rh_speedup"] = round(out["rh_recomputed_sec"] / out["rh_stored_sec"], 1)
    out["ivf_speedup"] = round(
        out["ivf_recomputed_sec"] / out["ivf_stored_sec"], 1
    )

    # AUTO-SIZED build: geometry chosen from the corpus (auto_n_bits(N),
    # ivf_k ≈ ⌈√N⌉) — the N-scaled pruning a fixed k loses; report the
    # chosen geometry and the probe times through it, plus the id-only
    # payload bytes (store_vectors=False: vectors live once, in ivf_cells)
    auto_dir = f"{WORK}/idx_auto_n{n}_d{dim}"
    if _complete(auto_dir):
        out["auto_build_sec"] = -1.0
    else:
        shutil.rmtree(auto_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ann_index.build_ann_index(
            spark, emb, auto_dir, dim=dim, rh_n_tables=4,
            ivf_n_iter=4, ivf_train_sample=min(1.0, 100_000 / n),
            store_vectors=False,
        )
        out["auto_build_sec"] = round(time.perf_counter() - t0, 2)
    auto_meta = IndexStorage(auto_dir).read_meta()
    out["auto_rh_n_bits"] = auto_meta["rh_n_bits"]
    out["auto_ivf_k"] = auto_meta["ivf_k"]
    out["auto_rh_stored_idonly_sec"] = timed(
        lambda: ann_index.rh_topk_stored(spark, auto_dir, queries, k=10)
    )
    out["auto_ivf_stored_sec"] = timed(
        lambda: ann_index.ivf_topk_stored(
            spark, auto_dir, queries, k=10, nprobe=4
        )
    )

    def _tbl_bytes(root: str, table: str) -> int:
        return IndexStorage(root).table_bytes(table)

    out["rh_buckets_bytes_full_4t"] = _tbl_bytes(ann_dir, "rh_buckets")
    out["rh_buckets_bytes_idonly_4t"] = _tbl_bytes(auto_dir, "rh_buckets")
    out["ivf_cells_bytes"] = _tbl_bytes(auto_dir, "ivf_cells")

    # PQ payload at scale: ADC scoring + bounded exact re-rank — probe
    # time and bytes beside the other layouts (same manual geometry as the
    # first build so the probe cost is comparable)
    pq_dir = f"{WORK}/idx_pq_n{n}_d{dim}"
    if _complete(pq_dir):
        out["pq_build_sec"] = -1.0
    else:
        shutil.rmtree(pq_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ann_index.build_ann_index(
            spark, emb, pq_dir, dim=dim,
            rh_n_bits=12, rh_n_tables=4,
            ivf_k=64, ivf_n_iter=4, ivf_train_sample=0.02,
            store_vectors=False, pq=True, pq_m=8, pq_codes=256,
            pq_n_iter=4, pq_train_sample=min(1.0, 200_000 / n),
        )
        out["pq_build_sec"] = round(time.perf_counter() - t0, 2)
    out["pq_rh_stored_sec_rerank50"] = timed(
        lambda: ann_index.rh_topk_stored(spark, pq_dir, queries, k=10, rerank=50)
    )
    out["pq_ivf_stored_sec_rerank50"] = timed(
        lambda: ann_index.ivf_topk_stored(
            spark, pq_dir, queries, k=10, nprobe=4, rerank=50
        )
    )
    out["rh_buckets_bytes_pq_4t"] = _tbl_bytes(pq_dir, "rh_buckets")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
