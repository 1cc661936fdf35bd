"""N-vs-4N scaling evidence (north rule): run the IDENTICAL index-build +
query job at two local parallelism levels (local[8] ≙ N executors,
local[32] ≙ 4N) on the SAME pre-materialized parquet input, report
throughput at both plus scaling efficiency, and write BENCH_SCALING.md.

Each level runs in its own subprocess (fresh JVM — clean-room measurement,
no cross-session Python-accumulator teardown noise).

Usage:
  python bench_scaling.py [n_docs] [low_cores] [high_cores]
Defaults: 120000 docs, 8, 32.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/spark_graft_bench")


def materialize_input(n_docs: int) -> str:
    from clip_as_service_spark import fixtures
    from clip_as_service_spark.session import get_spark

    path = f"{WORK}/pages_n{n_docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    spark = get_spark(app_name="gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    fixtures.pages_spark_distributed(spark, n_docs).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def build_at(cores: int, pages_path: str, n_docs: int) -> dict:
    """Runs in the subprocess: one build + query-latency measurement."""
    from clip_as_service_spark import fixtures
    from clip_as_service_spark.operators import index_build, wand
    from clip_as_service_spark.session import get_spark

    out = f"{WORK}/idx_c{cores}"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(f"{out}_warm", ignore_errors=True)
    spark = get_spark(app_name=f"build-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    # warm-up build on a tiny slice: spins up the Python worker pool + Arrow
    # + parquet codecs once, like the reference benchmark drops its first
    # two iterations (reference scripts/benchmark.py:84)
    index_build.build_index(
        spark, pages.limit(2000), f"{out}_warm", n_shards=8, doc_id_method="dense"
    )
    t0 = time.perf_counter()
    index_build.build_index(spark, pages, out, n_shards=32, doc_id_method="dense")
    build_sec = time.perf_counter() - t0

    reader = wand.IndexReader(spark, out)
    reader.search("warm up the scan path", k=10)
    lat = []
    for q in fixtures.make_queries()[:30]:
        t1 = time.perf_counter()
        reader.search(q["text"], k=10)
        lat.append(time.perf_counter() - t1)
    spark.stop()
    lat.sort()
    return {
        "cores": cores,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_ms": round(1000 * statistics.median(lat), 1),
        "query_p95_ms": round(1000 * lat[int(0.95 * (len(lat) - 1))], 1),
    }


def _run_level(cores: int, pages_path: str, n_docs: int) -> dict:
    proc = subprocess.run(
        [sys.executable, __file__, "--level", str(cores), pages_path, str(n_docs)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"level {cores} failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        cores, pages_path, n_docs = int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
        print(json.dumps(build_at(cores, pages_path, n_docs)))
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    pages_path = materialize_input(n_docs)

    r_low = _run_level(low, pages_path, n_docs)
    r_high = _run_level(high, pages_path, n_docs)
    factor = high / low
    eff = r_high["docs_per_sec"] / (factor * r_low["docs_per_sec"])
    result = {
        "metric": "index_build_scaling",
        "n_docs": n_docs,
        "low": r_low,
        "high": r_high,
        "scale_factor": factor,
        "scaling_efficiency": round(eff, 3),
        "unit": "docs/sec",
    }
    print(json.dumps(result))

    with open("BENCH_SCALING.md", "w") as fh:
        fh.write(
            "# Scaling evidence (north rule: N→4N efficiency ≥ 0.8)\n\n"
            "Identical spark job (full index build: tokenize → postings → "
            "stats → dictionary → compressed blocks, over the same "
            f"pre-materialized parquet input, {n_docs} docs) at two "
            "parallelism levels, each in a fresh JVM:\n\n"
            "| cores | build sec | docs/sec | query p50 ms | query p95 ms |\n"
            "|---|---|---|---|---|\n"
            f"| local[{low}] | {r_low['build_sec']} | {r_low['docs_per_sec']} | "
            f"{r_low['query_p50_ms']} | {r_low['query_p95_ms']} |\n"
            f"| local[{high}] | {r_high['build_sec']} | {r_high['docs_per_sec']} | "
            f"{r_high['query_p50_ms']} | {r_high['query_p95_ms']} |\n\n"
            f"**Scaling efficiency** = {r_high['docs_per_sec']} / "
            f"({factor:.0f} × {r_low['docs_per_sec']}) = **{eff:.3f}**\n\n"
            "Query latency = per-query wall time of the interactive path "
            "(IndexReader: driver tokenize + driver shard pruning + one "
            "filtered block scan + driver WAND), 30 reference queries, warm.\n"
        )


if __name__ == "__main__":
    main()
