"""Per-stage N-vs-4N profile of the index build — finds where 8→32 cores
flattens. Each level runs in a fresh JVM subprocess; per-stage wall times
come from the build_log lineage table the build already writes.

Usage: python tools/profile_scaling.py [n_docs] [cores ...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/spark_graft_bench")


def profile_at(cores: int, pages_path: str, n_docs: int) -> dict:
    from clip_as_service_spark.operators import index_build
    from clip_as_service_spark.session import get_spark
    from clip_as_service_spark.sources.tables import IndexStorage

    out = f"{WORK}/prof_c{cores}"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(f"{out}_warm", ignore_errors=True)
    spark = get_spark(app_name=f"prof-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    index_build.build_index(
        spark, pages.limit(2000), f"{out}_warm", n_shards=8
    )
    t0 = time.perf_counter()
    index_build.build_index(spark, pages, out, n_shards=32)
    build_sec = time.perf_counter() - t0
    stages = {}
    for r in IndexStorage(out).read(spark, "build_log").collect():
        stages.setdefault(r["stage"], r["wall_ms"])
    spark.stop()
    return {
        "cores": cores,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "stages_ms": stages,
    }


def main() -> None:
    if sys.argv[1] == "--level":
        print(json.dumps(profile_at(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    cores_list = [int(c) for c in sys.argv[2:]] or [8, 32]

    sys.path.insert(0, REPO)
    from bench_scaling import materialize_input

    pages_path = materialize_input(n_docs)
    confine = os.environ.get("SPARK_GRAFT_CONFINE", "1") == "1"
    results = []
    for cores in cores_list:
        # taskset confines the WHOLE level (JVM task threads + python UDF
        # workers + GC) to exactly `cores` physical cores — without it a
        # local[8] JVM's 8 python workers land on 8 OTHER cores of this
        # 32-core box and the "8-core" level silently uses 16, overstating
        # the low level and understating scaling efficiency. A real N-core
        # executor is cgroup-confined exactly like this.
        cmd = [sys.executable, __file__, "--level", str(cores), pages_path, str(n_docs)]
        if confine:
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(f"level {cores} failed")
        results.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        print(json.dumps(results[-1]))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        factor = hi["cores"] / lo["cores"]
        print(f"\nscaling efficiency: {hi['docs_per_sec'] / (factor * lo['docs_per_sec']):.3f}")
        print(f"{'stage':<10} {'c' + str(lo['cores']):>10} {'c' + str(hi['cores']):>10} {'speedup':>8}")
        for st in lo["stages_ms"]:
            a, b = lo["stages_ms"][st], hi["stages_ms"].get(st, 0)
            print(f"{st:<10} {a:>10} {b:>10} {a / max(b, 1):>8.2f}")
        other_lo = lo["build_sec"] * 1000 - sum(lo["stages_ms"].values())
        other_hi = hi["build_sec"] * 1000 - sum(hi["stages_ms"].values())
        print(f"{'(other)':<10} {other_lo:>10.0f} {other_hi:>10.0f} {other_lo / max(other_hi, 1):>8.2f}")


if __name__ == "__main__":
    main()
