"""Table I/O behind one interface: parquet layout now, Iceberg drop-in later
(SURVEY.md §7 hard part 5).

The index is a set of tables under one root:
  <root>/_meta.json   — build config (n_shards, block_size, k1/b, salt policy)
  <root>/postings/    — (term, doc_id, tf, dl) checkpoint  [stage 1]
  <root>/stats/       — single row (n_docs, total_dl, avgdl) [stage 2]
  <root>/termdf/      — (term, df, idf)                      [stage 3]
  <root>/blocks/      — block rows, partitioned by shard     [stage 4]
  <root>/build_log/   — per-stage, per-shard lineage + metrics (append-only)

Stage completion is the parquet `_SUCCESS` marker — writes are idempotent
(overwrite per stage dir), which is exactly what makes the build resumable:
a restart consults completed markers and skips those stages (north rule).
On Iceberg, each stage dir becomes a table and `_SUCCESS` becomes a snapshot
tag; the interface below is the only place that changes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class IndexStorage:
    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def exists(self, table: str) -> bool:
        return os.path.exists(os.path.join(self.path(table), "_SUCCESS"))

    def write(self, df: DataFrame, table: str, partition_by: list[str] | None = None):
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None):
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def write_meta(self, meta: dict):
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "_meta.json"), "w") as fh:
            json.dump(meta, fh, indent=2, sort_keys=True)

    def read_meta(self) -> dict:
        with open(os.path.join(self.root, "_meta.json")) as fh:
            return json.load(fh)

    def has_meta(self) -> bool:
        return os.path.exists(os.path.join(self.root, "_meta.json"))
