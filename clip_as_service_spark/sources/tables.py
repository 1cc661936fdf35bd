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

    def write_tmp(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> str:
        """Execute a rewrite of ``table`` into a sibling tmp dir (returns
        its name for swap()) — the write phase of replace(). Needed because
        Spark cannot overwrite a path that is an input of the writing plan,
        and because a multi-table rewrite (e.g. quantizer + cells) must run
        ALL its jobs before any directory is swapped."""
        import shutil

        tmp_table = f"{table}__compact_tmp"
        shutil.rmtree(self.path(tmp_table), ignore_errors=True)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(tmp_table))
        return tmp_table

    def swap(self, table: str, tmp_table: str):
        """Move a write_tmp() result into place (rm old + rename — a
        filesystem-level instant, vs the minutes of the write jobs). Not
        atomic across the two calls, but a crash in the gap leaves no
        `_SUCCESS` at the final path, so exists() correctly reports the
        stage incomplete and a resume rebuilds it."""
        import shutil

        final = self.path(table)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(self.path(tmp_table), final)

    def replace(self, df: DataFrame, table: str, partition_by: list[str] | None = None):
        """Rewrite a table whose plan READS the same table (compaction):
        write_tmp + swap in one step."""
        self.swap(table, self.write_tmp(df, table, partition_by))

    def table_bytes(self, table: str) -> int:
        """Parquet payload bytes under a table dir (bench/ops evidence —
        one definition so layout changes can't desync the benches)."""
        total = 0
        for dp, _, fns in os.walk(self.path(table)):
            total += sum(
                os.path.getsize(os.path.join(dp, f))
                for f in fns
                if f.endswith(".parquet")
            )
        return total

    def write_meta(self, meta: dict):
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "_meta.json"), "w") as fh:
            json.dump(meta, fh, indent=2, sort_keys=True)

    def read_meta(self) -> dict:
        with open(os.path.join(self.root, "_meta.json")) as fh:
            return json.load(fh)

    def has_meta(self) -> bool:
        return os.path.exists(os.path.join(self.root, "_meta.json"))
