"""Client facade — the reference's five-verb public API
(client/clip_client/client.py: encode :226, rank :456, index :542,
search :716, profile :68) re-expressed over this engine's operators, so a
reference user's call sites map one-to-one:

    reference                           here
    ---------                           ----
    Client('grpc://…')                  CasSparkClient(spark, workspace)
    c.encode(['hello world', …])        c.encode(texts)          → DataFrame
    c.index(docs)                       c.index(emb_df) / c.index_append(…)
    c.search(queries, limit=k)          c.search(texts, k=…)     → DataFrame
    c.rank(query, candidates)           c.rank(query, candidates)
    c.profile()                         c.profile()

The reference's encode runs a GPU CLIP model behind a gateway; the engine's
deterministic CPU stand-in is the feature-hashing embedding
(operators/encode.hash_embed — same array<double> contract the ANN family
consumes). `workspace` is the persisted-index root, the analog of AnnLite's
`workspace` directory (docs/user-guides/retriever.md:54-62): `index` builds
the ANN structures there once; `search` serves pruned reads from them.
Everything returns DataFrames — compose downstream instead of collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CasSparkClient:
    """Five-verb facade over the engine (see module docstring)."""

    def __init__(
        self,
        spark: SparkSession,
        workspace: str,
        dim: int = 64,
        rh_n_bits: int | None = None,
        rh_n_tables: int = 8,
        ivf_k: int | None = None,
    ):
        # rh_n_bits/ivf_k None = size from the corpus at index() time
        # (build_ann_index auto_n_bits/auto_ivf_k); explicit values pin
        # the geometry (small fixtures, cross-engine oracles)
        self.spark = spark
        self.workspace = workspace.rstrip("/")
        self.dim = dim
        self.rh_n_bits = rh_n_bits
        self.rh_n_tables = rh_n_tables
        self.ivf_k = ivf_k

    # -- encode -------------------------------------------------------------
    def encode(self, texts, id_offset: int = 0) -> DataFrame:
        """texts (list[str] or DataFrame(id, text)) → (id, embedding).
        L2-normalized feature-hashing embeddings (cosine-ready)."""
        from .operators.encode import hash_embed

        if isinstance(texts, DataFrame):
            df = texts
        else:
            df = self.spark.createDataFrame(
                [(id_offset + i, t) for i, t in enumerate(texts)],
                "id long, text string",
            )
        return hash_embed(df, "id", "text", dim=self.dim, normalize=True)

    # -- index --------------------------------------------------------------
    def index(self, embeddings: DataFrame, **kw) -> None:
        """Build the persisted ANN index in the workspace (one-time;
        resumable). kw forwards to build_ann_index (meta_cols, seeds…)."""
        from .operators.ann_index import build_ann_index

        build_ann_index(
            self.spark, embeddings, f"{self.workspace}/ann", dim=self.dim,
            rh_n_bits=self.rh_n_bits, rh_n_tables=self.rh_n_tables,
            ivf_k=self.ivf_k, id_col="id", vec_col="embedding", **kw,
        )

    def index_append(self, embeddings: DataFrame) -> None:
        """Incrementally add vectors (the reference's repeated `/index`)."""
        from .operators.ann_index import append_ann_vectors

        append_ann_vectors(
            self.spark, f"{self.workspace}/ann", embeddings,
            id_col="id", vec_col="embedding",
        )

    def index_delete(self, ids) -> int:
        """Delete vectors by id — the reference's `/delete` endpoint
        (retriever.md:203-204,225). Merge-on-read tombstones: probes hide
        the ids immediately; bytes reclaim at the next ann-compact.
        Returns the number of tombstones written."""
        from .operators.ann_index import delete_ann_vectors

        return delete_ann_vectors(self.spark, f"{self.workspace}/ann", ids)

    def index_update(self, embeddings: DataFrame) -> None:
        """Upsert re-encoded vectors — the reference's `/update` endpoint:
        delete + append in one call; probes serve exactly the new vector."""
        from .operators.ann_index import update_ann_vectors

        update_ann_vectors(
            self.spark, f"{self.workspace}/ann", embeddings,
            id_col="id", vec_col="embedding",
        )

    # -- search -------------------------------------------------------------
    def search(
        self, texts, k: int = 10, method: str = "rh", where=None,
        rerank: int | None = None,
    ) -> DataFrame:
        """texts → (query_id, rank, vec_id, cosine) over the workspace
        index. method: 'rh' (LSH multi-probe) or 'ivf' (cell probe);
        `where` filters on stored meta_cols (AnnLite filter columns);
        `rerank` bounds the exact-re-rank pool on a PQ-payload index
        (None = fetch every candidate)."""
        from .operators import ann_index

        q = self.encode(texts).select(
            F.col("id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        if method == "rh":
            return ann_index.rh_topk_stored(
                self.spark, f"{self.workspace}/ann", q, k=k, where=where,
                rerank=rerank,
            )
        if method == "ivf":
            return ann_index.ivf_topk_stored(
                self.spark, f"{self.workspace}/ann", q, k=k, where=where,
                rerank=rerank,
            )
        raise ValueError(f"unknown search method {method!r}")

    def reader(self):
        """Warm zero-Spark-job serving handle (AnnReader) over the
        workspace index — the resident-retriever analog; use for
        interactive single-query latency, `search` for batches."""
        from .operators.ann_index import AnnReader

        return AnnReader(f"{self.workspace}/ann")

    # -- rank ---------------------------------------------------------------
    def rank(self, query_text: str, candidates) -> DataFrame:
        """Re-rank a fixed candidate set against one query by cosine —
        the reference's cross-modal rank verb shape (client.py:456).
        candidates: list[str] or DataFrame(id, text). → (id, rank, cosine),
        descending."""
        cand = self.encode(candidates)
        q = self.encode([query_text], id_offset=-1).select(
            F.col("embedding").alias("qvec")
        )
        from .operators.similarity import cosine_col
        from pyspark.sql import Window

        scored = cand.crossJoin(F.broadcast(q)).select(
            "id", cosine_col(F.col("embedding"), F.col("qvec")).alias("cosine")
        )
        w = Window.orderBy(F.desc("cosine"), F.asc("id"))
        return scored.withColumn(
            "rank", F.row_number().over(w).cast("int")
        ).select("id", "rank", "cosine")

    # -- profile ------------------------------------------------------------
    def profile(self) -> dict:
        """Index stats + build lineage — the analog of client.profile()'s
        per-call breakdown is on IndexReader.profile_summary (BM25 side);
        here: the ANN workspace's tables and meta."""
        from .sources.tables import IndexStorage

        store = IndexStorage(f"{self.workspace}/ann")
        out = {"meta": store.read_meta()}
        for t in ("rh_buckets", "ivf_centroids", "ivf_cells", "deleted_ids"):
            if store.exists(t):
                out[t] = {"rows": store.read(self.spark, t).count()}
        return out
