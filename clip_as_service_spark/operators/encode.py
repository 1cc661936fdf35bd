"""Deterministic text encoder — the engine's CPU analog of the reference's
`encode` verb (client.encode → server-side CLIP model,
client/clip_client/client.py:541-713). Model inference is an external
GPU concern; the scalable, public CPU stand-in is the FEATURE-HASHING
(hashing-trick) embedding (Weinberger et al. 2009): token t contributes
sign(h2(t)) at component h1(t) mod dim, summed per document.

Everything is JVM-side built-ins (md5 + conv + groupBy + map assembly —
no Python), deterministic, and cross-engine reproducible: both hashes are
md5-hex-substring integers, so a DuckDB oracle computes bit-identical
components (pinned by the `encode_hash_embed` gate query). The output
`array<double>` column feeds the ANN family directly — hash_embed →
build_ann_index → rh_topk_stored is the reference's encode → index →
search flow end to end on this engine (pinned by test).

Scale shape: one narrow pass (split/explode), one groupBy(doc, idx) with
map-side partial sums (≤ dim rows per doc out of the combiner), one
groupBy(doc) map assembly — shuffle is O(non-zero components), never
O(tokens)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h15(col) -> F.Column:
    """First 15 md5 hex digits as a non-negative long (60 bits — identical
    in Spark `conv` and DuckDB's '0x…'::BIGINT parse)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _sign(col) -> F.Column:
    """±1.0 from md5 hex digit 17 (independent of the index digits)."""
    return F.when(
        F.conv(F.substring(F.md5(col), 17, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))


def hash_embed_py(text: str, dim: int = 64) -> list[float]:
    """Pure-Python twin of hash_embed for ONE text — the query-side encode
    of the zero-Spark serving paths (HybridReader). Same md5 hex-substring
    hashes, same space-split/empty-drop tokenization, same tf-weighted
    ±1 accumulation, so the embedding is bit-identical to the Spark column
    (doubles built from small-int sums — no float-order hazard). Pinned by
    test_fusion parity."""
    import hashlib

    vec = [0.0] * dim
    for tok in text.split(" "):
        if not tok:
            continue
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        idx = int(h[:15], 16) % dim
        vec[idx] += 1.0 if int(h[16], 16) % 2 == 0 else -1.0
    return vec


def hash_embed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    normalize: bool = False,
) -> DataFrame:
    """→ (id, embedding: array<double>) feature-hashing embedding.

    Tokens split on single space (the documents-table convention; feed
    pre-normalized text, or compose with the byte-identity tokenizer for
    pages). Each token OCCURRENCE adds its sign at its hashed component —
    tf weighting for free. Zero-token docs embed as the zero vector.

    normalize=True L2-normalizes (cosine-ready); leave False when a
    cross-engine oracle will compare raw components (no rounding hazard)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("term"),
    )
    comp = (
        toks.filter(F.col("term").isNotNull())
        .select(
            "id",
            (_h15(F.col("term")) % dim).cast("int").alias("idx"),
            _sign(F.col("term")).alias("s"),
        )
        .groupBy("id", "idx")
        .agg(F.sum("s").alias("v"))
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    emb = (
        ids.join(
            comp.groupBy("id").agg(
                F.map_from_entries(
                    F.collect_list(F.struct("idx", "v"))
                ).alias("m")
            ),
            "id",
            "left",
        )
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0)),
            ).alias("embedding"),
        )
    )
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        emb = emb.select(
            "id",
            F.when(nrm > 0, F.transform("embedding", lambda x: x / nrm))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    return emb
