"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata — the engine's carrier for the reference's image path (blob →
PIL → Resize/CenterCrop/Normalize, server/clip_server/model/clip.py:25-52;
blob loading client.py:179,186).

The image/audio decode libraries are NOT in this container, so the actual
pixel decode is stubbed behind ``NotImplementedError`` — but everything
Spark-side is real and tested: the asset schema, the Arrow batch shape
through mapInPandas, the feature-vector schema, partition behavior, and a
deterministic fake decoder (md5-seeded) so downstream operators (resize
geometry, frame sampling, feature extraction) exercise real code paths.

Scale shape: decode/feature-extract is embarrassingly parallel mapInPandas
over binary columns; Arrow moves the bytes zero-copy; no shuffle until the
(asset_id, feature) output is aggregated or joined.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("media", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

FEATURES_SCHEMA = (
    "asset_id string, kind string, width int, height int, n_frames int, "
    "features array<float>"
)

N_FEATURES = 32


def _fake_decode(media: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decoder: geometry + byte-histogram 'features'
    derived only from the bytes (md5-seeded). Replaces PIL/ffmpeg here."""
    digest = hashlib.md5(media).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    n_frames = 1 + digest[2] % 8
    hist, _ = np.histogram(
        np.frombuffer(media, dtype=np.uint8), bins=N_FEATURES, range=(0, 256)
    )
    total = hist.sum()
    feats = (hist / total if total else hist).astype(np.float32)
    return width, height, n_frames, feats


try:  # import-probed: the real image path engages wherever PIL exists
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:  # pragma: no cover - absent in this container
    _PILImage = None
    _HAVE_PIL = False

# CLIP preprocessing constants (reference model/clip.py:30-37)
_CLIP_SIZE = 224
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def real_decode(media: bytes, mime: str):
    """Real decode: blob → PIL.Image → Resize(bicubic, shorter side 224) →
    CenterCrop(224) → RGB → normalize (mean/std from reference
    model/clip.py:25-52) → channel-pooled N_FEATURES histogram.

    Import-gated: raises NotImplementedError when PIL is absent (this
    container — probed at import, see BASELINE.md blocked deps); runs for
    image mime types wherever PIL is installed. Audio/video decode still
    needs torchaudio/ffmpeg and stays gated."""
    if _HAVE_PIL and (mime or "").startswith("image"):  # pragma: no cover
        import io

        img = _PILImage.open(io.BytesIO(media))
        w0, h0 = img.size
        scale = _CLIP_SIZE / min(w0, h0)
        img = img.resize(
            (round(w0 * scale), round(h0 * scale)), _PILImage.BICUBIC
        )
        w, h = img.size
        left, top = (w - _CLIP_SIZE) // 2, (h - _CLIP_SIZE) // 2
        img = img.crop((left, top, left + _CLIP_SIZE, top + _CLIP_SIZE))
        arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
        arr = (arr - _CLIP_MEAN) / _CLIP_STD
        lum = arr.mean(axis=2)
        hist, _ = np.histogram(lum, bins=N_FEATURES, range=(-3.0, 3.0))
        feats = (hist / hist.sum()).astype(np.float32)
        return w0, h0, 1, feats
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "use deterministic_fake=True for plumbing tests"
    )


def extract_features(
    assets: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """assets(asset_id, kind, media, mime) → geometry + feature vector."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "kind": [], "width": [], "height": [],
                "n_frames": [], "features": [],
            }
            for row in pdf.itertuples(index=False):
                media = bytes(row.media) if row.media is not None else b""
                if deterministic_fake:
                    w, h, nf, feats = _fake_decode(media)
                else:
                    w, h, nf, feats = real_decode(media, row.mime)
                out["asset_id"].append(row.asset_id)
                out["kind"].append(row.kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return assets.mapInPandas(_run, schema=FEATURES_SCHEMA)


def resize_plan(
    features: DataFrame, target: int = 224
) -> DataFrame:
    """Resize geometry (shorter side → target, bicubic semantics planned) —
    the arithmetic of reference clip.py:28-31 Resize+CenterCrop, computed
    as JVM columns (no decode needed)."""
    scale = F.lit(target) / F.least("width", "height")
    return features.select(
        "asset_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("resized_w"),
        F.round(F.col("height") * scale).cast("int").alias("resized_h"),
        F.lit(target).alias("crop"),
    )


def sample_frames(features: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling plan for video assets: frame indices 0, every, 2·every…
    exploded to one row per sampled frame."""
    return features.filter(F.col("kind") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


def fake_assets_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic asset fixtures (binary payloads seeded by id)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048))).astype(
            np.uint8
        ).tobytes()
        rows.append((f"asset-{i}", kind, payload, f"{kind}/x-fake"))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
