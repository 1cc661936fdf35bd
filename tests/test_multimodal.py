"""Multimodal plumbing tests: schema, batch shape, determinism, stub gating."""

import pytest

from clip_as_service_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.fake_assets_df(spark, n=48).repartition(4).cache()


def test_extract_features_fake(spark, assets):
    out = mm.extract_features(assets, deterministic_fake=True)
    rows = out.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r["features"]) == mm.N_FEATURES
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert abs(sum(r["features"]) - 1.0) < 1e-3  # normalized histogram


def test_extract_features_deterministic_across_partitioning(spark, assets):
    a = {r["asset_id"]: r["features"] for r in
         mm.extract_features(assets.repartition(2), deterministic_fake=True).collect()}
    b = {r["asset_id"]: r["features"] for r in
         mm.extract_features(assets.repartition(7), deterministic_fake=True).collect()}
    assert a == b


def test_real_decode_is_gated(spark, assets):
    out = mm.extract_features(assets.limit(1), deterministic_fake=False)
    with pytest.raises(Exception, match="NotImplementedError|decode libraries"):
        out.collect()


def test_resize_plan_geometry(spark, assets):
    feats = mm.extract_features(assets, deterministic_fake=True)
    plan = mm.resize_plan(feats, target=224).collect()
    for r in plan:
        assert min(r["resized_w"], r["resized_h"]) in (223, 224, 225)


def test_binary_file_source_glob(spark, tmp_path):
    """S3 file-glob source (reference DocumentArray.from_files,
    tests/test_simple.py:71-73) → spark.read.format('binaryFile') with
    pathGlobFilter; bytes flow into the same mapInPandas feature extractor."""
    import numpy as np

    rng = np.random.default_rng(9)
    for i in range(6):
        ext = "jpg" if i % 2 == 0 else "txt"
        (tmp_path / f"asset_{i}.{ext}").write_bytes(
            rng.integers(0, 256, size=256).astype(np.uint8).tobytes()
        )
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jpg")
        .load(str(tmp_path))
    )
    rows = df.collect()
    assert len(rows) == 3  # glob filtered
    from pyspark.sql import functions as F

    assets = df.select(
        F.col("path").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("media"),
        F.lit("image/jpeg").alias("mime"),
    )
    feats = mm.extract_features(assets, deterministic_fake=True).collect()
    assert len(feats) == 3 and all(len(r["features"]) == mm.N_FEATURES for r in feats)


def test_sample_frames_only_video(spark, assets):
    feats = mm.extract_features(assets, deterministic_fake=True)
    frames = mm.sample_frames(feats, every=2).collect()
    assert len(frames) > 0
    assert all(r["frame_idx"] % 2 == 0 for r in frames)
    kinds = {r["kind"] for r in feats.collect()}
    assert kinds == {"image", "audio", "video"}
