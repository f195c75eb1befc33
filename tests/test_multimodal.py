"""Multimodal plumbing: real raw codecs + stubbed compressed decode.

The Spark-side shape (schemas, Arrow batching, one-row-per-object) is real
and tested; compressed codecs raise NotImplementedError by design (no media
libraries in this environment)."""

import numpy as np
import pytest

from condor_spark.engine import multimodal as mm


def test_yuv_rgb_roundtrip_grey():
    # grey ramp: U=V=128 → R=G=B=Y exactly
    w, h, nf = 8, 6, 2
    y = (np.arange(nf * w * h) % 256).astype(np.uint8).reshape(nf, h * w)
    u = np.full((nf, (h // 2) * (w // 2)), 128, dtype=np.uint8)
    blob = np.concatenate([y, u, u], axis=1).tobytes()
    rgb = mm._decode_frames(blob, "yuv420_raw", w, h, nf)
    assert rgb.shape == (nf, h, w, 3)
    assert (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 1] == rgb[..., 2]).all()
    assert (rgb[..., 0].reshape(nf, -1) == y).all()


def test_compressed_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="jpeg"):
        mm._decode_frames(b"\xff\xd8\xff", "jpeg", 1, 1, 1)


def test_media_features_and_transforms(spark):
    imgs = mm.synth_media_df(spark, 24, "image", num_partitions=4)
    vids = mm.synth_media_df(spark, 6, "video", num_partitions=2)

    feats = mm.media_features(imgs).toPandas()
    assert len(feats) == 24 and feats["n_frames"].eq(1).all()
    assert feats["mean_lum"].between(1, 255).all()
    # deterministic: same (i, seed) → same features
    feats2 = mm.media_features(mm.synth_media_df(spark, 24, "image",
                                                 num_partitions=7)).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    assert np.allclose(a["mean_lum"], b["mean_lum"])

    sampled = mm.frame_sample(vids, every_k=4).toPandas()
    assert sampled["n_frames"].eq(2).all()            # 8 frames → 0,4
    assert sampled["fps"].eq(30.0 / 4).all()

    small = mm.resize_nearest(imgs, 8, 6).toPandas()
    assert small["width"].eq(8).all() and small["height"].eq(6).all()
    r0 = small.iloc[0]
    assert len(r0["content"]) == 8 * 6 * 3 * r0["n_frames"]
