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


class TestPNG:
    """Stdlib PNG codec: round-trips against encode_rgb8 ground truth."""

    def test_roundtrip_all_filters(self):
        import numpy as np

        from condor_spark.engine.multimodal import (decode_png, encode_png,
                                                    synth_media)
        _, blob, _, _, w, h, nf, _ = synth_media(3, "image", width=37,
                                                 height=23)
        img = np.frombuffer(blob, dtype=np.uint8).reshape(h, w, 3)
        for cycle in ((0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)):
            enc = encode_png(img, filter_cycle=cycle)
            assert (decode_png(enc) == img).all(), cycle

    def test_gray_and_rgba(self):
        import numpy as np

        from condor_spark.engine.multimodal import decode_png, encode_png
        rng = np.random.default_rng(5)
        gray = rng.integers(0, 256, (11, 17), dtype=np.uint8)
        got = decode_png(encode_png(gray, filter_cycle=(4,), color_type=0))
        assert (got == np.repeat(gray[:, :, None], 3, axis=2)).all()
        rgba = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
        got = decode_png(encode_png(rgba, filter_cycle=(3, 1), color_type=6))
        assert (got == rgba[:, :, :3]).all()

    def test_unsupported_raises(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from condor_spark.engine.multimodal import decode_png, encode_png
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"notapng")
        # hand-build a 16-bit-depth IHDR: must refuse, not decode garbage
        ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
        crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        blob = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR"
                + ihdr + struct.pack(">I", crc))
        with pytest.raises(NotImplementedError, match="depth=16"):
            decode_png(blob)

    def test_media_features_over_png_rows(self, spark):
        """The pipeline accepts mixed raw + png rows in one table: same
        features for the same pixels regardless of codec."""
        import numpy as np
        import pandas as pd

        from condor_spark.engine.multimodal import (MEDIA_SCHEMA, encode_png,
                                                    media_features,
                                                    synth_media)
        rows_raw, rows_png = [], []
        for i in range(6):
            mid, blob, mt, codec, w, h, nf, fps = synth_media(
                i, "image", width=24, height=16)
            img = np.frombuffer(blob, dtype=np.uint8).reshape(h, w, 3)
            rows_raw.append((f"{mid}-raw", blob, mt, codec, w, h, nf, fps))
            rows_png.append((f"{mid}-png", encode_png(img, (i % 5,)), mt,
                             "png", w, h, nf, fps))
        df = spark.createDataFrame(rows_raw + rows_png, MEDIA_SCHEMA)
        got = media_features(df).toPandas()
        got["base"] = got["media_id"].str.rsplit("-", n=1).str[0]
        got["kind"] = got["media_id"].str.rsplit("-", n=1).str[1]
        piv = got.pivot(index="base", columns="kind",
                        values=["mean_lum", "std_lum", "edge_energy"])
        for m in ("mean_lum", "std_lum", "edge_energy"):
            assert np.allclose(piv[(m, "raw")], piv[(m, "png")], rtol=0,
                               atol=0)
