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
    # jpeg/png are real now; motion-compensated video stays an honest stub
    with pytest.raises(NotImplementedError, match="h264"):
        mm._decode_frames(b"\x00\x00\x01", "h264", 1, 1, 1)


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


class TestJPEG:
    """Baseline T.81 codec (pure numpy/stdlib): structural constants checked
    against the standard's literals, round-trips bounded by PSNR, and the
    Spark pipeline accepting mixed raw + jpeg rows."""

    def _psnr(self, a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)

    def test_zigzag_matches_standard_literal(self):
        from condor_spark.engine.jpeg import ZIGZAG
        lit = np.array([
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
        assert (ZIGZAG == lit).all()

    def test_dct_is_orthonormal(self):
        from condor_spark.engine.jpeg import _M, _dct2, _idct2
        assert np.allclose(_M @ _M.T, np.eye(8), atol=1e-12)
        x = np.random.default_rng(0).uniform(-128, 127, (5, 8, 8))
        assert np.allclose(_idct2(_dct2(x)), x, atol=1e-9)

    def test_roundtrip_matrix(self):
        """Every decoder path: 4:4:4, 4:2:0, restart intervals, quality
        sweep, odd dimensions — PSNR-bounded against the source pixels."""
        from condor_spark.engine.jpeg import decode_jpeg, encode_jpeg
        rng = np.random.default_rng(7)
        xx, yy = np.meshgrid(np.arange(48), np.arange(40))
        base = (xx * 2.5 + yy * 3.1) % 256
        img = np.clip(np.stack([base, 255 - base, base / 2], -1)
                      + rng.integers(0, 8, (40, 48, 3)), 0,
                      255).astype(np.uint8)
        for q, sub, ri, floor in [(95, False, 0, 40.0), (90, True, 0, 36.0),
                                  (75, True, 3, 34.0), (95, False, 2, 40.0),
                                  (50, False, 0, 32.0)]:
            dec = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub,
                                          restart_interval=ri))
            assert dec.shape == img.shape
            assert self._psnr(img, dec) >= floor, (q, sub, ri)
        odd = img[:33, :41]
        dec = decode_jpeg(encode_jpeg(odd, quality=90, subsample=True))
        assert dec.shape == odd.shape and self._psnr(odd, dec) >= 34.0

    def test_flat_and_gray(self):
        from condor_spark.engine.jpeg import decode_jpeg, encode_jpeg
        flat = np.full((17, 23, 3), 130, np.uint8)
        assert (decode_jpeg(encode_jpeg(flat, quality=90)) == 130).all()
        g = ((np.arange(24 * 32) * 7) % 256).astype(np.uint8).reshape(24, 32)
        dec = decode_jpeg(encode_jpeg(g, quality=95))
        assert dec.shape == (24, 32, 3)
        assert (dec[..., 0] == dec[..., 1]).all()
        assert self._psnr(np.repeat(g[:, :, None], 3, 2), dec) >= 40.0

    def test_unsupported_raises(self):
        from condor_spark.engine.jpeg import decode_jpeg, encode_jpeg
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"notajpeg")
        blob = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
        prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(NotImplementedError, match="baseline"):
            decode_jpeg(prog)

    def test_media_features_over_jpeg_rows(self, spark):
        """Mixed raw + jpeg rows in one table: lossy codec, so features
        match within a quality-95 tolerance instead of exactly."""
        from condor_spark.engine.jpeg import encode_jpeg
        from condor_spark.engine.multimodal import (MEDIA_SCHEMA,
                                                    media_features,
                                                    synth_media)
        rows = []
        for i in range(6):
            mid, blob, mt, codec, w, h, nf, fps = synth_media(
                i, "image", width=24, height=16)
            img = np.frombuffer(blob, dtype=np.uint8).reshape(h, w, 3)
            rows.append((f"{mid}-raw", blob, mt, codec, w, h, nf, fps))
            rows.append((f"{mid}-jpeg", encode_jpeg(img, quality=95,
                                                    subsample=bool(i % 2)),
                         mt, "jpeg", w, h, nf, fps))
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = media_features(df).toPandas()
        got["base"] = got["media_id"].str.rsplit("-", n=1).str[0]
        got["kind"] = got["media_id"].str.rsplit("-", n=1).str[1]
        piv = got.pivot(index="base", columns="kind",
                        values=["mean_lum", "std_lum"])
        assert np.allclose(piv[("mean_lum", "raw")],
                           piv[("mean_lum", "jpeg")], atol=1.5)
        assert np.allclose(piv[("std_lum", "raw")],
                           piv[("std_lum", "jpeg")], atol=3.0)


def test_mjpeg_video_pipeline(spark):
    """Compressed VIDEO end-to-end: mjpeg rows flow through media_features
    and frame_sample; per-frame PSNR bounded vs the raw source frames."""
    from condor_spark.engine.multimodal import (MEDIA_SCHEMA, decode_mjpeg,
                                                encode_mjpeg, frame_sample,
                                                media_features, synth_media)

    rows_raw, rows_mj = [], []
    for i in range(4):
        mid, blob, mt, codec, w, h, nf, fps = synth_media(
            i, "video", width=32, height=24)
        frames = np.frombuffer(blob, dtype=np.uint8).reshape(nf, h, w, 3)
        rows_raw.append((f"{mid}-raw", blob, mt, codec, w, h, nf, fps))
        rows_mj.append((f"{mid}-mjpeg", encode_mjpeg(frames, quality=95),
                        mt, "mjpeg", w, h, nf, fps))
        dec = decode_mjpeg(rows_mj[-1][1])
        assert dec.shape == frames.shape
        mse = np.mean((dec.astype(float) - frames.astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) >= 32.0

    df = spark.createDataFrame(rows_raw + rows_mj, MEDIA_SCHEMA)
    feats = media_features(df).toPandas()
    feats["base"] = feats["media_id"].str.rsplit("-", n=1).str[0]
    feats["kind"] = feats["media_id"].str.rsplit("-", n=1).str[1]
    piv = feats.pivot(index="base", columns="kind", values=["mean_lum"])
    assert np.allclose(piv[("mean_lum", "raw")], piv[("mean_lum", "mjpeg")],
                       atol=1.5)
    # frame sampling decodes mjpeg and re-emits thinned raw payloads
    sampled = frame_sample(
        spark.createDataFrame(rows_mj, MEDIA_SCHEMA), every_k=4).toPandas()
    assert sampled["n_frames"].eq(2).all()
    assert sampled["codec"].eq("rgb8_raw").all()
