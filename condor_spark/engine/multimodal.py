"""Multimodal columns: image / video as opaque binary + typed metadata.

Audio is this engine's REAL payload (``audio.py`` — actual codecs, SNR-
checked decode). Image and video follow the same design so a training-data
pipeline can carry every modality through one table shape:

    content     binary        -- opaque encoded payload
    media_type  string        -- 'image' | 'video'
    codec       string        -- e.g. 'rgb8_raw', 'yuv420_raw'
    width, height  int
    n_frames    int           -- 1 for still images
    fps         double        -- 0.0 for still images

The Spark-side plumbing here is real and tested: schemas, Arrow-batched
``mapInPandas`` UDF signatures, per-batch numpy processing, partition
behavior. The *codec* layer is where external libraries (Pillow, ffmpeg,
torchvision) would plug in — none exist in this environment, so:

  * ``rgb8_raw`` / ``yuv420_raw`` ("raw" packed arrays) are implemented for
    real in numpy and exercised by tests — they make the whole pipeline
    executable end-to-end with deterministic synthetic media;
  * compressed codecs (jpeg, png, h264, …) raise ``NotImplementedError``
    with a clear message — STUB: swap ``_decode_frames`` for a real decoder
    to productionize; nothing else changes.

Scale posture: one row = one media object; frames never materialize as rows
(a 30 s 30 fps clip stays ONE binary cell, features are computed inside the
UDF over a numpy view). Batch size is bounded by Arrow's
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low (e.g. 64) for
video tables so a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("media_id string, content binary, media_type string, "
                "codec string, width int, height int, n_frames int, fps double")

RAW_CODECS = ("rgb8_raw", "yuv420_raw")


# ------------------------------------------------------------ codec layer
def _decode_frames(blob: bytes, codec: str, width: int, height: int,
                   n_frames: int) -> np.ndarray:
    """encoded bytes → uint8 array (n_frames, height, width, 3) RGB.

    Real for the raw codecs; STUB for compressed ones (no media libraries in
    this environment) — replace this single function with e.g. a
    Pillow/PyAV-backed decoder to handle jpeg/png/h264.
    """
    if codec == "rgb8_raw":
        a = np.frombuffer(blob, dtype=np.uint8)
        return a.reshape(n_frames, height, width, 3)
    if codec == "yuv420_raw":
        # planar YUV 4:2:0 → RGB (BT.601 full range), vectorized
        ysz, csz = width * height, (width // 2) * (height // 2)
        frames = np.frombuffer(blob, dtype=np.uint8).reshape(n_frames, ysz + 2 * csz)
        y = frames[:, :ysz].reshape(n_frames, height, width).astype(np.float32)
        u = frames[:, ysz:ysz + csz].reshape(n_frames, height // 2, width // 2)
        v = frames[:, ysz + csz:].reshape(n_frames, height // 2, width // 2)
        u = u.repeat(2, axis=1).repeat(2, axis=2).astype(np.float32) - 128.0
        v = v.repeat(2, axis=1).repeat(2, axis=2).astype(np.float32) - 128.0
        r = y + 1.402 * v
        g = y - 0.344136 * u - 0.714136 * v
        b = y + 1.772 * u
        return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: compressed media decode requires an external "
        f"library not present in this environment; implement _decode_frames "
        f"for it (raw codecs {RAW_CODECS} are built in)")


def encode_rgb8(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → rgb8_raw bytes (the synthesis/test encoder)."""
    return np.ascontiguousarray(frames, dtype=np.uint8).tobytes()


def synth_media(i: int, media_type: str = "image", width: int = 32,
                height: int = 24, n_frames: int | None = None,
                seed: int = 42) -> tuple:
    """Deterministic synthetic media row i (pure function of (i, seed)):
    smooth gradient + seeded noise, video rows get a per-frame phase shift."""
    rng = np.random.default_rng(seed + i)
    nf = n_frames if n_frames is not None else (1 if media_type == "image" else 8)
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    base = ((xx * 255 / max(1, width - 1)) * 0.5
            + (yy * 255 / max(1, height - 1)) * 0.5)
    t = np.arange(nf).reshape(nf, 1, 1)
    lum = (base[None] + 20.0 * np.sin(t / 4.0 + i)) % 256
    noise = rng.integers(0, 16, size=(nf, height, width, 3))
    frames = np.clip(lum[..., None] + noise, 0, 255).astype(np.uint8)
    return (f"media-{i:08d}", encode_rgb8(frames), media_type, "rgb8_raw",
            width, height, nf, 0.0 if media_type == "image" else 30.0)


def synth_media_df(spark, n: int, media_type: str = "image",
                   num_partitions: int = 8, **kw) -> DataFrame:
    rows = [synth_media(i, media_type, **kw) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(num_partitions)


# ------------------------------------------------------- feature extraction
FEATURE_SCHEMA = ("media_id string, mean_lum double, std_lum double, "
                  "edge_energy double, n_frames int")


def media_features(df: DataFrame) -> DataFrame:
    """Per-object visual features via Arrow-batched mapInPandas: mean/std
    luminance and a gradient-magnitude edge-energy proxy. All math is numpy
    over whole frame stacks — no per-pixel or per-row Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                frames = _decode_frames(bytes(r.content), r.codec,
                                        r.width, r.height, r.n_frames)
                lum = (0.299 * frames[..., 0] + 0.587 * frames[..., 1]
                       + 0.114 * frames[..., 2])
                gx = np.diff(lum, axis=2)
                gy = np.diff(lum, axis=1)
                out.append((r.media_id, float(lum.mean()), float(lum.std()),
                            float(np.abs(gx).mean() + np.abs(gy).mean()),
                            int(r.n_frames)))
            yield pd.DataFrame(out, columns=["media_id", "mean_lum", "std_lum",
                                             "edge_energy", "n_frames"])

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 4) -> DataFrame:
    """Deterministic frame sampling for video: keep frames 0, k, 2k, … and
    re-emit the row with the thinned payload (still ONE row per object)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                frames = _decode_frames(bytes(r.content), r.codec,
                                        r.width, r.height, r.n_frames)
                kept = np.ascontiguousarray(frames[::every_k])
                rows.append((r.media_id, kept.tobytes(), r.media_type,
                             "rgb8_raw", r.width, r.height, kept.shape[0],
                             float(r.fps) / every_k if r.fps else 0.0))
            yield pd.DataFrame(rows, columns=["media_id", "content",
                                              "media_type", "codec", "width",
                                              "height", "n_frames", "fps"])

    return df.mapInPandas(fn, schema=MEDIA_SCHEMA)


def resize_nearest(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure-numpy index math — the real thing, not a
    stub; bilinear/lanczos would come with an imaging library)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                frames = _decode_frames(bytes(r.content), r.codec,
                                        r.width, r.height, r.n_frames)
                yi = (np.arange(out_h) * r.height // out_h)
                xi = (np.arange(out_w) * r.width // out_w)
                resized = np.ascontiguousarray(frames[:, yi][:, :, xi])
                rows.append((r.media_id, resized.tobytes(), r.media_type,
                             "rgb8_raw", out_w, out_h, r.n_frames, float(r.fps)))
            yield pd.DataFrame(rows, columns=["media_id", "content",
                                              "media_type", "codec", "width",
                                              "height", "n_frames", "fps"])

    return df.mapInPandas(fn, schema=MEDIA_SCHEMA)
