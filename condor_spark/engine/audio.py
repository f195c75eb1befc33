"""Audio payload: codecs, deterministic synthesis, vectorized decode+features.

The north rule's input is an Iceberg/parquet table of audio clip + transcript
pairs: (clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string). This module provides:

  * numpy codecs — pcm_s16le, pcm_u8, mulaw (continuous mu-law companding,
    mu=255; the smooth form of ITU G.711) — encode/decode as pure array math;
  * deterministic per-clip synthesis (two sinusoids + uniform noise, rng
    seeded 42+i) used by the fixture generator AND as the ground truth for
    the per-row invariant: decoded PCM must reach SNR >= 30 dB vs the
    pre-encoding waveform, transcript must round-trip byte-equal;
  * ``decode_features`` — mapInPandas feature extraction (no per-row Python
    math: every op is numpy over whole clips / Arrow batches): RMS, peak,
    zero-crossing rate, and energy quantiles over ``n_frames``
    duration-normalized frames.

No external audio libraries are used (none are available in this
environment); the codecs above are real implementations, not stubs. Two more
real codecs round out the set:

  * alaw — continuous A-law companding (A = 87.6, the smooth form of the
    other ITU G.711 half) — byte-LUT decode like mulaw;
  * adpcm_ima — IMA/DVI ADPCM, a genuinely COMPRESSED codec (4 bits/sample,
    4:1 vs pcm_s16le). Blocks are WAV-style and self-contained (int16
    predictor + step index in each block header), so decode is
    embarrassingly parallel ACROSS blocks: the sequential nibble recurrence
    runs as a loop of length samples-per-block with every step vectorized
    over all blocks of the clip. A 4-byte little-endian sample-count prefix
    replaces the RIFF container (parquet cells must be self-describing).
    ADPCM's round-trip bound is its own (>= 20 dB on the synthetic clips,
    measured min 22 dB — the inherent cost of 4-bit adaptive deltas on
    broadband content), so the fixture mix that carries the 30 dB per-row
    invariant stays on the first three codecs.

A LOSSLESS compressed codec completes the set:

  * lpc_fixed — Shorten/FLAC-style lossless coding: per 4096-sample frame,
    the best of FLAC's five FIXED linear predictors (orders 0-4, i.e. the
    o-th finite difference of the int16 samples) is chosen by residual
    size, and the zigzag-mapped residuals are bit-packed at per-256-sample
    partition widths (the vectorizable stand-in for FLAC's Rice
    partitions: fixed width per partition instead of variable-length Rice
    codes, so BOTH encode and decode are whole-array numpy — no
    per-sample Python). Round-trip is bit-exact on the int16 lattice
    (SNR = inf vs the pcm_s16le rendering), ~0.7x pcm_s16le size on the
    synthetic clips (noise-dominated; pure tones compress far harder).
    A 4-byte sample-count prefix replaces the container, as with ADPCM.

Codecs beyond these (perceptual formats — mp3/opus/aac) genuinely need
absent libraries and stay behind NotImplementedError.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

MU = 255.0
A_LAW = 87.6
CODECS = ("pcm_s16le", "pcm_u8", "mulaw", "alaw", "adpcm_ima", "lpc_fixed")


# --------------------------------------------------------------- codecs
def encode(wave: np.ndarray, codec: str) -> bytes:
    """float waveform in [-1, 1] → encoded bytes."""
    x = np.clip(np.asarray(wave, dtype=np.float64), -1.0, 1.0)
    if codec == "pcm_s16le":
        return (x * 32767.0).round().astype("<i2").tobytes()
    if codec == "pcm_u8":
        return ((x * 127.0).round() + 128).clip(0, 255).astype(np.uint8).tobytes()
    if codec == "mulaw":
        y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
        return ((y + 1.0) / 2.0 * 255.0).round().clip(0, 255).astype(np.uint8).tobytes()
    if codec == "alaw":
        ax = np.abs(x)
        denom = 1.0 + np.log(A_LAW)
        y = np.sign(x) * np.where(ax < 1.0 / A_LAW,
                                  A_LAW * ax / denom,
                                  (1.0 + np.log(np.maximum(A_LAW * ax, 1.0)))
                                  / denom)
        return ((y + 1.0) / 2.0 * 255.0).round().clip(0, 255).astype(np.uint8).tobytes()
    if codec == "adpcm_ima":
        return _adpcm_encode(x)
    if codec == "lpc_fixed":
        return _lpc_encode(x)
    raise NotImplementedError(f"codec {codec!r} not supported")


def _byte_luts() -> dict[str, np.ndarray]:
    """256-entry decode tables for the byte codecs — decoding becomes one
    gather instead of transcendental math per sample (mulaw measured
    341 → 95µs per clip, bit-identical: each table entry is the original
    formula evaluated at that byte value)."""
    b = np.arange(256, dtype=np.float64)
    y = b / 255.0 * 2.0 - 1.0
    ay = np.abs(y) * (1.0 + np.log(A_LAW))
    return {
        "pcm_u8": ((b.astype(np.float32) - np.float32(128.0)) / np.float32(127.0)),
        "mulaw": (np.sign(y) * np.expm1(np.abs(y) * np.log1p(MU)) / MU
                  ).astype(np.float32),
        "alaw": (np.sign(y) * np.where(ay < 1.0, ay / A_LAW,
                                       np.exp(ay - 1.0) / A_LAW)
                 ).astype(np.float32),
    }


_BYTE_LUT = _byte_luts()


# IMA/DVI ADPCM constants (public tables from the IMA ADPCM spec /
# Microsoft WAVE_FORMAT_DVI_ADPCM; same values wav/libsndfile use).
_ADPCM_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32)
_ADPCM_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
ADPCM_BLOCK_BYTES = 256
_ADPCM_DATA_BYTES = ADPCM_BLOCK_BYTES - 4
ADPCM_SAMPLES_PER_BLOCK = 1 + 2 * _ADPCM_DATA_BYTES  # 505


def _adpcm_reconstruct(nib, pred, step):
    """The decoder's predictor update — shared verbatim by the encoder so
    both sides stay in lockstep (any drift would compound per sample)."""
    diff = (step >> 3) + np.where(nib & 4, step, 0) \
        + np.where(nib & 2, step >> 1, 0) + np.where(nib & 1, step >> 2, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    return np.clip(pred, -32768, 32767)


def _adpcm_encode(x: np.ndarray) -> bytes:
    """float waveform → length-prefixed IMA ADPCM blocks.

    Sequential in the sample dimension (the step-size recurrence is a state
    machine) but VECTORIZED across blocks: every iteration of the
    505-step loop processes all blocks of the clip at once. Block headers
    carry (predictor=first sample, step index), so blocks are independent —
    the initial step index per block is estimated from the block's mean
    |delta| (searchsorted into the step table), which is what makes
    cross-block vectorization possible without the usual carried index."""
    s = np.clip(np.round(np.clip(np.asarray(x, dtype=np.float64), -1.0, 1.0)
                         * 32767.0), -32768, 32767).astype(np.int32)
    n = int(s.size)
    if n == 0:
        return struct.pack("<I", 0)
    spb = ADPCM_SAMPLES_PER_BLOCK
    nb = -(-n // spb)
    padded = np.empty(nb * spb, dtype=np.int32)
    padded[:n] = s
    padded[n:] = s[-1]
    S = padded.reshape(nb, spb)

    pred = S[:, 0].copy()
    mad = np.abs(np.diff(S, axis=1)).mean(axis=1)
    idx0 = np.clip(np.searchsorted(_ADPCM_STEPS, mad), 0, 88).astype(np.int32)
    idx = idx0.copy()
    nibs = np.empty((nb, spb - 1), dtype=np.uint8)
    for j in range(1, spb):
        step = _ADPCM_STEPS[idx]
        diff = S[:, j] - pred
        nib = np.where(diff < 0, 8, 0)
        d = np.abs(diff)
        b4 = d >= step
        d = d - step * b4
        h = step >> 1
        b2 = d >= h
        d = d - h * b2
        b1 = d >= (step >> 2)
        nib = nib | (b4 << 2) | (b2 << 1) | b1
        pred = _adpcm_reconstruct(nib, pred, step)
        idx = np.clip(idx + _ADPCM_INDEX[nib & 7], 0, 88)
        nibs[:, j - 1] = nib
    blocks = np.empty((nb, ADPCM_BLOCK_BYTES), dtype=np.uint8)
    blocks[:, :2] = S[:, 0].astype("<i2").view(np.uint8).reshape(nb, 2)
    blocks[:, 2] = idx0
    blocks[:, 3] = 0
    blocks[:, 4:] = nibs[:, 0::2] | (nibs[:, 1::2] << 4)
    return struct.pack("<I", n) + blocks.tobytes()


def _adpcm_decode(blob) -> np.ndarray:
    """Length-prefixed IMA ADPCM blocks → float32 waveform.

    Accepts bytes OR a contiguous uint8 view (the Arrow fast path hands us
    zero-copy RecordBatch slices). The nibble recurrence loops over the 504
    in-block positions with every operation vectorized across blocks."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    n = int(raw[:4].copy().view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.float32)
    body = raw[4:]
    nb = body.size // ADPCM_BLOCK_BYTES
    blocks = body[:nb * ADPCM_BLOCK_BYTES].reshape(nb, ADPCM_BLOCK_BYTES)
    pred = blocks[:, :2].copy().view("<i2").astype(np.int32).ravel()
    idx = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    data = blocks[:, 4:]
    nibs = np.empty((nb, 2 * _ADPCM_DATA_BYTES), dtype=np.int32)
    nibs[:, 0::2] = data & 0x0F
    nibs[:, 1::2] = data >> 4
    out = np.empty((nb, ADPCM_SAMPLES_PER_BLOCK), dtype=np.int16)
    out[:, 0] = pred
    for j in range(nibs.shape[1]):
        nib = nibs[:, j]
        pred = _adpcm_reconstruct(nib, pred, _ADPCM_STEPS[idx])
        idx = np.clip(idx + _ADPCM_INDEX[nib & 7], 0, 88)
        out[:, j + 1] = pred
    return out.reshape(-1)[:n].astype(np.float32) / np.float32(32767.0)


_LPC_FRAME = 4096
_LPC_PART = 256
_POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def _lpc_part_widths(zz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-partition (bit width, size). Width = exact integer bit_length of
    the partition max via searchsorted into powers of two (float log2 can
    misround at exact powers)."""
    m = zz.size
    n_parts = -(-m // _LPC_PART) if m else 0
    sizes = np.full(n_parts, _LPC_PART, dtype=np.int64)
    if n_parts:
        sizes[-1] = m - _LPC_PART * (n_parts - 1)
    padded = np.zeros(n_parts * _LPC_PART, dtype=np.uint64)
    padded[:m] = zz
    mx = padded.reshape(n_parts, _LPC_PART).max(axis=1) if n_parts else padded
    widths = np.searchsorted(_POW2, mx, side="right").astype(np.int64)
    return widths, sizes


# shared scratch: frames are <= 4096 residuals of <= 21 bits, so one cached
# arange covers any frame's bit span
_LPC_ARANGE = np.arange(_LPC_FRAME * 22, dtype=np.int64)
_EXP2F = np.exp2(np.arange(64, dtype=np.float64))


def _lpc_groups(widths, sizes):
    """Iterate partitions grouped by (width, size): partition indices, their
    bit-start offsets and residual-start offsets. All partitions share size
    _LPC_PART except possibly the last, so there are at most
    #distinct-widths + 1 groups — the per-BIT work inside a group is 2-D
    gathers and one GEMV, never per-bit index arrays."""
    bit_starts = np.concatenate(([0], np.cumsum(widths * sizes)))[:-1]
    res_starts = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    keys = widths * (_LPC_PART + 1) + sizes
    for key in np.unique(keys):
        sel = np.nonzero(keys == key)[0]
        w, sz = int(widths[sel[0]]), int(sizes[sel[0]])
        yield w, sz, bit_starts[sel], res_starts[sel]


def _lpc_encode(x: np.ndarray) -> bytes:
    """float waveform → length-prefixed lossless fixed-LPC frames.

    Per 4096-sample frame: pick the fixed predictor order o in 0..4 whose
    residual (the o-th finite difference of the int16 samples — FLAC's
    fixed predictors) packs smallest, zigzag the residuals, and bit-pack
    each 256-sample partition at its own width (max bits needed in that
    partition). Frame layout, byte-aligned:

      [order u8][n_res u16le][warmup o × i2le][widths u8 × n_parts]
      [packed residual bits, zero-padded to a byte]

    Everything is whole-array numpy — the only Python loops are per frame
    (~8/clip) and the 5 candidate orders."""
    s = np.clip(np.round(np.clip(np.asarray(x, dtype=np.float64), -1.0, 1.0)
                         * 32767.0), -32768, 32767).astype(np.int64)
    n = int(s.size)
    out = [struct.pack("<I", n)]
    for f0 in range(0, n, _LPC_FRAME):
        fr = s[f0:f0 + _LPC_FRAME]
        best, best_bits = None, None
        for o in range(min(4, fr.size - 1) + 1):
            res = np.diff(fr, n=o)
            zz = ((res << 1) ^ (res >> 63)).astype(np.uint64)  # zigzag
            widths, sizes = _lpc_part_widths(zz)
            bits = int((widths * sizes).sum()) + 8 * (3 + 2 * o + widths.size)
            if best_bits is None or bits < best_bits:
                best, best_bits = (o, zz, widths, sizes), bits
        o, zz, widths, sizes = best
        head = struct.pack("<BH", o, zz.size)
        head += fr[:o].astype("<i2").tobytes()
        head += bytes(widths.tolist())
        total = int((widths * sizes).sum())
        bits = np.zeros(total, dtype=np.uint8)
        for w, sz, b0, r0 in _lpc_groups(widths, sizes):
            if w == 0:
                continue
            vals = zz[(r0[:, None] + _LPC_ARANGE[:sz]).ravel()]
            mat = ((vals[:, None] >> np.arange(w - 1, -1, -1,
                                               dtype=np.uint64))
                   & np.uint64(1)).astype(np.uint8)
            bits[(b0[:, None] + _LPC_ARANGE[:sz * w]).ravel()] = mat.ravel()
        out.append(head + np.packbits(bits).tobytes())
    return b"".join(out)


def _lpc_decode(blob) -> np.ndarray:
    """Length-prefixed fixed-LPC frames → float32 waveform (bit-exact
    inverse of ``_lpc_encode``: unpack widths → residuals → o-fold
    cumulative sum seeded by the warmup samples)."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    n = int(raw[:4].copy().view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.float32)
    pos = 4
    frames = []
    while pos < raw.size:
        o = int(raw[pos])
        m = int(raw[pos + 1:pos + 3].copy().view("<u2")[0])
        pos += 3
        warm = raw[pos:pos + 2 * o].copy().view("<i2").astype(np.int64)
        pos += 2 * o
        n_parts = -(-m // _LPC_PART) if m else 0
        widths = raw[pos:pos + n_parts].astype(np.int64)
        pos += n_parts
        sizes = np.full(n_parts, _LPC_PART, dtype=np.int64)
        if n_parts:
            sizes[-1] = m - _LPC_PART * (n_parts - 1)
        total_bits = int((widths * sizes).sum())
        nbytes = -(-total_bits // 8)
        bits = np.unpackbits(raw[pos:pos + nbytes])
        pos += nbytes
        zz = np.zeros(m, dtype=np.uint64)
        for w, sz, b0, r0 in _lpc_groups(widths, sizes):
            if w == 0:
                continue
            # (n_parts, sz*w) gather → (n_res, w) @ pow2 GEMV; widths are
            # <= 21 bits (order-4 diff of int16), so float64 dots are exact
            seg = bits[(b0[:, None] + _LPC_ARANGE[:sz * w]).ravel()]
            vals = (seg.reshape(-1, w).astype(np.float64)
                    @ _EXP2F[w - 1::-1][:w])
            zz[(r0[:, None] + _LPC_ARANGE[:sz]).ravel()] = \
                vals.astype(np.uint64)
        res = ((zz >> np.uint64(1)).astype(np.int64)
               ^ -(zz & np.uint64(1)).astype(np.int64))  # un-zigzag
        # o-fold integration: D^d(frame) = cumsum([D^d(frame)[0]] + D^{d+1});
        # the d-th difference's head is computable from the warmup alone
        fr = res
        for d in range(o - 1, -1, -1):
            fr = np.concatenate(([np.diff(warm, n=d)[0]], fr)).cumsum()
        frames.append(fr)
    out = np.concatenate(frames)[:n]
    return out.astype(np.float32) / np.float32(32767.0)


def decode(blob: bytes, codec: str) -> np.ndarray:
    """encoded bytes → float32 waveform in [-1, 1]."""
    if codec == "pcm_s16le":
        return (np.frombuffer(blob, dtype="<i2").astype(np.float32) / 32767.0)
    lut = _BYTE_LUT.get(codec)
    if lut is not None:
        return lut[np.frombuffer(blob, dtype=np.uint8)]
    if codec == "adpcm_ima":
        return _adpcm_decode(blob)
    if codec == "lpc_fixed":
        return _lpc_decode(blob)
    raise NotImplementedError(f"codec {codec!r} not supported")


def snr_db(ref: np.ndarray, dec: np.ndarray) -> float:
    """Signal-to-noise ratio of a decoded clip vs its reference waveform."""
    ref = np.asarray(ref, dtype=np.float64)
    dec = np.asarray(dec, dtype=np.float64)
    noise = ref - dec
    p_sig = float((ref ** 2).mean())
    p_noise = float((noise ** 2).mean())
    if p_noise == 0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise)


# --------------------------------------------------------------- synthesis
def synth_wave(i: int, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic per-clip waveform: two sinusoids + uniform noise,
    rng = default_rng(42 + i) (FIXTURES.md F1). Peak-normalized to 0.9 so
    every fixture codec (CODECS[:3]) clears the 30 dB SNR invariant;
    adpcm_ima carries its own >= 20 dB bound (module docstring)."""
    rng = np.random.default_rng(42 + int(i))
    n = max(1, int(round(dur_ms * sr_hz / 1000.0)))
    t = np.arange(n, dtype=np.float64) / sr_hz
    f1, f2 = rng.uniform(80.0, 1000.0), rng.uniform(1000.0, min(4000.0, sr_hz / 2.5))
    p1, p2 = rng.uniform(0, 2 * np.pi, size=2)
    a1, a2 = rng.uniform(0.4, 1.0), rng.uniform(0.1, 0.5)
    noise_amp = rng.uniform(0.01, 0.05)
    w = (a1 * np.sin(2 * np.pi * f1 * t + p1)
         + a2 * np.sin(2 * np.pi * f2 * t + p2)
         + noise_amp * rng.uniform(-1.0, 1.0, size=n))
    w *= 0.9 / max(1e-9, np.abs(w).max())
    return w.astype(np.float32)


# --------------------------------------------------------------- features
FEATURE_COLS = ("clip_id string, codec string, sr_hz int, dur_ms int, "
                "n_samples long, rms double, peak double, zcr double, "
                "e_q25 double, e_q50 double, e_q75 double, e_q95 double, "
                "n_tokens int")
FEATURE_SCHEMA = FEATURE_COLS  # backwards-compat alias


_QS = np.array([0.25, 0.5, 0.75, 0.95])


def _quantiles_sorted(e: np.ndarray) -> np.ndarray:
    """np.quantile(e, _QS) without its ~80µs dispatch overhead —
    bit-identical because it mirrors numpy's TWO-SIDED _lerp: for
    gamma < 0.5 the result is a + gamma*(b-a), but for gamma >= 0.5 numpy
    computes b - (b-a)*(1-gamma), which can differ in the last ulp."""
    e = np.sort(e)
    vi = _QS * (e.size - 1)
    lo = vi.astype(np.int64)
    hi = np.minimum(lo + 1, e.size - 1)
    gamma = vi - lo
    a, b = e[lo], e[hi]
    out = a + gamma * (b - a)
    m = gamma >= 0.5
    out[m] = b[m] - (b[m] - a[m]) * (1.0 - gamma[m])
    return out


def clip_features(wave: np.ndarray, n_frames: int = 20) -> dict:
    """Per-clip features; frames are duration-normalized (always n_frames
    regardless of dur_ms, so features are comparable across clip lengths).

    One squared-copy pass feeds both RMS and frame energies; quantiles and
    zero-crossings avoid numpy's per-call dispatch overhead (measured 473 →
    ~210µs per 30k-sample clip, same values bit-for-bit)."""
    n = wave.size
    sq = wave.astype(np.float64) ** 2 if n else None
    rms = float(np.sqrt(sq.mean())) if n else 0.0
    peak = float(max(wave.max(), -wave.min())) if n else 0.0
    if n > 1:
        s = np.signbit(wave)
        zcr = float(np.count_nonzero(s[1:] != s[:-1]) / (n - 1))
    else:
        zcr = 0.0
    usable = (n // n_frames) * n_frames
    if usable >= n_frames:
        energy = sq[:usable].reshape(n_frames, -1).mean(axis=1)
        q = _quantiles_sorted(energy)
    else:
        q = np.full(4, rms ** 2)
    return {"n_samples": n, "rms": rms, "peak": peak, "zcr": zcr,
            "e_q25": float(q[0]), "e_q50": float(q[1]),
            "e_q75": float(q[2]), "e_q95": float(q[3])}


def clip_spectral(wave: np.ndarray, sr_hz: int) -> dict:
    """Spectral shape of one clip from a single whole-clip rfft power
    spectrum (no framing — these are clip-level routing/quality features,
    not frame-level ASR features):

      centroid_hz   power-weighted mean frequency
      bandwidth_hz  power-weighted std dev around the centroid
      rolloff_hz    lowest frequency below which 85% of power sits
      flatness      geometric / arithmetic mean of power (1 = white noise,
                    → 0 for pure tones); DC excluded so silence is 0
    """
    n = int(np.asarray(wave).size)
    if n < 2:
        return {"centroid_hz": 0.0, "bandwidth_hz": 0.0,
                "rolloff_hz": 0.0, "flatness": 0.0}
    p = np.abs(np.fft.rfft(np.asarray(wave, dtype=np.float64))) ** 2
    p[0] = 0.0  # DC carries no pitch information
    freqs = np.fft.rfftfreq(n, d=1.0 / sr_hz)
    tot = float(p.sum())
    if tot <= 0.0:
        return {"centroid_hz": 0.0, "bandwidth_hz": 0.0,
                "rolloff_hz": 0.0, "flatness": 0.0}
    c = float((freqs * p).sum() / tot)
    bw = float(np.sqrt(((freqs - c) ** 2 * p).sum() / tot))
    roll = float(freqs[np.searchsorted(np.cumsum(p), 0.85 * tot)])
    pk = p[1:]
    flat = float(np.exp(np.log(pk + 1e-30).mean()) / max(pk.mean(), 1e-30))
    return {"centroid_hz": c, "bandwidth_hz": bw, "rolloff_hz": roll,
            "flatness": flat}


_SPECTRAL_COLS = ("clip_id string, codec string, sr_hz int, "
                  "centroid_hz double, bandwidth_hz double, "
                  "rolloff_hz double, flatness double")


def spectral_features(df, passthrough: tuple[str, ...] = ()):
    """mapInPandas: decode each clip and extract spectral-shape features
    (``clip_spectral``). A SEPARATE operator from ``decode_features`` on
    purpose: the rfft costs ~0.5 ms per 30k-sample clip, so pipelines that
    only need the time-domain features never pay for it — compose both by
    running each over the source (the scan is the shared cost, PLANS.md
    §13) or by materializing features once (``--mode features``).

    Plain ``mapInPandas`` here, not the Arrow buffer-view path: the rfft
    (~0.5 ms per 30k-sample clip) dominates the per-row ``bytes``
    materialization the Arrow path exists to avoid (~tens of µs), so the
    zero-copy machinery would buy a few percent on a kernel-bound
    operator — the opposite economics of ``decode_features_arrow``."""
    extra_schema = "".join(
        f", {c} {dict(df.dtypes)[c]}" for c in passthrough)
    _SKEYS = ("centroid_hz", "bandwidth_hz", "rolloff_hz", "flatness")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = len(pdf)
            feats = {k: np.empty(m) for k in _SKEYS}
            bts = pdf["bytes"].to_numpy()
            cod = pdf["codec"].to_numpy()
            srs = pdf["sr_hz"].to_numpy()
            for i in range(m):
                f = clip_spectral(decode(bts[i], cod[i]), int(srs[i]))
                for k in _SKEYS:
                    feats[k][i] = f[k]
            out = {"clip_id": pdf["clip_id"].to_numpy(), "codec": cod,
                   "sr_hz": srs, **feats}
            for c in passthrough:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=_SPECTRAL_COLS + extra_schema)


def decode_features(df, n_frames: int = 20, passthrough: tuple[str, ...] = ()):
    """mapInPandas: decode each clip and extract features.

    This is the NYCExtractKeyField analogue for the audio payload
    (``benchmark/.../CountMinAccuracy.java:46``): downstream synopses
    summarize the feature columns, not raw bytes.

    ``passthrough`` carries extra columns (e.g. the event-time ``ts``)
    through the decode in one pass — never re-join on clip_id afterwards;
    that would re-read (or regenerate) the multi-KB ``bytes`` column and
    shuffle it.
    """
    extra_schema = "".join(
        f", {c} {dict(df.dtypes)[c]}" for c in passthrough)

    _FKEYS = ("rms", "peak", "zcr", "e_q25", "e_q50", "e_q75", "e_q95")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # columnar assembly: per-clip numpy inside the loop, but no
            # per-row dicts / pandas row objects (wide binary batches churn
            # the allocator enough already — see bench.make_spark notes)
            m = len(pdf)
            feats = {k: np.empty(m) for k in _FKEYS}
            n_samples = np.empty(m, dtype=np.int64)
            n_tokens = np.empty(m, dtype=np.int64)
            bts = pdf["bytes"].to_numpy()
            cod = pdf["codec"].to_numpy()
            tr = pdf["transcript"].to_numpy()
            for i in range(m):
                f = clip_features(decode(bts[i], cod[i]), n_frames)
                n_samples[i] = f["n_samples"]
                n_tokens[i] = len(str(tr[i]).split())
                for k in _FKEYS:
                    feats[k][i] = f[k]
            out = {"clip_id": pdf["clip_id"].to_numpy(), "codec": cod,
                   "sr_hz": pdf["sr_hz"].to_numpy(),
                   "dur_ms": pdf["dur_ms"].to_numpy(),
                   "n_samples": n_samples, **feats, "n_tokens": n_tokens}
            for c in passthrough:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=FEATURE_COLS + extra_schema)


# ------------------------------------------------------- Arrow fast path
def decode_features_arrow(df, n_frames: int = 20,
                          passthrough: tuple[str, ...] = ()):
    """``decode_features`` fed straight from Arrow buffers — no pandas, no
    per-row ``bytes`` objects.

    ``mapInArrow`` hands us the RecordBatch itself; the binary column's
    Arrow layout is one contiguous data buffer plus an offsets vector, so
    each clip's encoded bytes are a zero-copy numpy VIEW into the batch
    (``data[off[i]:off[i+1]]``) — ``mapInPandas`` would instead materialize
    one 60 KB Python ``bytes`` object per row plus object-dtype columns.
    Features still compute per clip with the cache-resident kernels
    (``clip_features`` — a 25k-sample clip fits in L2, so the per-clip loop
    beats whole-batch vectorization, which is DRAM-bandwidth-bound across
    12 M-element arrays: measured 0.11 s vs 0.63 s per 500 clips).
    ``n_tokens`` is ``len(str(s).split())`` per row — the SAME Python
    tokenizer as ``decode_features`` (RE2's ``\\S`` is ASCII-only, so
    ``count_substring_regex`` would diverge on Unicode whitespace such as
    NBSP or ``\\x0b``; transcripts are tiny next to the audio bytes, so the
    per-row loop costs nothing). Output is BIT-IDENTICAL to
    ``decode_features`` (same kernels, same float paths, same tokenizer).

    Measured end to end the pipeline is Arrow-IPC bound either way (~0.4
    GB/s of encoded bytes into the Python worker pool at local[8]; scan
    alone is ~6x faster) — this path buys the pandas-materialization slice
    back and drops allocator churn, and is the bench default. The honest
    scale lever beyond it is architectural: materialize features once
    (write the feature table; BASELINE.md "audio decomposition") so
    downstream synopses never re-ship ``bytes``. Decoding inside JVM SQL
    was measured and rejected: binary cells have no vectorized byte access
    — hex()+aggregate() lambdas re-evaluate per element (no CSE) and run
    interpreted, orders of magnitude slower than the IPC they avoid.

    Null clips are not supported (the clips table is NOT NULL by
    construction)."""
    import pyarrow as pa

    in_dtypes = dict(df.dtypes)
    extra_schema = "".join(f", {c} {in_dtypes[c]}" for c in passthrough)

    _FKEYS = ("rms", "peak", "zcr", "e_q25", "e_q50", "e_q75", "e_q95")

    def featurize(rb: pa.RecordBatch) -> pa.RecordBatch:
        m = rb.num_rows
        col = rb.schema.get_field_index
        barr = rb.column(col("bytes"))
        # offsets are relative to the array's own slice offset; data
        # positions are absolute in the shared buffer
        odt = np.int64 if pa.types.is_large_binary(barr.type) else np.int32
        off = np.frombuffer(barr.buffers()[1], dtype=odt, count=m + 1,
                            offset=np.dtype(odt).itemsize * barr.offset)
        data = np.frombuffer(barr.buffers()[2], dtype=np.uint8)
        cod = rb.column(col("codec")).to_pylist()

        feats = {k: np.empty(m) for k in _FKEYS}
        n_samples = np.empty(m, dtype=np.int64)
        for i in range(m):
            view = data[off[i]:off[i + 1]]
            codec = cod[i]
            if codec == "pcm_s16le":
                # a preceding odd-length row can leave this view unaligned
                # for int16; numpy handles unaligned views, but copy when it
                # refuses (ndarray.view needs the first axis contiguous)
                try:
                    wave = view.view("<i2").astype(np.float32) / np.float32(32767.0)
                except ValueError:
                    wave = (np.frombuffer(view.tobytes(), dtype="<i2")
                            .astype(np.float32) / np.float32(32767.0))
            elif codec == "adpcm_ima":
                wave = _adpcm_decode(view)
            elif codec == "lpc_fixed":
                wave = _lpc_decode(view)
            else:
                lut = _BYTE_LUT.get(codec)
                if lut is None:
                    raise NotImplementedError(f"codec {codec!r} not supported")
                wave = lut[view]
            f = clip_features(wave, n_frames)
            n_samples[i] = f["n_samples"]
            for k in _FKEYS:
                feats[k][i] = f[k]

        # parity with decode_features: Python str.split() (Unicode
        # whitespace; None → "None" → 1), NOT RE2 \S+ (ASCII-only)
        n_tok = pa.array(
            [len(str(s).split()) for s in
             rb.column(col("transcript")).to_pylist()],
            type=pa.int32())
        cols = {
            "clip_id": rb.column(col("clip_id")),
            "codec": rb.column(col("codec")),
            # cast to the DECLARED schema: mapInArrow does no coercion, and
            # a source built via createDataFrame infers int64 here
            "sr_hz": rb.column(col("sr_hz")).cast(pa.int32()),
            "dur_ms": rb.column(col("dur_ms")).cast(pa.int32()),
            "n_samples": pa.array(n_samples, type=pa.int64()),
            **{k: pa.array(feats[k], type=pa.float64()) for k in _FKEYS},
            "n_tokens": n_tok.cast(pa.int32()),
        }
        for c in passthrough:
            cols[c] = rb.column(col(c))
        return pa.RecordBatch.from_arrays(list(cols.values()),
                                          names=list(cols.keys()))

    def fn(batches):
        for rb in batches:
            if rb.num_rows:
                yield featurize(rb)

    return df.mapInArrow(fn, schema=FEATURE_COLS + extra_schema)


# --------------------------------------------------------- fingerprints
# Audio near-duplicate detection: per-clip fingerprint sets joined on an
# equi-key, never all-pairs — the audio analogue of the text MinHash/LSH
# family (text.py). Two extractors share one pair-join:
#
#   * clip_fp_band — integer-exact band-energy shingles: frame the int16
#     samples, per-frame energy is an EXACT int64 (sum of int16 squares,
#     <= frame*32767^2 < 2^53), quantize to its bit-length, pack `shingle`
#     consecutive 6-bit levels into one int64. Every step is integer
#     arithmetic a SQL engine replays bit-for-bit, so this extractor
#     carries the driver's EXACT oracle (audio_fp_exact) — it proves the
#     whole frame->quantize->shingle->join->count plumbing.
#   * clip_fp_landmarks — spectral landmark constellation in the style of
#     Wang's Shazam paper (ISMIR'03, public): per-frame rfft power, the
#     top-k SALIENT peaks (sidelobe-suppressed, noise-floor peaks dropped),
#     hashed as within-frame bin pairs (dt=0) plus strongest-peak →
#     target-zone pairs for frame deltas 1..fan_out. Robust to lossy
#     codecs (peak bins of dominant partials survive G.711 companding;
#     measured 200/200 planted mulaw duplicates detected at Jaccard 1.0)
#     and to hop-aligned time shifts (only the DELTA is hashed, never
#     absolute time). FFT has no SQL replay, so its driver entry is
#     rows-only; the invariants (codec invariance, shift invariance,
#     distinct-clip separation) are asserted in tests/test_audio.py.
#
# Scale posture (PLANS.md §fingerprints): fingerprints are computed inside
# the decode pass (no shuffle — shingling via per-clip numpy, NOT an
# explode + window, which would shuffle ~100 rows per clip just to run a
# lead()); the only shuffles are the equi-join on fp and the short-row
# pair count. Hot fingerprints (the audio analogue of stop-words: silence,
# DC hum) are dropped by the `max_df` document-frequency cap before the
# join, bounding any bucket's pair fan-out to max_df^2.

FP_SCHEMA = "clip_id string, fp long"


def frame_energy_levels(x: np.ndarray, frame: int = 256) -> np.ndarray:
    """int16 samples -> per-full-frame log-quantized energy level.

    e_f = sum(x^2) over frame f is an exact integer (frame*32767^2 < 2^53
    for frame <= 2^23). level = bit_length(e_f)*4 + the two mantissa bits
    after the leading 1 — a base-2^(1/4)-ish log quantization (~12.5%
    relative resolution; bit_length alone was measured too coarse: its
    tiny level alphabet made 240 distinct clips collide into shared
    shingles). bit_length reads off np.frexp's exponent (exact for
    integers < 2^53); both parts are integer math DuckDB replays as
    length(bin(e)) and (e >> greatest(bl-3, 0)) & 3. The tail partial
    frame is dropped (SQL twin: k < ns//frame*frame)."""
    n = (x.size // frame) * frame
    if n == 0:
        return np.empty(0, dtype=np.int64)
    e = (x[:n].astype(np.int64) ** 2).reshape(-1, frame).sum(axis=1)
    bl = np.frexp(e.astype(np.float64))[1].astype(np.int64)
    sub = (e >> np.maximum(bl - 3, 0)) & 3
    return np.where(e == 0, 0, bl * 4 + sub)


def clip_fp_band(x: np.ndarray, frame: int = 256,
                 shingle: int = 4) -> np.ndarray:
    """Distinct band-energy shingle fingerprints of one clip (int16 in).

    Packs `shingle` consecutive levels (each < 2^8: max bit_length*4+3 is
    155 at frame=256) into one int64 — a rolling base-256 shingle, the
    audio analogue of text.py's character shingles."""
    lv = frame_energy_levels(x, frame)
    if lv.size < shingle:
        return np.empty(0, dtype=np.int64)
    fp = np.zeros(lv.size - shingle + 1, dtype=np.int64)
    for j in range(shingle):
        fp = (fp << 8) | lv[j: lv.size - shingle + 1 + j]
    return np.unique(fp)


_HANN: dict = {}


def clip_fp_landmarks(wave: np.ndarray, n_fft: int = 512, hop: int = 256,
                      k: int = 4, fan_out: int = 2, sal: float = 1e-3,
                      sup: int = 3) -> np.ndarray:
    """Distinct spectral-landmark fingerprints of one clip (float wave in).

    Constellation: Hann-windowed rfft power per frame (DC dropped); per
    frame the top-``k`` spectral peaks by magnitude, each found with a
    ±``sup``-bin suppression window around the previous pick (so sidelobes
    of one partial never count twice) and kept only if its power is at
    least ``sal`` × the frame's max — the SALIENCE filter that drops
    noise-floor "peaks", whose bins are random and do not survive lossy
    companding (an earlier geometric-band design emitted one peak per band
    unconditionally; measured on the mulaw-dup fixture it detected 62/200
    planted duplicates vs 200/200 for this design, because high bands held
    only noise). Landmarks: (a) within-frame peak pairs, bin-sorted, dt=0
    — for steady tonal content this is the (f1_bin, f2_bin) signature, the
    discriminative core; (b) temporal pairs from each frame's strongest
    peak to every peak ``dt`` = 1..fan_out frames ahead (Shazam-style
    target zone, Wang ISMIR'03 — public). Packed (lo_bin << 11) |
    (hi_bin << 2) | dt: bins < 2^9 at n_fft=512, fan_out <= 3 fits 2
    bits; only the frame DELTA is encoded, never absolute time, so
    hop-aligned shifts keep identical fingerprints."""
    w = np.asarray(wave, dtype=np.float64)
    if w.size < n_fft:
        return np.empty(0, dtype=np.int64)
    T = 1 + (w.size - n_fft) // hop
    win = _HANN.get(n_fft)
    if win is None:
        win = _HANN[n_fft] = np.hanning(n_fft)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(T)[:, None]
    p = np.abs(np.fft.rfft(w[idx] * win, axis=1)) ** 2
    p[:, 0] = 0.0
    fmax = p.max(axis=1)
    rows = np.arange(T)
    offs = np.arange(-sup, sup + 1)
    peaks = np.full((T, k), -1, dtype=np.int64)
    for r in range(k):
        a = np.argmax(p, axis=1)
        v = p[rows, a]
        # v > 0 guards the all-zero frame: with fmax = 0 the salience
        # compare degenerates to 0 >= 0 and digital silence would emit
        # bin-0 landmarks shared by EVERY clip containing a silent region
        ok = (v > 0) & (v >= sal * fmax)
        peaks[ok, r] = a[ok]
        cols = np.clip(a[:, None] + offs[None, :], 0, p.shape[1] - 1)
        p[rows[:, None], cols] = 0.0
    out = []
    for i in range(k):                       # within-frame pairs, dt=0
        for j in range(i + 1, k):
            a, b = peaks[:, i], peaks[:, j]
            m = (a >= 0) & (b >= 0)
            if m.any():
                lo = np.minimum(a[m], b[m])
                hi = np.maximum(a[m], b[m])
                out.append((lo << 11) | (hi << 2))
    for dt in range(1, fan_out + 1):         # strongest -> target zone
        if T <= dt:
            break
        anc = peaks[:-dt, 0]
        for j in range(k):
            tgt = peaks[dt:, j]
            m = (anc >= 0) & (tgt >= 0)
            if m.any():
                out.append((anc[m] << 11) | (tgt[m] << 2) | np.int64(dt))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def _int16_lattice(blob, codec: str) -> np.ndarray:
    """Clip bytes -> int16 sample lattice. pcm_s16le reads the raw int16s
    (zero-copy w.r.t. values); other codecs decode to float and re-grid
    (round half-to-even, numpy's default) — the level quantization absorbs
    the sub-lattice decode error."""
    if codec == "pcm_s16le":
        return np.frombuffer(blob, dtype="<i2")
    w = decode(blob, codec)
    return np.clip(np.rint(w.astype(np.float64) * 32767.0),
                   -32768, 32767).astype(np.int16)


def band_energy_fingerprints(df, frame: int = 256, shingle: int = 4):
    """mapInPandas: decode each clip and emit its distinct band-energy
    shingle fingerprints as (clip_id, fp) rows — computed per clip inside
    the decode pass, so the ONLY rows that leave the scan are the join
    keys themselves."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, fps = [], []
            bts = pdf["bytes"].to_numpy()
            cod = pdf["codec"].to_numpy()
            cid = pdf["clip_id"].to_numpy()
            for i in range(len(pdf)):
                f = clip_fp_band(_int16_lattice(bts[i], cod[i]),
                                 frame, shingle)
                if f.size:
                    ids.append(np.repeat(cid[i], f.size))
                    fps.append(f)
            if ids:
                yield pd.DataFrame({"clip_id": np.concatenate(ids),
                                    "fp": np.concatenate(fps)})

    return df.mapInPandas(fn, schema=FP_SCHEMA)


def landmark_fingerprints(df, n_fft: int = 512, hop: int = 256,
                          k: int = 4, fan_out: int = 2, sal: float = 1e-3):
    """mapInPandas: decode each clip and emit its distinct spectral
    landmark fingerprints as (clip_id, fp) rows."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, fps = [], []
            bts = pdf["bytes"].to_numpy()
            cod = pdf["codec"].to_numpy()
            cid = pdf["clip_id"].to_numpy()
            for i in range(len(pdf)):
                f = clip_fp_landmarks(decode(bts[i], cod[i]),
                                      n_fft, hop, k, fan_out, sal)
                if f.size:
                    ids.append(np.repeat(cid[i], f.size))
                    fps.append(f)
            if ids:
                yield pd.DataFrame({"clip_id": np.concatenate(ids),
                                    "fp": np.concatenate(fps)})

    return df.mapInPandas(fn, schema=FP_SCHEMA)


EMBEDDING_SCHEMA = "clip_id string, embedding array<float>"


def clip_embedding(wave: np.ndarray, n_bands: int = 64, n_fft: int = 512,
                   hop: int = 256) -> np.ndarray:
    """L2-normalized log-band spectral embedding of one clip (float32).

    Mean Hann-windowed rfft power over all frames, pooled into ``n_bands``
    geometrically-spaced bands (mel-like: constant-Q-ish resolution —
    fine at low frequency where the fixture's partials live, coarse at
    the top), normalized to a spectral SHAPE (sum 1) before
    log-compression + unit L2 — the shape normalization is what makes the
    embedding invariant to overall gain AND to silence padding (extra
    silent frames dilute the mean power uniformly; a raw log1p would see
    that as a spectral change). Stable under lossy companding and
    hop-aligned shifts (same invariances as the landmark fingerprints —
    a mulaw re-encode measures cosine > 0.999) while distinct two-tone
    clips separate on their band occupancy. Defaults measured on the RNG
    fixture (24 clips + mulaw dups + shifted/attenuated copies): dup
    cosine >= 0.989, distinct <= 0.802 — log1p(shape*1e3) at 64 bands is
    the widest gap of the swept variants (1e6 over-flattens onto the
    quantization-noise floor; raw shape under-compresses and every
    two-tone clip looks alike). A clip shorter than one FFT frame (or
    all-silent) yields the zero vector."""
    w = np.asarray(wave, dtype=np.float64)
    if w.size < n_fft:
        return np.zeros(n_bands, dtype=np.float32)
    T = 1 + (w.size - n_fft) // hop
    win = _HANN.get(n_fft)
    if win is None:
        win = _HANN[n_fft] = np.hanning(n_fft)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(T)[:, None]
    p = (np.abs(np.fft.rfft(w[idx] * win, axis=1)) ** 2).mean(axis=0)
    n_bins = p.size - 1                       # drop DC
    edges = np.unique(np.rint(np.geomspace(1, n_bins,
                                           n_bands + 1)).astype(np.int64))
    bands = np.add.reduceat(p[1:], edges[:-1] - 1)
    total = bands.sum()
    if total <= 0:
        return np.zeros(n_bands, dtype=np.float32)
    out = np.zeros(n_bands, dtype=np.float64)
    out[:bands.size] = np.log1p(bands / total * 1e3)
    nrm = np.linalg.norm(out)
    return (out / nrm if nrm > 0 else out).astype(np.float32)


def audio_embeddings(df, n_bands: int = 64, n_fft: int = 512,
                     hop: int = 256):
    """mapInPandas: decode each clip and emit (clip_id, embedding) rows —
    the bridge from the audio payload into the similarity family
    (`similarity.brute_force_topk` / `ann_topk_lsh` / `ann_topk_ivf` /
    `cosine_near_dup_pairs[_lsh]` all accept id_col='clip_id',
    vec_col='embedding'). Embeddings are computed inside the decode pass,
    so only the n_bands-float vectors leave the scan."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            emb = [clip_embedding(decode(b, c), n_bands, n_fft, hop)
                   for b, c in zip(pdf["bytes"], pdf["codec"])]
            yield pd.DataFrame({"clip_id": pdf["clip_id"],
                                "embedding": emb})

    return df.mapInPandas(fn, schema=EMBEDDING_SCHEMA)


def fingerprint_pairs(fp_df, min_matches: int = 8, max_df: int | None = 64,
                      min_jaccard: float | None = None):
    """Near-duplicate clip pairs from a (clip_id, fp) fingerprint table.

    Equi-join on fp (never all-pairs), count shared distinct fingerprints
    per pair, keep pairs with >= min_matches, score with the fingerprint
    Jaccard n_match / (|A| + |B| - n_match); ``min_jaccard`` optionally
    filters on that score (set sizes are counted AFTER the stop-fp filter,
    so a true duplicate pair scores exactly 1.0 regardless of how many of
    its fingerprints were hot). ``max_df`` drops fingerprints shared by
    more than that many clips BEFORE the join (stop-fp filter) — at 10^12
    clips a silence fingerprint would otherwise fan out quadratically;
    with the cap every bucket contributes <= max_df^2/2 pairs. All
    joins/aggregations are JVM-side; the map-side combine on (id_a, id_b)
    keeps the pair shuffle short-row. ``min_matches`` prunes BEFORE the
    per-clip-count joins (predicate pushdown on the smaller pair table).
    """
    from pyspark.sql import functions as F

    from .util import pin_result

    fps = fp_df.dropDuplicates(["clip_id", "fp"])
    if max_df is not None:
        keep = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df_"))
                .filter(F.col("df_") <= max_df).select("fp"))
        fps = fps.join(keep, "fp")
    fps = fps.persist()  # feeds both join sides + the per-clip counts
    counts = fps.groupBy("clip_id").agg(F.count(F.lit(1)).alias("nfp"))
    a = fps.select(F.col("clip_id").alias("id_a"), "fp")
    b = fps.select(F.col("clip_id").alias("id_b"), "fp")
    pairs = (a.join(b, "fp")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_match"))
             .filter(F.col("n_match") >= int(min_matches)))
    out = (pairs
           .join(counts.select(F.col("clip_id").alias("id_a"),
                               F.col("nfp").alias("na")), "id_a")
           .join(counts.select(F.col("clip_id").alias("id_b"),
                               F.col("nfp").alias("nb")), "id_b")
           .withColumn("_jac", F.col("n_match")
                               / (F.col("na") + F.col("nb")
                                  - F.col("n_match"))))
    if min_jaccard is not None:
        # filter the RAW ratio, not the rounded display column — the SQL
        # oracles do the same, and a ratio in [t - 5e-7, t) would
        # otherwise round up to t and survive only on the Spark side
        out = out.filter(F.col("_jac") >= float(min_jaccard))
    out = out.select("id_a", "id_b", "n_match",
                     F.round(F.col("_jac"), 6).alias("jaccard"))
    return pin_result(out, fps, key="audio_fingerprint_pairs")
