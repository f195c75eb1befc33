"""Audio preprocessing operators for training-data pipelines: silence
trim -> sample-rate normalization -> loudness normalization -> fixed-size
segmentation. The stages a large ASR/audio-LM data pipeline runs between
"raw clip lands in the lake" and "training example", missing from the
reference (Condor summarizes streams; it never prepares payloads —
`core/.../synopsis/Synopsis.java:13-20` consumes already-extracted keys).

Spark shape: ONE `mapInPandas` over the clips scan — decode, trim,
resample, gain and segment all happen per clip inside the same pass, so
no decoded samples ever shuffle; the per-segment output rows (or the
re-encoded processed clip) are the only thing leaving the scan. At
10^12 clips the pipeline is embarrassingly parallel: zero shuffles, zero
driver state, output partitioning inherited from the input scan.

Every kernel is deliberately SQL-replayable — integer frame energies,
rational-arithmetic resample positions, IEEE-exact float64 interpolation
and gain — so the whole chain carries a bit-for-bit DuckDB oracle
(driver query ``audio_prep_exact``): planted zero pads are trimmed by an
integer threshold rule, linear-interp resampling uses exact
``(k*sr_in) divmod sr_out`` positions, and the final per-segment
energies are exact int64 sums of int16 squares.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from .audio import _int16_lattice

# target RMS 0.1 full-scale on the int16 lattice
DEFAULT_TARGET_RMS = 3276.7

SEGMENT_SCHEMA = ("clip_id string, seg_idx int, seg_start long, "
                  "n_samples int, energy long")


def trim_bounds(x: np.ndarray, frame: int = 128,
                rel: int = 1000) -> tuple[int, int]:
    """Leading/trailing silence bounds of an int16 clip: ``[start, stop)``.

    Per-frame energy e_f = sum(x^2) over frame f (the trailing partial
    frame counts as a frame) is an exact int64; a frame is ACTIVE iff
    ``e_f * rel >= max_f e_f`` — a pure integer compare (e <= frame *
    32767^2 ~ 1.4e11 at frame=128, so e*rel < 2^63 for rel <= 6e4) that a
    SQL engine replays exactly, unlike a dB threshold on floats. start =
    first active frame * frame; stop = min(n, (last active + 1) * frame).
    Interior quiet frames are untouched (trim is outside-in only). An
    all-zero clip returns (0, 0)."""
    n = x.size
    if n == 0:
        return (0, 0)
    e = np.add.reduceat((x.astype(np.int64)) ** 2,
                        np.arange(0, n, frame))
    mx = int(e.max())
    if mx == 0:
        return (0, 0)
    act = np.flatnonzero(e * rel >= mx)
    return (int(act[0]) * frame, min(n, (int(act[-1]) + 1) * frame))


def resample_int16(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample on the int16 lattice, int16 out.

    Output sample k sits at exact rational input position k*sr_in/sr_out:
    idx = (k*sr_in) // sr_out, frac = ((k*sr_in) % sr_out) / sr_out, and
    y = a + frac*(b - a) with a = x[idx], b = x[min(idx+1, n-1)] — one
    multiply and two adds in float64, each exactly rounded by IEEE-754,
    so numpy and any SQL double agree bit-for-bit (the SQL twin MUST use
    the same a + frac*(b-a) form). n_out = ceil(n_in*sr_out/sr_in);
    quantization is round-half-even (np.rint / SQL round_even). Linear
    interp aliases above sr_out/2 — acceptable for feature pipelines and
    exactly replayable, which windowed-sinc is not."""
    n_in = x.size
    if n_in == 0 or sr_in == sr_out:
        return x.astype(np.int16, copy=True)
    n_out = (n_in * sr_out + sr_in - 1) // sr_in
    num = np.arange(n_out, dtype=np.int64) * sr_in
    idx = num // sr_out
    frac = (num - idx * sr_out).astype(np.float64) / sr_out
    a = x[idx].astype(np.float64)
    b = x[np.minimum(idx + 1, n_in - 1)].astype(np.float64)
    return np.rint(a + frac * (b - a)).astype(np.int16)


def gain_normalize_int16(x: np.ndarray,
                         target_rms: float = DEFAULT_TARGET_RMS
                         ) -> np.ndarray:
    """Scale an int16 clip to a target RMS (int16 out, round-half-even).

    g = target / sqrt(e/n) with e the exact int64 energy: e/n and sqrt
    are single exactly-rounded float64 ops, so the factor (and therefore
    every output sample round_even(x*g), clamped to int16) is
    bit-reproducible in SQL. A silent clip is returned unchanged."""
    n = x.size
    if n == 0:
        return x.astype(np.int16, copy=True)
    e = int((x.astype(np.int64) ** 2).sum())
    if e == 0:
        return x.astype(np.int16, copy=True)
    g = target_rms / math.sqrt(e / n)
    return np.clip(np.rint(x.astype(np.float64) * g),
                   -32768, 32767).astype(np.int16)


def segment_energies(x: np.ndarray, seg: int,
                     hop: int) -> tuple[np.ndarray, np.ndarray]:
    """(seg_starts, energies) of all FULL segments [s*hop, s*hop+seg).

    energies are exact int64 (cumsum-of-squares differences — one pass,
    no per-segment Python). A clip shorter than one segment yields
    nothing: the contract is full training windows only, callers keep the
    clip-level path for short clips."""
    n = x.size
    if n < seg:
        z = np.empty(0, dtype=np.int64)
        return z, z
    n_segs = 1 + (n - seg) // hop
    cs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(x.astype(np.int64) ** 2, out=cs[1:])
    starts = np.arange(n_segs, dtype=np.int64) * hop
    return starts, cs[starts + seg] - cs[starts]


def _prep_wave(blob, codec: str, sr_in: int, target_sr: int,
               trim_frame: int, trim_rel: int,
               target_rms: float | None) -> np.ndarray:
    x = _int16_lattice(blob, codec)
    start, stop = trim_bounds(x, trim_frame, trim_rel)
    y = resample_int16(x[start:stop], sr_in, target_sr)
    if target_rms is not None:
        y = gain_normalize_int16(y, target_rms)
    return y


def prep_segments(df, target_sr: int = 16000, seg_ms: int = 100,
                  hop_ms: int = 50, trim_frame: int = 128,
                  trim_rel: int = 1000,
                  target_rms: float | None = DEFAULT_TARGET_RMS):
    """clips DataFrame -> per-segment rows (clip_id, seg_idx, seg_start,
    n_samples, energy) after trim -> resample(target_sr) -> gain. The
    audit row of the prep pipeline: energy is the exact int64 energy of
    each training window, so a SQL engine can verify every stage
    bit-for-bit (driver query ``audio_prep_exact``); downstream quality
    filters (drop silent / clipped windows) run on these rows in pure
    JVM expressions."""
    seg = target_sr * seg_ms // 1000
    hop = target_sr * hop_ms // 1000

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out: dict[str, list] = {k: [] for k in
                                    ("clip_id", "seg_idx", "seg_start",
                                     "n_samples", "energy")}
            for cid, blob, codec, sr in zip(
                    pdf["clip_id"], pdf["bytes"], pdf["codec"],
                    pdf["sr_hz"]):
                y = _prep_wave(blob, codec, int(sr), target_sr,
                               trim_frame, trim_rel, target_rms)
                starts, en = segment_energies(y, seg, hop)
                if starts.size:
                    out["clip_id"].append(np.repeat(cid, starts.size))
                    out["seg_idx"].append(
                        np.arange(starts.size, dtype=np.int32))
                    out["seg_start"].append(starts)
                    out["n_samples"].append(
                        np.full(starts.size, seg, dtype=np.int32))
                    out["energy"].append(en)
            if out["clip_id"]:
                yield pd.DataFrame({k: np.concatenate(v)
                                    for k, v in out.items()})

    return df.mapInPandas(fn, schema=SEGMENT_SCHEMA)


QUALITY_SCHEMA = ("clip_id string, n_samples long, lead_trim long, "
                  "tail_trim long, active_ratio double, clip_ratio double, "
                  "rms double, tokens_per_sec double")


def clip_quality(df, trim_frame: int = 128, trim_rel: int = 1000):
    """Per-clip audio quality stats — the audio analogue of
    ``text.quality_scores``: the columns a training pipeline filters on
    before paying for feature extraction.

    - lead_trim / tail_trim / active_ratio: samples the silence-trim rule
      (``trim_bounds``) would cut, and the surviving fraction — drop
      mostly-silent clips;
    - clip_ratio: fraction of samples at |s| >= 32767 (saturated at
      either int16 rail) — drop clipped recordings;
    - rms: full-clip RMS on the int16 lattice — drop too-quiet clips;
    - tokens_per_sec: transcript token count over the clip duration —
      the transcript/audio consistency check (an ASR pair with 40
      tokens/sec is mislabeled).

    Ratios are round-half-even to 6 places (np.round / SQL round_even),
    divisions ordered identically to the SQL twin, so the whole operator
    replays exactly (driver query ``audio_quality_exact``). One
    mapInPandas over the scan; output is one short row per clip."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows: dict[str, list] = {k: [] for k in
                                     ("clip_id", "n_samples", "lead_trim",
                                      "tail_trim", "active_ratio",
                                      "clip_ratio", "rms",
                                      "tokens_per_sec")}
            for cid, blob, codec, sr, tr in zip(
                    pdf["clip_id"], pdf["bytes"], pdf["codec"],
                    pdf["sr_hz"], pdf["transcript"]):
                x = _int16_lattice(blob, codec)
                n = x.size
                start, stop = trim_bounds(x, trim_frame, trim_rel)
                e = int((x.astype(np.int64) ** 2).sum())
                nclip = int((np.abs(x.astype(np.int32)) >= 32767).sum())
                n_tok = (tr.count(" ") + 1) if tr else 0
                rows["clip_id"].append(cid)
                rows["n_samples"].append(n)
                rows["lead_trim"].append(start)
                rows["tail_trim"].append(n - stop)
                rows["active_ratio"].append(
                    float(np.round((stop - start) / n, 6)) if n else 0.0)
                rows["clip_ratio"].append(
                    float(np.round(nclip / n, 6)) if n else 0.0)
                rows["rms"].append(
                    float(np.round(math.sqrt(e / n), 6)) if n else 0.0)
                rows["tokens_per_sec"].append(
                    float(np.round(n_tok / (n / int(sr)), 6)) if n
                    else 0.0)
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=QUALITY_SCHEMA)


def prep_filtered(df, target_sr: int = 16000, trim_frame: int = 128,
                  trim_rel: int = 1000,
                  target_rms: float | None = DEFAULT_TARGET_RMS,
                  min_active_ratio: float = 0.5,
                  max_clip_ratio: float = 0.01,
                  min_rms: float = 100.0):
    """Quality-gate THEN prep, fused into one decode pass.

    Composing ``clip_quality`` → filter → ``prep_clips`` as separate
    operators decodes every clip twice (the decode is ~90% of the kernel
    cost and the ``bytes`` column is the scan's weight); this operator
    computes the gate stats and the prep transform on the SAME decoded
    lattice, so rejected clips cost one decode and nothing else, and
    accepted clips never decode twice. Gates mirror clip_quality's
    columns: active_ratio >= ``min_active_ratio`` (mostly-silence drop),
    clip_ratio <= ``max_clip_ratio`` (saturation drop), full-clip RMS >=
    ``min_rms`` (too-quiet drop). Output = prep_clips schema, accepted
    rows only. Filters are evaluated on raw (pre-prep) audio — the same
    numbers the standalone quality operator reports."""
    fields = [f.name for f in df.schema.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keep_rows, waves = [], []
            for ridx, (blob, codec, sr) in enumerate(
                    zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"])):
                x = _int16_lattice(blob, codec)
                n = x.size
                if n == 0:
                    continue
                start, stop = trim_bounds(x, trim_frame, trim_rel)
                if (stop - start) / n < min_active_ratio:
                    continue
                if ((np.abs(x.astype(np.int32)) >= 32767).sum() / n
                        > max_clip_ratio):
                    continue
                e = int((x.astype(np.int64) ** 2).sum())
                if math.sqrt(e / n) < min_rms:
                    continue
                y = resample_int16(x[start:stop], int(sr), target_sr)
                if target_rms is not None:
                    y = gain_normalize_int16(y, target_rms)
                keep_rows.append(ridx)
                waves.append(y)
            if not keep_rows:
                continue
            o = pdf.iloc[keep_rows].copy()
            o["bytes"] = [w.astype("<i2").tobytes() for w in waves]
            o["sr_hz"] = np.int32(target_sr)
            o["dur_ms"] = np.array([w.size * 1000 // target_sr
                                    for w in waves], dtype=np.int32)
            o["codec"] = "pcm_s16le"
            yield o[fields]

    return df.mapInPandas(fn, schema=df.schema)


def prep_clips(df, target_sr: int = 16000, trim_frame: int = 128,
               trim_rel: int = 1000,
               target_rms: float | None = DEFAULT_TARGET_RMS):
    """clips DataFrame -> processed clips DataFrame (same shape): trimmed,
    resampled to ``target_sr``, gain-normalized, re-encoded pcm_s16le
    with sr_hz/dur_ms updated. The data-product twin of
    ``prep_segments`` — what a pipeline materializes back into the lake
    before windowing. dur_ms is the actual post-trim duration
    (floor(n*1000/sr), integer math)."""
    fields = [f.name for f in df.schema.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            o = pdf.copy()
            waves = [_prep_wave(b, c, int(s), target_sr, trim_frame,
                                trim_rel, target_rms)
                     for b, c, s in zip(pdf["bytes"], pdf["codec"],
                                        pdf["sr_hz"])]
            o["bytes"] = [w.astype("<i2").tobytes() for w in waves]
            o["sr_hz"] = np.int32(target_sr)
            o["dur_ms"] = np.array([w.size * 1000 // target_sr
                                    for w in waves], dtype=np.int32)
            o["codec"] = "pcm_s16le"
            yield o[fields]

    return df.mapInPandas(fn, schema=df.schema)
