"""Deterministic synthetic fixtures (FIXTURES.md) — no external data.

F1 ``audio_clips``: the north-rule input shape
(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string) + derived event time ``ts`` with 5% late rows.
Generated distributed via ``spark.range(n).mapInPandas`` — each row is a
pure function of its index and seed 42, so any scale regenerates
identically on any cluster size (the 10^12-clip posture: generation is
embarrassingly parallel, nothing is collected).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from .engine.audio import CODECS, encode, synth_wave

EPOCH0_MS = 1767225600000  # 2026-01-01 00:00:00 UTC
VOCAB = [f"tok{j:03d}" for j in range(512)]

CLIP_SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
               "codec string, transcript string, ts timestamp")

_SR_CYCLE = (8000, 16000, 22050, 44100)


def clip_row(i: int, dur_cap_ms: int | None = None) -> dict:
    """Deterministic row i of the audio_clips table (FIXTURES.md F1).

    ``dur_cap_ms`` bounds the duration cycle (still deterministic in i) —
    the bench scaling sweep uses light clips so the aggregate byte rate
    stays under this host's memory-bandwidth plateau and the N→4N ratio
    measures the engine, not the VM (BASELINE.md scaling methodology)."""
    rng = np.random.default_rng(42 + i)
    sr = _SR_CYCLE[i % 4]
    if i % 10 < 7:           # 70% hot key for skew tests
        sr = 16000
    span = (dur_cap_ms - 200) if dur_cap_ms else 2800
    dur_ms = 200 + (i * 37) % max(1, span)
    codec = CODECS[i % 3]
    if i % 10 < 8:           # 80% hot key
        codec = "pcm_s16le"
    wave = synth_wave(i, sr, dur_ms)
    n_tok = 3 + i % 12
    transcript = " ".join(VOCAB[j] for j in rng.integers(0, 512, size=n_tok))
    ts_ms = EPOCH0_MS + i * 50
    if i % 20 == 19:         # 5% late rows (−30 s) to exercise watermarks
        ts_ms -= 30_000
    return {"clip_id": f"clip-{i:012d}", "bytes": encode(wave, codec),
            "sr_hz": sr, "dur_ms": dur_ms, "codec": codec,
            "transcript": transcript,
            "ts": pd.Timestamp(ts_ms, unit="ms")}


def clips_pandas(n: int, start: int = 0) -> pd.DataFrame:
    return pd.DataFrame([clip_row(i) for i in range(start, start + n)])


def audio_clips(spark, n: int, num_partitions: int | None = None,
                dur_cap_ms: int | None = None):
    """Distributed deterministic audio_clips DataFrame of n rows."""
    base = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame([clip_row(int(i), dur_cap_ms)
                                    for i in pdf["id"]])

    return base.mapInPandas(gen, schema=CLIP_SCHEMA)


def clip_row_exact(i: int, param_mod: int | None = None,
                   gate: bool = False, pad: bool = False,
                   n_samples: int | None = None) -> dict:
    """Closed-form clip row — NO RNG anywhere: every waveform sample is a
    pure function of (i, k), so a SQL engine can replay the whole audio
    pipeline (two-sinusoid synth → peak normalize → float32 → pcm16
    encode → decode → per-clip RMS) end to end. This is what the
    ``audio_rms_exact`` driver oracle does in DuckDB; the RNG-parameterized
    ``clip_row`` stays the breadth fixture (all codecs, transcripts).

    ``param_mod`` folds the waveform/metadata parameters onto ``i %
    param_mod`` while clip_id and ts stay functions of ``i`` — rows i and
    i + param_mod become TRUE content duplicates under distinct ids, the
    planted ground truth for the fingerprint-dedup oracle
    (``audio_fp_exact``).

    ``gate`` multiplies the waveform by a per-512-sample-block integer
    amplitude step g ∈ 1..7 drawn from a 31-bit multiply-xor-shift hash of
    (block, j) — pure int64 arithmetic with every intermediate < 2^62, so
    numpy and SQL BIGINT agree exactly (no wraparound on either side).
    Steady two-tone mixes have near-constant frame energy (one fingerprint
    per clip); the hashed gate gives each param j a distinctive,
    UNCORRELATED energy envelope — an additive/linear gate leaves
    different j's envelopes value-shifted copies of each other, which
    band-energy fingerprints then conflate (measured: false-pair Jaccard
    up to 0.89 linear vs 0.42 hashed, planted pairs at 1.0).

    ``pad`` plants closed-form leading/trailing silence — (j*97)%1600
    zero samples before and (j*53)%1200 after the scaled waveform — the
    ground truth for the silence-trim stage of the preprocessing oracle
    (``audio_prep_exact``). Pads are appended AFTER peak normalization,
    so the scale factor is a function of the content samples only (zeros
    never carry the peak) and the SQL replay pads with literal 0s."""
    j = i % param_mod if param_mod else i
    if n_samples is not None:
        # tiny-clip variant for the direct-DFT oracle
        # (``audio_spectral_exact``): sr pinned to 8000 and a fixed
        # sample count, so a SQL engine can replay the whole-clip DFT as
        # explicit cos/sin sums (n_samples x (n_samples/2+1) terms per
        # clip — only feasible for small n). Waveform params keep the
        # standard closed-form cycle over j.
        sr = 8000
        n = int(n_samples)
        dur_ms = max(1, int(round(n * 1000.0 / sr)))
    else:
        sr = _SR_CYCLE[j % 4]
        dur_ms = 200 + (j * 37) % 600
        n = max(1, int(round(dur_ms * sr / 1000.0)))
    f1 = 80.0 + (j * 131) % 900
    f2 = 1000.0 + (j * 211) % 1000
    p1, p2 = (j % 7) * 0.9, (j % 11) * 0.55
    a1, a2 = 0.4 + (j % 5) * 0.12, 0.1 + (j % 3) * 0.13
    t = np.arange(n, dtype=np.float64) / sr
    w = (a1 * np.sin(2 * np.pi * f1 * t + p1)
         + a2 * np.sin(2 * np.pi * f2 * t + p2))
    if gate:
        k = np.arange(n, dtype=np.int64)
        h = ((k >> 9) * 2654435761 + j * 2246822519) % 2147483648
        h = ((h ^ (h >> 13)) * 1274126177) % 2147483648
        g = 1 + (h ^ (h >> 16)) % 7
        w = w * g  # small-int multiply: exact in float64, exact in SQL
    w *= 0.9 / max(1e-9, np.abs(w).max())
    if pad:
        w = np.concatenate([np.zeros((j * 97) % 1600), w,
                            np.zeros((j * 53) % 1200)])
    ts_ms = EPOCH0_MS + i * 50
    return {"clip_id": f"clip-{i:012d}",
            "bytes": encode(w.astype(np.float32), "pcm_s16le"),
            "sr_hz": sr, "dur_ms": dur_ms, "codec": "pcm_s16le",
            "transcript": VOCAB[j % 512],
            "ts": pd.Timestamp(ts_ms, unit="ms")}


def audio_clips_exact(spark, n: int, num_partitions: int | None = None,
                      param_mod: int | None = None, gate: bool = False,
                      pad: bool = False, n_samples: int | None = None):
    """Distributed closed-form clips table (``clip_row_exact``)."""
    base = spark.range(0, n, 1,
                       num_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame([clip_row_exact(int(i), param_mod,
                                                   gate, pad, n_samples)
                                    for i in pdf["id"]])

    return base.mapInPandas(gen, schema=CLIP_SCHEMA)


def reencode_dups(df, codec: str = "mulaw", prefix: str = "dup-"):
    """Re-encode every clip of ``df`` under a (lossy) ``codec`` with a new
    ``prefix``-ed id — the planted-ground-truth builder for near-dup
    detection tests and queries: each output row is a TRUE content
    duplicate of its source clip under a distinct id. Distributed
    (mapInPandas over the input partitions)."""
    from .engine.audio import decode, encode

    def reenc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            out["clip_id"] = prefix + out["clip_id"].str[5:]
            out["bytes"] = [encode(decode(b, c), codec)
                            for b, c in zip(pdf["bytes"], pdf["codec"])]
            out["codec"] = codec
            yield out

    return df.mapInPandas(reenc, schema=df.schema)


def ground_truth_wave(i: int) -> np.ndarray:
    """Pre-encoding float waveform for the per-row SNR>=30dB invariant."""
    r = clip_row(i)  # cheap metadata recompute
    return synth_wave(i, r["sr_hz"], r["dur_ms"])


def replay_in_order(spark, df, src_dir: str, n_chunks: int,
                    ts_col: str = "ts", flush_ts: list | None = None,
                    flush_mutate=None, base: int = 1_000_000_000) -> None:
    """File-replay stream source in event-time order (the analogue of the
    reference's gzip replay sources, ``NYCTaxiRideSource.java:36-55``).

    Writes df as ``n_chunks`` parquet files sorted by ``ts_col`` with
    strictly increasing mtimes — FileStreamSource replays files in mtime
    order, and a single bulk write gives identical mtimes (arbitrary replay
    order, which makes early events spuriously late w.r.t. the watermark).
    Optional ``flush_ts`` rows (clones of the first row at the given
    timestamps) are appended as final batches to push the watermark past
    every real window so event-time timeouts fire before an availableNow
    run terminates. ``flush_mutate`` (pd.DataFrame -> pd.DataFrame) edits
    each flush clone — needed when the consuming operator filters by a
    column (e.g. event kind) BEFORE its watermark node, so the sentinel
    must survive that filter without interacting with real keys.
    ``base`` is the mtime epoch for the first chunk — a second call into
    the same ``src_dir`` with a later base appends chunks that replay
    AFTER the first call's (two-phase replays with a caller-chosen split).
    """
    import glob as _glob
    import os as _os

    _os.makedirs(src_dir, exist_ok=True)
    pdf = df.toPandas().sort_values(ts_col).reset_index(drop=True)
    chunks = [c for c in np.array_split(pdf, n_chunks) if len(c)]
    for t in (flush_ts or []):
        row = pdf.iloc[[0]].copy()
        row[ts_col] = pd.Timestamp(t)
        if flush_mutate is not None:
            row = flush_mutate(row)
        chunks.append(row)
    for i, chunk in enumerate(chunks):
        before = set(_glob.glob(_os.path.join(src_dir, "*.parquet")))
        (spark.createDataFrame(chunk, schema=df.schema)
         .coalesce(1).write.mode("append").parquet(src_dir))
        for f in set(_glob.glob(_os.path.join(src_dir, "*.parquet"))) - before:
            _os.utime(f, (base + i, base + i))


def _write_chunks(spark, schema, chunks, src_dir: str) -> None:
    import glob as _glob
    import os as _os

    _os.makedirs(src_dir, exist_ok=True)
    base = 1_000_000_000
    for i, chunk in enumerate(chunks):
        before = set(_glob.glob(_os.path.join(src_dir, "*.parquet")))
        (spark.createDataFrame(chunk, schema=schema)
         .coalesce(1).write.mode("append").parquet(src_dir))
        for f in set(_glob.glob(_os.path.join(src_dir, "*.parquet"))) - before:
            _os.utime(f, (base + i, base + i))


def replay_proportional(spark, df, src_dir: str, n_chunks: int,
                        ts_col: str = "ts") -> None:
    """Event-time-PROPORTIONAL replay (``NYCTaxiRideSource.java:36-55``):
    each file covers an equal SPAN of event time, not an equal row count —
    bursts land together in one micro-batch and quiet spans produce sparse
    (possibly empty → skipped) files, reproducing the reference's
    serving-speed gaps. Watermarks therefore advance by wall-clock-like
    strides instead of row-count strides."""
    pdf = df.toPandas().sort_values(ts_col).reset_index(drop=True)
    ts = pd.to_datetime(pdf[ts_col])
    lo, hi = ts.min(), ts.max()
    span = (hi - lo) / n_chunks
    chunks = []
    for i in range(n_chunks):
        a = lo + i * span
        b = hi if i == n_chunks - 1 else lo + (i + 1) * span
        m = (ts >= a) & ((ts < b) | (i == n_chunks - 1))
        if m.any():
            chunks.append(pdf[m])
    _write_chunks(spark, df.schema, chunks, src_dir)


def replay_unordered(spark, df, src_dir: str, n_chunks: int,
                     max_delay, ts_col: str = "ts", seed: int = 42,
                     flush_ts: list | None = None) -> None:
    """Bounded-disorder replay (the ``UnorderedSource.java`` analogue): each
    row's POSITION in the replay is its event-time order perturbed by a
    deterministic pseudo-random displacement of at most ``max_delay`` of
    event time — rows can arrive up to ``max_delay`` late relative to the
    watermark front, never more. A watermark delay ≥ ``max_delay`` must
    therefore reproduce the in-order replay's results exactly; a smaller
    delay drops late rows (the watermark-stress contract)."""
    pdf = df.toPandas().sort_values(ts_col).reset_index(drop=True)
    delay_us = int(pd.Timedelta(max_delay).total_seconds() * 1e6)
    rng = np.random.default_rng(seed)
    virt = (pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            + rng.integers(0, max(delay_us, 1), len(pdf)))
    pdf = pdf.iloc[np.argsort(virt.to_numpy(), kind="stable")].reset_index(drop=True)
    chunks = [c for c in np.array_split(pdf, n_chunks) if len(c)]
    for t in (flush_ts or []):
        row = pdf.iloc[[0]].copy()
        row[ts_col] = pd.Timestamp(t)
        chunks.append(row)
    _write_chunks(spark, df.schema, chunks, src_dir)
