"""Audio preprocessing operators (audio_prep.py): trim / resample / gain /
segment kernel invariants + the distributed pipeline's partition
invariance. The bit-for-bit DuckDB replay of the full chain runs in
test_entry.py (audio_prep_exact)."""

import numpy as np
import pytest

from condor_spark import fixtures
from condor_spark.engine.audio_prep import (DEFAULT_TARGET_RMS,
                                            gain_normalize_int16,
                                            prep_clips, prep_segments,
                                            resample_int16,
                                            segment_energies, trim_bounds)


def _tone(sr: int, freq: float, dur_s: float, amp: float = 0.5):
    t = np.arange(int(sr * dur_s)) / sr
    return np.rint(amp * np.sin(2 * np.pi * freq * t) * 32767) \
        .astype(np.int16)


# ----------------------------------------------------------------- trim
def test_trim_removes_planted_pads():
    for i in range(24):
        r = fixtures.clip_row_exact(i, gate=True, pad=True)
        x = np.frombuffer(r["bytes"], dtype="<i2")
        lead, tail = (i * 97) % 1600, (i * 53) % 1200
        start, stop = trim_bounds(x, frame=128, rel=1000)
        # fully-silent pad frames are never kept ...
        assert start >= (lead // 128) * 128, (i, start, lead)
        assert stop <= x.size - (tail // 128) * 128 + 128, (i, stop)
        # ... and at most a few quiet CONTENT frames may also be cut
        # (the rule is relative energy, not pad-awareness)
        assert start <= lead + 4 * 128, (i, start, lead)
        assert stop >= x.size - tail - 4 * 128, (i, stop)


def test_trim_edge_cases():
    assert trim_bounds(np.zeros(1000, dtype=np.int16)) == (0, 0)
    assert trim_bounds(np.empty(0, dtype=np.int16)) == (0, 0)
    loud = _tone(8000, 440, 0.1)
    start, stop = trim_bounds(loud)
    assert start == 0 and stop == loud.size  # nothing to trim


# ------------------------------------------------------------- resample
def test_resample_identity_and_length():
    x = _tone(16000, 440, 0.25)
    assert np.array_equal(resample_int16(x, 16000, 16000), x)
    up = resample_int16(x, 16000, 32000)
    assert up.size == 2 * x.size
    down = resample_int16(x, 16000, 8000)
    assert down.size == (x.size + 1) // 2


def test_resample_preserves_tone_frequency():
    # zero-crossing rate (= 2f/sr) must survive both directions
    for sr_in, sr_out in ((8000, 16000), (44100, 16000), (22050, 16000)):
        x = _tone(sr_in, 440, 0.5)
        y = resample_int16(x, sr_in, sr_out)
        zc = int(np.sum(np.diff(np.signbit(y.astype(np.int32)))))
        expect = int(2 * 440 * (y.size / sr_out))
        assert abs(zc - expect) <= 4, (sr_in, sr_out, zc, expect)


def test_resample_exact_half_fraction():
    # 8k->16k hits frac = 0.5 exactly: y[2k+1] is the exact midpoint,
    # round-half-even quantized
    x = np.array([0, 100, -101, 7], dtype=np.int16)
    y = resample_int16(x, 8000, 16000)
    assert y.size == 8
    assert list(y[::2]) == [0, 100, -101, 7]
    assert y[1] == 50           # 50.0 exactly
    assert y[3] == 0            # -0.5 rounds to even 0
    assert y[5] == -47          # (-101+7)/2 = -47.0


# ----------------------------------------------------------------- gain
def test_gain_hits_target_rms():
    x = _tone(16000, 440, 0.25, amp=0.05)
    y = gain_normalize_int16(x, DEFAULT_TARGET_RMS)
    rms = float(np.sqrt((y.astype(np.float64) ** 2).mean()))
    assert abs(rms - DEFAULT_TARGET_RMS) / DEFAULT_TARGET_RMS < 0.02
    # silent clip unchanged, never a div-by-zero
    z = np.zeros(100, dtype=np.int16)
    assert np.array_equal(gain_normalize_int16(z), z)


def test_gain_clips_at_int16_bounds():
    x = np.array([32767, -32768, 1], dtype=np.int16)
    y = gain_normalize_int16(x, 60000.0)
    assert y.max() <= 32767 and y.min() >= -32768


# -------------------------------------------------------------- segment
def test_segment_energies_cover_and_overlap():
    x = np.arange(1, 4001, dtype=np.int16)
    starts, en = segment_energies(x, 1600, 800)
    assert list(starts) == [0, 800, 1600, 2400]
    cs = np.concatenate([[0], np.cumsum(x.astype(np.int64) ** 2)])
    for s, e in zip(starts, en):
        assert e == cs[s + 1600] - cs[s]
    # clip shorter than one segment yields nothing
    assert segment_energies(x[:100], 1600, 800)[0].size == 0


# ------------------------------------------------------- spark pipeline
def test_prep_segments_partition_invariance(spark):
    outs = []
    for p in (2, 8):
        clips = fixtures.audio_clips_exact(spark, 48, num_partitions=p,
                                           gate=True, pad=True)
        outs.append(prep_segments(clips).toPandas()
                    .sort_values(["clip_id", "seg_idx"])
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert len(outs[0]) > 48  # every clip yields >= 1 full segment


def test_prep_clips_roundtrip(spark):
    clips = fixtures.audio_clips(spark, 24, num_partitions=4)
    out = prep_clips(clips, target_sr=16000).toPandas()
    assert len(out) == 24
    assert (out["sr_hz"] == 16000).all()
    assert (out["codec"] == "pcm_s16le").all()
    for _, r in out.iterrows():
        x = np.frombuffer(r["bytes"], dtype="<i2")
        assert 0 <= x.size - r["dur_ms"] * 16 < 16  # dur_ms = floor(n/sr)
        rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
        assert abs(rms - DEFAULT_TARGET_RMS) / DEFAULT_TARGET_RMS < 0.05
    # schema preserved exactly (a pipeline can write it back to the lake)
    assert list(out.columns) == ["clip_id", "bytes", "sr_hz", "dur_ms",
                                 "codec", "transcript", "ts"]


def test_prep_clips_matches_prep_segments(spark):
    """The data-product twin and the audit rows agree: segmenting the
    re-encoded prep_clips output reproduces prep_segments exactly."""
    clips = fixtures.audio_clips_exact(spark, 24, num_partitions=4,
                                       gate=True, pad=True)
    direct = (prep_segments(clips).toPandas()
              .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True))
    prepped = prep_clips(clips).toPandas()
    rows = []
    for _, r in prepped.iterrows():
        x = np.frombuffer(r["bytes"], dtype="<i2")
        starts, en = segment_energies(x, 1600, 800)
        for s, (st, e) in enumerate(zip(starts, en)):
            rows.append((r["clip_id"], s, int(st), 1600, int(e)))
    import pandas as pd
    manual = (pd.DataFrame(rows, columns=list(direct.columns))
              .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        direct.astype(manual.dtypes.to_dict()), manual)


# -------------------------------------------------------------- quality
def test_clip_quality_stats(spark):
    import pandas as pd

    from condor_spark.engine.audio import encode
    from condor_spark.engine.audio_prep import clip_quality

    # one clean tone, one mostly-silent clip, one hard-clipped clip
    sr = 16000
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    rows = [
        {"clip_id": "clean", "bytes": encode(tone, "pcm_s16le"),
         "sr_hz": sr, "dur_ms": 1000, "codec": "pcm_s16le",
         "transcript": "a b c d", "ts": pd.Timestamp("2026-01-01")},
        {"clip_id": "padded",
         "bytes": encode(np.concatenate([np.zeros(8000), tone]),
                         "pcm_s16le"),
         "sr_hz": sr, "dur_ms": 1500, "codec": "pcm_s16le",
         "transcript": "", "ts": pd.Timestamp("2026-01-01")},
        {"clip_id": "clipped", "bytes": encode(3.0 * tone, "pcm_s16le"),
         "sr_hz": sr, "dur_ms": 1000, "codec": "pcm_s16le",
         "transcript": "x", "ts": pd.Timestamp("2026-01-01")},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows)).repartition(2)
    out = clip_quality(df).toPandas().set_index("clip_id")
    clean = out.loc["clean"]
    assert clean["lead_trim"] == 0 and clean["tail_trim"] == 0
    assert clean["active_ratio"] == 1.0 and clean["clip_ratio"] == 0.0
    assert abs(clean["tokens_per_sec"] - 4.0) < 1e-9
    padded = out.loc["padded"]
    assert padded["lead_trim"] >= 7800      # the 8000-sample pad, frame-
    assert padded["lead_trim"] <= 8000      # aligned
    assert padded["tokens_per_sec"] == 0.0
    clipped = out.loc["clipped"]
    assert clipped["clip_ratio"] > 0.3      # 3x gain saturates ~2/3 of a
    assert clipped["rms"] > clean["rms"]    # sine period


# ------------------------------------------------------ kernel properties
try:
    from hypothesis import given, settings, strategies as st

    int16_arrays = st.lists(st.integers(-32768, 32767),
                            min_size=0, max_size=2000).map(
        lambda xs: np.array(xs, dtype=np.int16))

    @given(x=int16_arrays)
    @settings(max_examples=60, deadline=None)
    def test_trim_is_idempotent(x):
        """Trim boundaries are frame-aligned, so trimming a trimmed clip
        changes nothing: the kept frames keep their energies and their
        relative max."""
        start, stop = trim_bounds(x, frame=128, rel=1000)
        assert 0 <= start <= stop <= x.size
        y = x[start:stop]
        s2, e2 = trim_bounds(y, frame=128, rel=1000)
        assert (s2, e2) == (0, y.size) or y.size == 0

    @given(x=int16_arrays,
           srs=st.tuples(st.sampled_from((8000, 16000, 22050, 44100)),
                         st.sampled_from((8000, 16000, 22050, 44100))))
    @settings(max_examples=60, deadline=None)
    def test_resample_length_and_range(x, srs):
        sr_in, sr_out = srs
        y = resample_int16(x, sr_in, sr_out)
        if sr_in == sr_out:
            assert np.array_equal(y, x)
        else:
            assert y.size == (x.size * sr_out + sr_in - 1) // sr_in
        if y.size:
            # linear interp never leaves the input's value envelope
            assert y.max() <= x.max() and y.min() >= x.min()

    @given(x=int16_arrays, seg=st.integers(1, 400), hop=st.integers(1, 400))
    @settings(max_examples=60, deadline=None)
    def test_segment_energy_consistency(x, seg, hop):
        starts, en = segment_energies(x, seg, hop)
        assert (en >= 0).all()
        cs = np.concatenate([[0], np.cumsum(x.astype(np.int64) ** 2)])
        assert np.array_equal(en, cs[starts + seg] - cs[starts])
        if x.size >= seg:
            assert starts.size == 1 + (x.size - seg) // hop
            assert starts[-1] + seg <= x.size

    @given(x=int16_arrays, target=st.floats(1.0, 20000.0))
    @settings(max_examples=60, deadline=None)
    def test_gain_bounded_and_silence_fixed(x, target):
        y = gain_normalize_int16(x, target)
        assert y.dtype == np.int16 and y.size == x.size
        if x.size and not x.any():
            assert np.array_equal(y, x)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_prep_filtered_gates_and_matches_composition(spark):
    """The fused filter+prep equals clip_quality -> filter -> prep_clips
    composed, and actually rejects the planted bad clips."""
    import pandas as pd
    from pyspark.sql import functions as F

    from condor_spark.engine.audio import encode
    from condor_spark.engine.audio_prep import clip_quality, prep_filtered

    sr = 16000
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    rows = [fixtures.clip_row(i) for i in range(12)]       # good clips
    rows.append({"clip_id": "zz-silent",
                 "bytes": encode(np.concatenate([np.zeros(3 * sr),
                                                 0.4 * tone[:sr // 2]]),
                                 "pcm_s16le"),
                 "sr_hz": sr, "dur_ms": 3500, "codec": "pcm_s16le",
                 "transcript": "x", "ts": pd.Timestamp("2026-01-01")})
    rows.append({"clip_id": "zz-clipped",
                 "bytes": encode(3.0 * tone, "pcm_s16le"), "sr_hz": sr,
                 "dur_ms": 1000, "codec": "pcm_s16le",
                 "transcript": "x", "ts": pd.Timestamp("2026-01-01")})
    rows.append({"clip_id": "zz-quiet",
                 "bytes": encode(0.001 * tone, "pcm_s16le"), "sr_hz": sr,
                 "dur_ms": 1000, "codec": "pcm_s16le",
                 "transcript": "x", "ts": pd.Timestamp("2026-01-01")})
    df = spark.createDataFrame(pd.DataFrame(rows)).repartition(3)

    got = (prep_filtered(df).toPandas()
           .sort_values("clip_id").reset_index(drop=True))
    assert not got["clip_id"].str.startswith("zz-").any()
    assert len(got) == 12

    # composition: quality -> gate -> prep_clips on the survivors
    q = clip_quality(df).toPandas()
    ok = q[(q.active_ratio >= 0.5) & (q.clip_ratio <= 0.01)
           & (q.rms >= 100.0)]["clip_id"]
    want = (prep_clips(df.filter(F.col("clip_id").isin(list(ok))))
            .toPandas().sort_values("clip_id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
