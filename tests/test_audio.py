"""Audio payload tests: the per-row invariant from BASELINE.json input_hint —
decoded-PCM SNR >= 30 dB vs the reference waveform + transcript equality —
plus vectorized feature extraction through the Spark surface."""

import numpy as np
import pytest

from condor_spark.engine.audio import (clip_features, decode, encode,
                                       snr_db, synth_wave)
from condor_spark import fixtures


@pytest.mark.parametrize("codec,min_snr", [
    ("pcm_s16le", 80.0), ("pcm_u8", 40.0), ("mulaw", 30.0), ("alaw", 30.0),
    # 4-bit adaptive deltas on broadband content: ADPCM's own bound
    ("adpcm_ima", 20.0),
    # lossless on the int16 lattice: exactly pcm_s16le's SNR
    ("lpc_fixed", 80.0)])
def test_codec_snr_invariant(codec, min_snr):
    for i in (0, 7, 123):
        w = synth_wave(i, 16000, 500)
        dec = decode(encode(w, codec), codec)
        assert dec.size == w.size
        assert snr_db(w, dec) >= min_snr


def test_adpcm_block_edges_and_compression():
    """Length recovery at every block boundary, 4:1 compression, and
    byte-identical re-encode of a decoded stream (the encoder and decoder
    share one predictor-update kernel, so they cannot drift)."""
    from condor_spark.engine.audio import ADPCM_SAMPLES_PER_BLOCK as SPB

    w = synth_wave(3, 16000, 2000)
    for n in (0, 1, 2, SPB - 1, SPB, SPB + 1, 2 * SPB, 2 * SPB + 5):
        d = decode(encode(w[:n], "adpcm_ima"), "adpcm_ima")
        assert d.size == n
    blob = encode(w, "adpcm_ima")
    assert len(blob) < w.size * 0.52  # ~4:1 vs pcm_s16le, 2:1 vs the byte codecs
    # deterministic: same wave -> same bytes
    assert encode(w, "adpcm_ima") == blob


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        encode(np.zeros(10), "opus")
    with pytest.raises(NotImplementedError):
        decode(b"\x00", "opus")


def test_fixture_deterministic():
    a, b = fixtures.clip_row(5), fixtures.clip_row(5)
    assert a["bytes"] == b["bytes"] and a["transcript"] == b["transcript"]
    late = fixtures.clip_row(19)
    on_time = fixtures.clip_row(18)
    assert (on_time["ts"] - late["ts"]).total_seconds() > 29  # late shift


def test_per_row_invariant_sample():
    """SNR >= 30 dB + transcript byte-equality over a deterministic sample."""
    for i in range(0, 60):
        row = fixtures.clip_row(i)
        ref = fixtures.ground_truth_wave(i)
        dec = decode(row["bytes"], row["codec"])
        assert snr_db(ref, dec) >= 30.0, (i, row["codec"])
        assert row["transcript"] == fixtures.clip_row(i)["transcript"]


def test_features_shape():
    w = synth_wave(1, 16000, 1000)
    f = clip_features(w)
    assert f["n_samples"] == w.size and 0 < f["rms"] < 1 and 0 <= f["zcr"] <= 1
    assert f["e_q25"] <= f["e_q50"] <= f["e_q75"] <= f["e_q95"]


def test_decode_features_spark(spark):
    from condor_spark.engine.audio import decode_features

    df = fixtures.audio_clips(spark, 200, num_partitions=4)
    feats = decode_features(df).collect()
    assert len(feats) == 200
    by_id = {r["clip_id"]: r for r in feats}
    # spot-check one row against a local recompute
    i = 17
    local = clip_features(decode(fixtures.clip_row(i)["bytes"],
                                 fixtures.clip_row(i)["codec"]))
    got = by_id[f"clip-{i:012d}"]
    assert got["n_samples"] == local["n_samples"]
    assert abs(got["rms"] - local["rms"]) < 1e-12
    assert got["n_tokens"] == 3 + i % 12


def test_skew_profile(spark):
    """The fixture's deliberate hot keys (80% pcm_s16le, 70% sr=16000)."""
    import pyspark.sql.functions as F

    df = fixtures.audio_clips(spark, 1000, num_partitions=4)
    codecs = dict(df.groupBy("codec").count().collect())
    assert codecs["pcm_s16le"] / 1000 > 0.75


def test_decode_features_arrow_bit_identical(spark):
    """The Arrow-buffer fast path (mapInArrow, zero pandas/bytes objects)
    must produce BIT-IDENTICAL features to the mapInPandas reference path —
    same kernels fed from zero-copy views of the RecordBatch."""
    import numpy as np

    from condor_spark import fixtures
    from condor_spark.engine.audio import decode_features, decode_features_arrow

    clips = fixtures.audio_clips(spark, 600, num_partitions=4).cache()
    a = (decode_features(clips, passthrough=("ts",)).toPandas()
         .sort_values("clip_id").reset_index(drop=True))
    b = (decode_features_arrow(clips, passthrough=("ts",)).toPandas()
         .sort_values("clip_id").reset_index(drop=True))
    clips.unpersist()
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
        else:
            assert (a[c] == b[c]).all(), c
    # messy transcripts: n_tokens must still equal len(s.split())
    import pandas as pd
    pdf = fixtures.clips_pandas(12)
    # includes whitespace only Python str.split() knows (\x0b VT, \xa0
    # NBSP, \x1d GS): ASCII-only tokenizers (RE2 \S+) and even Unicode
    # White_Space (no \x1c-\x1f) diverge here — both Spark paths must
    # match Python split exactly
    pdf["transcript"] = ["", " a  b ", "x", "a\tb\nc", "  ", "q w e r t",
                         "one", "a b", "a\x0bb", "a\xa0b c", " z ",
                         "m\x1dn"]
    messy = spark.createDataFrame(pdf)
    want = [len(s.split()) for s in pdf.sort_values("clip_id")["transcript"]]
    for path in (decode_features_arrow, decode_features):
        got = (path(messy).toPandas()
               .sort_values("clip_id").reset_index(drop=True))
        assert list(got["n_tokens"]) == want, path.__name__


def test_new_codecs_through_both_spark_paths(spark):
    """alaw + adpcm_ima flow through decode_features AND the Arrow fast
    path with identical features, and the features match a local
    recompute of the decoded wave."""
    import pandas as pd

    from condor_spark.engine.audio import decode_features, decode_features_arrow

    rows = []
    for i, codec in enumerate(["alaw", "adpcm_ima", "alaw", "adpcm_ima",
                               "pcm_s16le", "mulaw"]):
        w = synth_wave(100 + i, 16000, 300 + 37 * i)
        rows.append({"clip_id": f"nc-{i}", "bytes": encode(w, codec),
                     "sr_hz": 16000, "dur_ms": 300 + 37 * i, "codec": codec,
                     "transcript": f"tok {i} x"})
    df = spark.createDataFrame(pd.DataFrame(rows)).repartition(2)
    a = (decode_features(df).toPandas()
         .sort_values("clip_id").reset_index(drop=True))
    b = (decode_features_arrow(df).toPandas()
         .sort_values("clip_id").reset_index(drop=True))
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    local = clip_features(decode(rows[1]["bytes"], "adpcm_ima"))
    got = a[a["clip_id"] == "nc-1"].iloc[0]
    assert got["n_samples"] == local["n_samples"]
    assert got["rms"] == local["rms"] and got["e_q95"] == local["e_q95"]


def test_fixtures_exact_replayable_float_points():
    """The audio_rms_exact oracle's float32 emulation points: (1) int16
    decode via double-divide-then-narrow equals float32 division for ALL
    2^16 values (no double rounding), so SQL CAST chains replay the decode
    bit-for-bit; (2) the closed-form clip row is deterministic and clears
    the 30 dB SNR invariant through the real encode/decode."""
    import numpy as np
    from condor_spark import fixtures
    from condor_spark.engine import audio

    s = np.arange(-32768, 32768, dtype=np.int16)
    assert np.array_equal(
        s.astype(np.float32) / 32767.0,
        (s.astype(np.float64) / 32767.0).astype(np.float32))

    r1, r2 = fixtures.clip_row_exact(7), fixtures.clip_row_exact(7)
    assert r1["bytes"] == r2["bytes"] and r1["codec"] == "pcm_s16le"
    for i in (0, 3, 123):
        r = fixtures.clip_row_exact(i)
        dec = audio.decode(r["bytes"], "pcm_s16le")
        sr = r["sr_hz"]
        n = max(1, int(round(r["dur_ms"] * sr / 1000.0)))
        assert dec.size == n
        # independent re-derivation of the closed-form wave (the same
        # formula the DuckDB oracle evaluates)
        f1, f2 = 80.0 + (i * 131) % 900, 1000.0 + (i * 211) % 1000
        p1, p2 = (i % 7) * 0.9, (i % 11) * 0.55
        a1, a2 = 0.4 + (i % 5) * 0.12, 0.1 + (i % 3) * 0.13
        t = np.arange(n, dtype=np.float64) / sr
        ref = (a1 * np.sin(2 * np.pi * f1 * t + p1)
               + a2 * np.sin(2 * np.pi * f2 * t + p2))
        ref *= 0.9 / max(1e-9, np.abs(ref).max())
        # pcm16 quantization noise sits ~90 dB below a 0.9-peak signal
        assert audio.snr_db(ref, dec.astype(np.float64)) >= 30.0


def test_lpc_fixed_lossless_and_compression():
    """lpc_fixed is LOSSLESS on the int16 lattice: decode(encode(w)) must
    equal the pcm_s16le rendering bit-for-bit (so its SNR equals pcm's,
    clearing the 30 dB invariant with ~infinite margin), across frame and
    partition boundary lengths — and it actually compresses tonal
    content."""
    from condor_spark.engine.audio import _LPC_FRAME, _LPC_PART

    for i in (0, 7, 123):
        w = synth_wave(i, 16000, 2000)
        pcm = decode(encode(w, "pcm_s16le"), "pcm_s16le")
        assert np.array_equal(decode(encode(w, "lpc_fixed"), "lpc_fixed"),
                              pcm), i
    w = synth_wave(3, 16000, 2000)
    for n in (0, 1, 2, 5, _LPC_PART - 1, _LPC_PART, _LPC_PART + 1,
              _LPC_FRAME - 1, _LPC_FRAME, _LPC_FRAME + 1, 2 * _LPC_FRAME + 3):
        cut = w[:n]
        pcm = decode(encode(cut, "pcm_s16le"), "pcm_s16le")
        assert np.array_equal(decode(encode(cut, "lpc_fixed"), "lpc_fixed"),
                              pcm), n
    # pure tone: fixed prediction bites hard (measured ~0.38x pcm_s16le)
    tone = (0.9 * np.sin(2 * np.pi * 440 * np.arange(32000) / 16000)
            ).astype(np.float32)
    assert len(encode(tone, "lpc_fixed")) < 0.5 * len(encode(tone, "pcm_s16le"))
    # incompressible noise must not blow up (widths adapt per partition)
    rng = np.random.default_rng(0)
    noise = rng.uniform(-1, 1, 30001).astype(np.float32)
    assert len(encode(noise, "lpc_fixed")) < 1.05 * len(encode(noise, "pcm_s16le"))
    # deterministic bytes
    assert encode(w, "lpc_fixed") == encode(w, "lpc_fixed")


def test_lpc_fixed_fuzz_roundtrip():
    """Randomized lengths/amplitudes (including clipping inputs and the
    empty clip): every case must round-trip to the exact pcm16 lattice."""
    for t in range(60):
        r = np.random.default_rng(1000 + t)
        n = int(r.integers(0, 9000))
        w = (r.uniform(-1.3, 1.3, n) * r.uniform(0, 1)).astype(np.float32)
        pcm = decode(encode(w, "pcm_s16le"), "pcm_s16le")
        got = decode(encode(w, "lpc_fixed"), "lpc_fixed")
        assert np.array_equal(got, pcm), t


def test_lpc_fixed_through_both_spark_paths(spark):
    """lpc_fixed clips flow through decode_features AND the Arrow fast path
    (zero-copy uint8 views, not bytes) with features identical to pcm16
    clips of the same waveform — lossless means the whole feature row is
    bit-equal, not just close."""
    import pandas as pd

    from condor_spark.engine.audio import decode_features, decode_features_arrow

    rows = []
    for i in range(6):
        w = synth_wave(200 + i, 16000, 400 + 53 * i)
        for codec, tag in (("lpc_fixed", "l"), ("pcm_s16le", "p")):
            rows.append({"clip_id": f"{tag}{i}", "bytes": encode(w, codec),
                         "sr_hz": 16000, "dur_ms": 400 + 53 * i,
                         "codec": codec, "transcript": f"tok {i}"})
    df = spark.createDataFrame(pd.DataFrame(rows)).repartition(2)
    a = (decode_features(df).toPandas()
         .sort_values("clip_id").reset_index(drop=True))
    b = (decode_features_arrow(df).toPandas()
         .sort_values("clip_id").reset_index(drop=True))
    feat_cols = [c for c in a.columns if c not in ("clip_id", "codec")]
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    la = a[a["clip_id"].str.startswith("l")].reset_index(drop=True)
    pa = a[a["clip_id"].str.startswith("p")].reset_index(drop=True)
    for c in feat_cols:
        assert (la[c].to_numpy() == pa[c].to_numpy()).all(), c


def test_clip_spectral_analytic():
    """Spectral features against closed-form signals: a pure tone's
    centroid/rolloff sit at its frequency with near-zero bandwidth and
    near-zero flatness; white noise is flat (≈1) with centroid near the
    band middle; silence and tiny clips are all-zero."""
    from condor_spark.engine.audio import clip_spectral

    sr, n = 16000, 32000
    tone = (0.9 * np.sin(2 * np.pi * 1000.0 * np.arange(n) / sr)
            ).astype(np.float32)
    f = clip_spectral(tone, sr)
    assert abs(f["centroid_hz"] - 1000.0) < 2.0
    assert abs(f["rolloff_hz"] - 1000.0) < 2.0
    assert f["bandwidth_hz"] < 20.0
    assert f["flatness"] < 1e-3

    rng = np.random.default_rng(0)
    noise = rng.standard_normal(n).astype(np.float32)
    f = clip_spectral(noise, sr)
    assert 0.5 < f["flatness"] <= 1.0
    assert abs(f["centroid_hz"] - sr / 4) < sr * 0.02  # flat spectrum mean
    assert f["bandwidth_hz"] > 1000.0

    assert clip_spectral(np.zeros(n, dtype=np.float32), sr) == {
        "centroid_hz": 0.0, "bandwidth_hz": 0.0,
        "rolloff_hz": 0.0, "flatness": 0.0}
    assert clip_spectral(np.zeros(0, dtype=np.float32), sr)["flatness"] == 0.0
    assert clip_spectral(np.zeros(1, dtype=np.float32), sr)["flatness"] == 0.0


def test_spectral_features_spark_path(spark):
    """spectral_features through the Spark surface: per-clip values equal a
    local recompute of the decoded wave, across codecs (incl. the lossless
    one, where tone centroids must land on the synthesis frequency)."""
    import pandas as pd

    from condor_spark.engine.audio import clip_spectral, spectral_features

    rows = []
    for i, codec in enumerate(["pcm_s16le", "lpc_fixed", "mulaw", "alaw"]):
        freq = 500.0 * (i + 1)
        w = (0.8 * np.sin(2 * np.pi * freq * np.arange(16000) / 16000)
             ).astype(np.float32)
        rows.append({"clip_id": f"s{i}", "bytes": encode(w, codec),
                     "sr_hz": 16000, "dur_ms": 1000, "codec": codec,
                     "transcript": "x"})
    df = spark.createDataFrame(pd.DataFrame(rows)).repartition(2)
    got = (spectral_features(df).toPandas()
           .sort_values("clip_id").reset_index(drop=True))
    for i, r in got.iterrows():
        local = clip_spectral(decode(rows[i]["bytes"], rows[i]["codec"]),
                              16000)
        for k in ("centroid_hz", "bandwidth_hz", "rolloff_hz", "flatness"):
            assert r[k] == local[k], (i, k)
        assert abs(r["centroid_hz"] - 500.0 * (i + 1)) < 3.0, i


# ------------------------------------------------------------ fingerprints
def test_band_energy_fp_exact_and_planted_dups(spark):
    """Band-energy shingle fingerprints + pair join on the gated exact
    fixture: rows i and i+120 are planted content duplicates (param_mod
    folds every waveform parameter onto i%120) — the operator must report
    exactly those 120 pairs, each at fingerprint-Jaccard 1.0."""
    from condor_spark.engine.audio import (band_energy_fingerprints,
                                           fingerprint_pairs)

    clips = fixtures.audio_clips_exact(spark, 240, num_partitions=4,
                                       param_mod=120, gate=True)
    fps = band_energy_fingerprints(clips, frame=128, shingle=4)
    got = (fingerprint_pairs(fps, min_matches=3, max_df=64,
                             min_jaccard=0.6)
           .toPandas().sort_values("id_a").reset_index(drop=True))
    assert len(got) == 120
    assert (got["jaccard"] == 1.0).all()
    for _, r in got.iterrows():
        ia, ib = int(r["id_a"][5:]), int(r["id_b"][5:])
        assert ib == ia + 120


def test_landmark_fp_shift_invariance():
    """Hop-aligned time shifts leave landmark fingerprints identical —
    only the frame DELTA is hashed, never absolute time."""
    from condor_spark.engine.audio import clip_fp_landmarks

    w = synth_wave(3, 16000, 1500)
    base = clip_fp_landmarks(w)
    shifted = clip_fp_landmarks(np.concatenate(
        [np.zeros(512, dtype=w.dtype), w]))
    # shifted clip adds silence frames (no salient peaks -> no landmarks)
    # and boundary frames; every original landmark must survive
    assert set(base.tolist()) <= set(shifted.tolist())


def test_landmark_fp_codec_invariance_and_separation():
    """Lossy re-encodes (mulaw) keep fingerprint-Jaccard 1.0 per clip;
    distinct clips stay well-separated (tone bins differ)."""
    from condor_spark.engine.audio import clip_fp_landmarks, decode, encode

    sets = {}
    for i in range(12):
        r = fixtures.clip_row(i)
        w = decode(r["bytes"], r["codec"])
        a = set(clip_fp_landmarks(w).tolist())
        b = set(clip_fp_landmarks(
            decode(encode(w, "mulaw"), "mulaw")).tolist())
        assert a and a == b, i   # lossy codec leaves landmarks intact
        sets[i] = a
    for i in range(12):
        for j in range(i + 1, 12):
            inter = len(sets[i] & sets[j])
            jac = inter / len(sets[i] | sets[j])
            assert jac < 0.35, (i, j, jac)


def test_landmark_fp_spark_planted_dups(spark):
    """End-to-end Spark path: 40 RNG clips + 20 mulaw re-encodes under new
    ids — all 20 planted duplicate pairs reported at Jaccard 1.0."""
    from pyspark.sql import functions as F

    from condor_spark.engine.audio import (fingerprint_pairs,
                                           landmark_fingerprints)

    base = fixtures.audio_clips(spark, 40, num_partitions=4)
    dups = fixtures.reencode_dups(
        base.filter(F.col("clip_id") < "clip-000000000020"))
    got = (fingerprint_pairs(
               landmark_fingerprints(base.unionByName(dups)),
               min_matches=3, max_df=64, min_jaccard=0.35)
           .toPandas())
    planted = got[got.id_a.str.startswith("clip-")
                  & got.id_b.str.startswith("dup-")
                  & (got.id_a.str.split("-").str[1]
                     == got.id_b.str.split("-").str[1])]
    assert len(planted) == 20
    assert (planted["jaccard"] == 1.0).all()


# ------------------------------------------------------------- embeddings
def test_audio_embeddings_bridge_to_similarity(spark):
    """audio_embeddings feeds the similarity family unchanged: mulaw
    re-encodes of 20 clips are each other's top-1 cosine neighbor, and
    cosine_near_dup_pairs at 0.95 returns exactly the 20 planted pairs."""
    from pyspark.sql import functions as F

    from condor_spark.engine.audio import audio_embeddings
    from condor_spark.engine.similarity import (brute_force_topk,
                                                cosine_near_dup_pairs)

    base = fixtures.audio_clips(spark, 40, num_partitions=4)
    dups = fixtures.reencode_dups(
        base.filter(F.col("clip_id") < "clip-000000000020"))
    emb = audio_embeddings(base.unionByName(dups)).persist()

    pairs = cosine_near_dup_pairs(emb, threshold=0.95,
                                  id_col="clip_id").toPandas()
    planted = pairs[pairs.id_a.str.startswith("clip-")
                    & pairs.id_b.str.startswith("dup-")
                    & (pairs.id_a.str[5:] == pairs.id_b.str[4:])]
    assert len(planted) == 20
    assert len(pairs) == 20  # and nothing else crosses 0.95

    top = brute_force_topk(emb, [f"dup-{i:012d}" for i in range(20)],
                           k=1, id_col="clip_id").toPandas()
    assert len(top) == 20
    for _, r in top.iterrows():
        assert r["neighbor_id"] == "clip-" + r["query_id"][4:], r
    emb.unpersist()


def test_clip_embedding_edge_cases():
    from condor_spark.engine.audio import clip_embedding

    assert not clip_embedding(np.zeros(10)).any()        # too short
    assert not clip_embedding(np.zeros(4096)).any()      # silent
    e = clip_embedding(synth_wave(3, 16000, 500))
    assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-5    # unit L2
    assert e.dtype == np.float32 and e.size == 64
