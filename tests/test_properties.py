"""Property-based tests (hypothesis) for the kernel laws the engine's
distributed execution rests on (SURVEY.md §5):

1. **Partition invariance** — sketch(all) == merge(sketch(chunk_i)) for any
   chunking, in any merge order. This is exactly what makes the two-phase
   mapInPandas-partial / applyInPandas-final build produce the same synopsis
   at local[2], local[8], local[32], and on a 1000-executor cluster.
2. **Invertibility** — (a ⊔ b) ⊟ b == a for the invertible kinds, the law
   behind sliding-window slice eviction (InvertibleSynopsisFunction.java
   analogue, evaluate.sliding_via_inversion).
3. **Deterministic sampler invariance** — FiFo / bottom-k final samples are
   chunking-independent (they must be: the driver's value-hash compares
   their exact rows).

All pure numpy — no SparkSession, so hypothesis can run many examples fast.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from condor_spark.synopsis import make  # noqa: F401  (registers kinds)

# data: small int domains provoke collisions; include negatives and dupes
values = st.lists(st.integers(min_value=-500, max_value=500),
                  min_size=1, max_size=400)
pos_floats = st.lists(st.floats(min_value=0.001, max_value=1e6,
                                allow_nan=False, allow_infinity=False),
                      min_size=1, max_size=400)


def chunkings(data, draw_splits):
    """Split data at the drawn positions into >= 1 chunks."""
    n = len(data)
    pts = sorted({min(s % (n + 1), n) for s in draw_splits})
    bounds = [0] + [p for p in pts if 0 < p < n] + [n]
    return [np.asarray(data[a:b]) for a, b in zip(bounds, bounds[1:])]


MERGEABLE = [
    ("countmin", dict(width=64, height=4, seed=7),
     lambda s: s.counts),
    ("ams", dict(width=32, height=5, seed=7),
     lambda s: s.counts),
    ("hll", dict(log_reg_num=6, seed=7),
     lambda s: s.registers),
    ("bloom", dict(n_bits=512, max_elements=64, seed=7, merge_mode="union"),
     lambda s: s.bits),
    ("equiwidth", dict(lower=-500.0, upper=501.0, num_buckets=17),
     lambda s: s.frequency),
    # k=32 over the +-500 domain saturates often: both estimator branches
    ("kmv", dict(k=32, seed=7), lambda s: s.mins),
]


@pytest.mark.parametrize("kind,params,state_of",
                         MERGEABLE, ids=[m[0] for m in MERGEABLE])
@given(data=values, splits=st.lists(st.integers(0, 10**6), max_size=6),
       order_seed=st.integers(0, 2**16))
@settings(max_examples=40, deadline=None)
def test_partition_invariance(kind, params, state_of, data, splits, order_seed):
    whole = make(kind, **params)
    whole.update_batch(np.asarray(data))

    chunks = chunkings(data, splits)
    partials = []
    for c in chunks:
        p = make(kind, **params)
        p.update_batch(c)
        partials.append(p)
    # arbitrary merge order — commutativity is part of the law
    rng = np.random.default_rng(order_seed)
    rng.shuffle(partials)
    acc = partials[0]
    for p in partials[1:]:
        acc = acc.merge(p)

    assert np.array_equal(state_of(acc), state_of(whole))
    assert acc.n_processed == whole.n_processed


@given(data=pos_floats, splits=st.lists(st.integers(0, 10**6), max_size=6))
@settings(max_examples=40, deadline=None)
def test_ddsketch_partition_invariance(data, splits):
    """DDSketch bins are integer counts in log-γ buckets: any chunking must
    produce identical quantile reads (bin collapse is deterministic given
    identical bin contents; max_num_bins is sized to avoid mid-stream
    collapse divergence here — collapse equivalence is tested separately in
    test_kernels)."""
    params = dict(relative_accuracy=0.02, max_num_bins=4096)
    whole = make("ddsketch", **params)
    whole.update_batch(np.asarray(data))
    acc = None
    for c in chunkings(data, splits):
        p = make("ddsketch", **params)
        p.update_batch(c)
        acc = p if acc is None else acc.merge(p)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    assert np.allclose(acc.quantiles(qs), whole.quantiles(qs), rtol=0, atol=0)


INVERTIBLE = [
    ("countmin", dict(width=64, height=4, seed=7), lambda s: s.counts),
    ("ams", dict(width=32, height=5, seed=7), lambda s: s.counts),
    ("equiwidth", dict(lower=-500.0, upper=501.0, num_buckets=17),
     lambda s: s.frequency),
]


@pytest.mark.parametrize("kind,params,state_of",
                         INVERTIBLE, ids=[m[0] for m in INVERTIBLE])
@given(a=values, b=values)
@settings(max_examples=40, deadline=None)
def test_invert_law(kind, params, state_of, a, b):
    """(a ⊔ b) ⊟ b == a — the slide-out eviction law."""
    sa = make(kind, **params)
    sa.update_batch(np.asarray(a))
    sb = make(kind, **params)
    sb.update_batch(np.asarray(b))
    sb2 = make(kind, **params)
    sb2.update_batch(np.asarray(b))

    merged = sa.merge(sb)            # in place on sa
    restored = merged.invert(sb2)
    ref = make(kind, **params)
    ref.update_batch(np.asarray(a))
    assert np.array_equal(state_of(restored), state_of(ref))


@given(data=values, splits=st.lists(st.integers(0, 10**6), max_size=6))
@settings(max_examples=40, deadline=None)
def test_fifo_chunk_invariance(data, splits):
    """FiFo keeps the k newest by (ts, tiebreak) — any chunking of the
    (ordered) stream yields the same final sample rows."""
    k = 7
    ts = np.arange(len(data), dtype=np.int64)
    tb = np.asarray(data, dtype=np.int64)
    whole = make("fifo", sample_size=k)
    whole.update_batch(np.asarray(data), ts=ts, tiebreak=tb)

    acc = None
    off = 0
    for c in chunkings(data, splits):
        p = make("fifo", sample_size=k)
        p.update_batch(c, ts=ts[off:off + len(c)],
                       tiebreak=tb[off:off + len(c)])
        off += len(c)
        acc = p if acc is None else acc.merge(p)
    assert whole.sorted_sample()[0].tolist() == acc.sorted_sample()[0].tolist()


@given(vals=st.lists(st.floats(min_value=-1.5, max_value=1.5,
                               allow_nan=False, width=32),
                     min_size=0, max_size=9000))
@settings(max_examples=40, deadline=None)
def test_lpc_fixed_lossless_property(vals):
    """PROPERTY: for every float waveform (any length, including values
    outside [-1,1] that the encoder clips), lpc_fixed round-trips to the
    exact pcm_s16le lattice rendering — losslessness is an identity on the
    int16 lattice, not an SNR bound."""
    from condor_spark.engine.audio import decode, encode

    w = np.asarray(vals, dtype=np.float32)
    pcm = decode(encode(w, "pcm_s16le"), "pcm_s16le")
    got = decode(encode(w, "lpc_fixed"), "lpc_fixed")
    assert got.dtype == pcm.dtype and np.array_equal(got, pcm)


@given(a=values, b=values)
@settings(max_examples=40, deadline=None)
def test_kmv_overlap_symmetry(a, b):
    """Overlap laws (Beyer et al. 2007): union/intersection/Jaccard are
    symmetric, per-corpus estimates swap, and self-overlap is the
    identity (union == intersection == distinct, Jaccard exactly 1)."""
    sa = make("kmv", k=32, seed=7)
    sa.update_batch(np.asarray(a))
    sb = make("kmv", k=32, seed=7)
    sb.update_batch(np.asarray(b))
    oab, oba = sa.overlap(sb), sb.overlap(sa)
    assert oab["est_union"] == oba["est_union"]
    assert oab["est_intersection"] == oba["est_intersection"]
    assert oab["jaccard"] == oba["jaccard"]
    assert (oab["est_a"], oab["est_b"]) == (oba["est_b"], oba["est_a"])
    oself = sa.overlap(sa)
    assert oself["est_union"] == oself["est_intersection"] == oself["est_a"]
    assert oself["jaccard"] == 1.0
