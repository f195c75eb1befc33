"""Kernel unit tests mirroring the reference's per-synopsis test strategy
(SURVEY.md §5: update invariants, statistical error bounds, merge semantics,
illegal-merge guards — cf. core/.../tests/*Test.java)."""

import numpy as np
import pytest

from condor_spark.synopsis import make
from condor_spark.synopsis.base import Synopsis

RNG = np.random.default_rng(42)
DATA = RNG.integers(0, 1000, size=50_000)
TS = np.arange(DATA.size, dtype=np.int64)


def roundtrip(syn):
    return Synopsis.from_bytes(syn.to_bytes())


# ---------------------------------------------------------------- CountMin
class TestCountMin:
    def test_row_sums_equal_n(self):
        # every row sums to elementsProcessed (CountMinSketchTest.java:17-62)
        cm = make("countmin", width=150, height=8, seed=7)
        cm.update_batch(DATA)
        assert (cm.counts.sum(axis=1) == DATA.size).all()

    def test_join_size_estimate(self):
        # CM inner product is one-sided (>= truth) with expected collision
        # mass e*Na*Nb/w per row (Cormode-Muthukrishnan sec 4.2)
        rng = np.random.default_rng(13)
        xa = rng.integers(0, 500, size=6000)
        xb = rng.integers(0, 500, size=4000)
        a = make("countmin", width=2048, height=5, seed=7)
        b = make("countmin", width=2048, height=5, seed=7)
        a.update_batch(xa)
        b.update_batch(xb)
        fa = np.bincount(xa, minlength=500).astype(np.float64)
        fb = np.bincount(xb, minlength=500).astype(np.float64)
        truth = float((fa * fb).sum())
        est = a.estimate_join(b)
        assert est >= truth                       # one-sided like query()
        assert est - truth <= a.join_error_bound(b)
        assert a.estimate_join(b) == b.estimate_join(a)

    def test_error_bound(self):
        # |est - true| <= residual mass / width (CountMinSketchTest.java:97-122)
        cm = make("countmin", width=150, height=8, seed=7)
        cm.update_batch(DATA)
        true = np.bincount(DATA, minlength=1000)
        est = cm.query(np.arange(1000))
        assert (est >= true).all()  # one-sided overestimate
        bound = (DATA.size - true) / 150
        # per-key failure prob (1/2)^height; allow the expected tail
        failures = (est - true > bound).sum()
        assert failures <= max(3, int(0.02 * 1000))

    def test_merge_doubles(self):
        # merge(self-copy) doubles counters (CountMinSketchTest.java:136-156)
        cm = make("countmin", width=128, height=4, seed=7)
        cm.update_batch(DATA[:1000])
        other = roundtrip(cm)
        cm.merge(other)
        assert (cm.counts.sum(axis=1) == 2000).all()

    def test_invert(self):
        cm = make("countmin", width=128, height=4, seed=7)
        cm.update_batch(DATA[:2000])
        part = make("countmin", width=128, height=4, seed=7)
        part.update_batch(DATA[:1000])
        cm.invert(part)
        expect = make("countmin", width=128, height=4, seed=7)
        expect.update_batch(DATA[1000:2000])
        assert np.array_equal(cm.counts, expect.counts)

    def test_illegal_merge(self):
        # (CountMinSketchTest.java:124-135)
        a = make("countmin", width=128, height=4, seed=7)
        b = make("countmin", width=64, height=4, seed=7)
        with pytest.raises(ValueError):
            a.merge(b)

    def test_string_keys(self):
        cm = make("countmin", width=4096, height=5, seed=7)
        keys = np.array(["alpha"] * 30 + ["beta"] * 5)
        cm.update_batch(keys)
        est = cm.query(np.array(["alpha", "beta", "gamma"]))
        assert est[0] == 30 and est[1] == 5


# ---------------------------------------------------------------- partition invariance
@pytest.mark.parametrize("kind,params", [
    ("countmin", dict(width=512, height=5, seed=7)),
    ("ams", dict(width=256, height=5, seed=7)),
    ("hll", dict(log_reg_num=10, seed=7)),
    ("bloom", dict(n_bits=2048, max_elements=256, seed=7, merge_mode="union")),
    ("equiwidth", dict(lower=0.0, upper=1000.0, num_buckets=20)),
    ("ddsketch", dict(relative_accuracy=0.01, max_num_bins=2048)),
    ("kmv", dict(k=256, seed=7)),
])
def test_merge_partition_invariance(kind, params):
    """sketch(all) == merge(sketch(part_i)) — the core correctness property
    the reference's two-phase build relies on (SynopsisBuilder.java:224-242)."""
    full = make(kind, **params)
    full.update_batch(DATA)
    parts = None
    for chunk in np.array_split(DATA, 7):
        p = make(kind, **params)
        p.update_batch(chunk)
        parts = p if parts is None else parts.merge(p)
    assert parts.to_bytes() == full.to_bytes() or _states_equal(parts, full)


def _states_equal(a, b):
    sa, sb = a._state(), b._state()
    if set(sa) != set(sb):
        return False
    def eq(va, vb):
        if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
            return np.array_equal(np.asarray(va), np.asarray(vb))
        if isinstance(va, (tuple, list)) and isinstance(vb, (tuple, list)):
            return len(va) == len(vb) and all(eq(a, b) for a, b in zip(va, vb))
        return va == vb

    for k in sa:
        if not eq(sa[k], sb[k]):
            return False
    return True


# ---------------------------------------------------------------- HLL
class TestHLL:
    def test_accuracy_bound(self):
        # relative accuracy ~1.04/sqrt(m) (HyperLogLogSketchTest.java:125-158)
        big = RNG.integers(0, 2**31 - 1, size=300_000)
        true = len(np.unique(big))
        h = make("hll", log_reg_num=12, seed=7)
        h.update_batch(big)
        assert abs(h.estimate() - true) / true < 3 * 1.04 / np.sqrt(4096)

    def test_small_range_linear_counting(self):
        h = make("hll", log_reg_num=12, seed=7)
        h.update_batch(np.arange(100))
        assert abs(h.estimate() - 100) <= 5

    def test_merge_is_max(self):
        h1 = make("hll", log_reg_num=8, seed=7)
        h2 = make("hll", log_reg_num=8, seed=7)
        h1.update_batch(np.arange(0, 5000))
        h2.update_batch(np.arange(2500, 7500))
        h1.merge(h2)
        full = make("hll", log_reg_num=8, seed=7)
        full.update_batch(np.arange(7500))
        assert np.array_equal(h1.registers, full.registers)


# ---------------------------------------------------------------- Bloom
class TestBloom:
    def test_fp_bound(self):
        # fp <= (1 - e^{-kn/m})^k (BloomFilterTest.java:32-56); n=1500, m=3000
        bl = make("bloom", n_bits=3000, max_elements=1500, seed=7)
        present = RNG.integers(0, 2**31 - 1, size=1500)
        bl.update_batch(present)
        assert bl.query(present).all()  # no false negatives
        absent = np.arange(10**9, 10**9 + 20_000)
        fp = bl.query(absent).mean()
        assert fp <= 1.5 * bl.fp_bound(1500) + 0.01

    def test_reference_intersect_merge_quirk(self):
        # BloomFilter.java:121 merges with AND
        a = make("bloom", n_bits=1024, max_elements=64, seed=7)
        b = make("bloom", n_bits=1024, max_elements=64, seed=7)
        a.update_batch(np.array([1, 2, 3]))
        b.update_batch(np.array([3, 4, 5]))
        a.merge(b)
        assert a.query(np.array([3]))[0]
        assert not a.query(np.array([1]))[0]  # intersection semantics


# ---------------------------------------------------------------- AMS
class TestAMS:
    def test_f2_bound(self):
        # error F2/sqrt(width), failure prob 1/2^height (FastAGMS.java:196-211)
        ams = make("ams", width=1024, height=7, seed=7)
        ams.update_batch(DATA)
        f2 = float((np.bincount(DATA).astype(np.float64) ** 2).sum())
        assert abs(ams.estimate_f2() - f2) <= 4 * f2 / np.sqrt(1024)

    def test_invert(self):
        a = make("ams", width=128, height=5, seed=7)
        a.update_batch(DATA[:2000])
        b = make("ams", width=128, height=5, seed=7)
        b.update_batch(DATA[:1000])
        a.invert(b)
        c = make("ams", width=128, height=5, seed=7)
        c.update_batch(DATA[1000:2000])
        assert np.array_equal(a.counts, c.counts)

    def test_join_size_estimate(self):
        # |A join B| = sum_k fA(k)*fB(k); AGMS estimator within 4 sigma_row
        # (sigma_row = sqrt(2*F2A*F2B/w) — join_error_bound)
        rng = np.random.default_rng(11)
        xa = rng.integers(0, 500, size=6000)
        xb = rng.integers(0, 500, size=4000)
        a = make("ams", width=1024, height=7, seed=7)
        b = make("ams", width=1024, height=7, seed=7)
        a.update_batch(xa)
        b.update_batch(xb)
        fa = np.bincount(xa, minlength=500).astype(np.float64)
        fb = np.bincount(xb, minlength=500).astype(np.float64)
        truth = float((fa * fb).sum())
        assert abs(a.estimate_join(b) - truth) <= 4 * a.join_error_bound(b)
        # self-join specializes to F2
        assert a.estimate_join(a) == a.estimate_f2()
        # symmetric
        assert a.estimate_join(b) == b.estimate_join(a)

    def test_join_size_rejects_mismatched_family(self):
        a = make("ams", width=128, height=5, seed=7)
        b = make("ams", width=128, height=5, seed=8)
        with pytest.raises(ValueError):
            a.estimate_join(b)


# ---------------------------------------------------------------- Cuckoo
class TestCuckoo:
    def test_membership_and_delete(self):
        ck = make("cuckoo", bucket_size=4, num_buckets=1024, seed=7)
        present = np.arange(1, 1500)
        ck.update_batch(present)
        assert ck.query(present).all()
        assert not ck.full
        assert ck.delete_batch(present[:200]).all()
        # deleted keys mostly gone (residual = fingerprint collisions)
        assert ck.query(present[:200]).mean() < 0.05

    def test_merge_best_effort(self):
        a = make("cuckoo", bucket_size=4, num_buckets=256, seed=7)
        b = make("cuckoo", bucket_size=4, num_buckets=256, seed=7)
        a.update_batch(np.arange(1, 300))
        b.update_batch(np.arange(300, 600))
        a.merge(b)
        assert a.query(np.arange(1, 600)).mean() > 0.99


# ---------------------------------------------------------------- samplers
class TestSamplers:
    def test_reservoir_uniformity(self):
        # sample mean within CLT bound of population mean
        rs = make("reservoir", sample_size=1000, seed=7)
        rs.update_batch(DATA)
        s = np.asarray(rs.sample, dtype=np.float64)
        se = DATA.std() / np.sqrt(1000)
        assert abs(s.mean() - DATA.mean()) < 4 * se
        assert rs.n_processed == DATA.size

    def test_reservoir_weighted_merge(self):
        a = make("reservoir", sample_size=500, seed=7)
        b = make("reservoir", sample_size=500, seed=11)
        a.update_batch(DATA[:25000])
        b.update_batch(DATA[25000:])
        a.merge(b)
        s = np.asarray(a.sample, dtype=np.float64)
        assert len(s) == 500
        se = DATA.std() / np.sqrt(500)
        assert abs(s.mean() - DATA.mean()) < 4 * se

    def test_fifo_newest_k(self):
        f = make("fifo", sample_size=25)
        f.update_batch(DATA[:30000], ts=TS[:30000], tiebreak=TS[:30000])
        g = make("fifo", sample_size=25)
        g.update_batch(DATA[30000:], ts=TS[30000:], tiebreak=TS[30000:])
        f.merge(g)
        _, t, _ = f.sorted_sample()
        assert t.tolist() == list(range(DATA.size - 25, DATA.size))

    def test_biased_reservoir_recency(self):
        br = make("biased_reservoir", sample_size=200, seed=7)
        br.update_batch(DATA, ts=TS)
        assert np.mean(br.ts) > TS.mean()  # recency bias

    def test_bottomk_deterministic_and_invariant(self):
        full = make("bottomk", sample_size=100, seed=7)
        full.update_batch(DATA)
        merged = None
        for chunk in np.array_split(DATA, 5):
            p = make("bottomk", sample_size=100, seed=7)
            p.update_batch(chunk)
            merged = p if merged is None else merged.merge(p)
        assert list(full.sorted_sample()[0]) == list(merged.sorted_sample()[0])


# ---------------------------------------------------------------- histograms
class TestHistograms:
    def test_equiwidth_exact_and_range(self):
        ew = make("equiwidth", lower=0.0, upper=1000.0, num_buckets=10)
        ew.update_batch(DATA.astype(np.float64))
        assert ew.frequency.sum() == DATA.size
        exact = ((DATA >= 0) & (DATA < 500)).sum()
        assert abs(ew.range_query(0, 500) - exact) < 0.01 * DATA.size

    def test_equiwidth_out_of_range_dropped(self):
        ew = make("equiwidth", lower=0.0, upper=10.0, num_buckets=5)
        ew.update_batch(np.array([-1.0, 5.0, 10.0, 11.0]))
        assert ew.n_processed == 1 and ew.frequency.sum() == 1

    def test_bash_equidepth_quality(self):
        vals = RNG.normal(100, 25, 50_000)
        bash = make("bash", precision=7, num_buckets=10)
        for chunk in np.array_split(vals, 20):
            bash.update_batch(chunk)
        bounds, _ = bash.build_equidepth()
        counts = np.histogram(vals, bins=bounds)[0] / vals.size
        assert (np.abs(counts - 0.1) < 0.05).all()  # each bucket ~10% mass

    def test_bash_merge(self):
        a = make("bash", precision=7, num_buckets=10)
        b = make("bash", precision=7, num_buckets=10)
        v1, v2 = RNG.normal(50, 10, 20000), RNG.normal(150, 10, 20000)
        a.update_batch(v1)
        b.update_batch(v2)
        a.merge(b)
        allv = np.concatenate([v1, v2])
        bounds, _ = a.build_equidepth()
        counts = np.histogram(allv, bins=bounds)[0] / allv.size
        assert (np.abs(counts - 0.1) < 0.06).all()


# ---------------------------------------------------------------- DDSketch
class TestDDSketch:
    def test_relative_accuracy(self):
        vals = RNG.uniform(0.01, 500, 100_000)
        dd = make("ddsketch", relative_accuracy=0.01, max_num_bins=2048)
        dd.update_batch(vals)
        for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
            exact = np.quantile(vals, q)
            assert abs(dd.quantile(q) - exact) / exact <= 0.011 + 2.0 / 100_000

    def test_merge_and_invert(self):
        vals = RNG.uniform(1, 100, 10_000)
        full = make("ddsketch", relative_accuracy=0.02)
        full.update_batch(vals)
        a = make("ddsketch", relative_accuracy=0.02)
        b = make("ddsketch", relative_accuracy=0.02)
        a.update_batch(vals[:6000])
        b.update_batch(vals[6000:])
        a.merge(b)
        assert _states_equal(a, full)
        a.invert(b)
        c = make("ddsketch", relative_accuracy=0.02)
        c.update_batch(vals[:6000])
        assert _states_equal(a, c)

    def test_collapse(self):
        dd = make("ddsketch", relative_accuracy=0.001, max_num_bins=32)
        dd.update_batch(RNG.uniform(0.001, 1e6, 10_000))
        assert dd.keys.size <= 32 and dd.collapsed
        # upper quantiles stay accurate after lowest-bin collapse
        vals = RNG.uniform(1, 1000, 10_000)
        dd2 = make("ddsketch", relative_accuracy=0.01, max_num_bins=64)
        dd2.update_batch(vals)
        exact = np.quantile(vals, 0.99)
        assert abs(dd2.quantile(0.99) - exact) / exact < 0.02


# ---------------------------------------------------------------- wavelet
class TestWavelet:
    def test_exact_with_full_budget(self):
        x = RNG.uniform(0, 10, 3000)  # non-power-of-two → padding path
        wv = make("wavelet", size=1 << 13)
        wv.update_batch(x)
        wv.finalize()
        assert abs(wv.point_query(1234) - x[1234]) < 1e-9
        assert abs(wv.range_sum_query(100, 2900) - x[100:2900].sum()) < 1e-6

    def test_budget_compression(self):
        smooth = np.cumsum(RNG.normal(0, 1, 8192))
        wv = make("wavelet", size=256)
        wv.update_batch(smooth)
        wv.finalize()
        true = smooth[1000:5000].sum()
        assert abs(wv.range_sum_query(1000, 5000) - true) / abs(true) < 0.05

    def test_slice_manager(self):
        from condor_spark.synopsis.wavelet import SliceWaveletsManager
        x = RNG.uniform(0, 10, 4096)
        parts = []
        off = 0
        for chunk in np.array_split(x, 4):
            w = make("wavelet", size=1 << 12)
            w.update_batch(chunk)
            w.finalize()
            parts.append((off, chunk.size, w))
            off += chunk.size
        mgr = SliceWaveletsManager(parts)
        assert abs(mgr.range_sum_query(100, 4000) - x[100:4000].sum()) < 1e-6
        assert abs(mgr.point_query(2500) - x[2500]) < 1e-9


# ---------------------------------------------------------------- serde
@pytest.mark.parametrize("kind,params", [
    ("countmin", dict(width=64, height=3, seed=7)),
    ("ams", dict(width=64, height=3, seed=7)),
    ("hll", dict(log_reg_num=8, seed=7)),
    ("bloom", dict(n_bits=512, max_elements=64, seed=7)),
    ("cuckoo", dict(bucket_size=4, num_buckets=64, seed=7)),
    ("reservoir", dict(sample_size=10, seed=7)),
    ("biased_reservoir", dict(sample_size=10, seed=7)),
    ("fifo", dict(sample_size=10)),
    ("bottomk", dict(sample_size=10, seed=7)),
    ("equiwidth", dict(lower=0.0, upper=100.0, num_buckets=4)),
    ("bash", dict(precision=3, num_buckets=4)),
    ("ddsketch", dict(relative_accuracy=0.05)),
])
def test_serde_roundtrip(kind, params):
    syn = make(kind, **params)
    syn.update_batch(np.arange(1, 200), ts=np.arange(199))
    back = roundtrip(syn)
    assert back.n_processed == syn.n_processed
    assert _states_equal(back, syn)


class TestEquiWidth4LT:
    def test_packed_bits_reference_vector(self):
        # RealValuedBucket4LTTest.buildTest vector, bit-for-bit
        from condor_spark.synopsis.histograms import EquiWidth4LTHistogram
        h = EquiWidth4LTHistogram(0.0, 18.0, 8)
        h.frequency = np.array([12, 18, 16, 6, 6, 14, 13, 15], dtype=np.int64)
        roots, packed = h.compress()
        assert roots[0] == 100
        assert bin(int(packed[0]))[2:].zfill(32) == \
            "10000110010011010110101101010111"

    def test_range_error_bound(self):
        # RealValuedBucket4LTTest.getFrequencyTest bounds
        from condor_spark.synopsis.histograms import EquiWidth4LTHistogram
        h = EquiWidth4LTHistogram(0.0, 240.0, 8)
        h.frequency = np.array(sorted([481, 477, 520, 492, 552, 489, 474, 515]),
                               dtype=np.int64)
        err = 30 * 240 / 32
        for (a, b), want in [((-25, 100), 1635), ((180, 300), 989),
                             ((90, 150), 1044), ((185, 200), 228),
                             ((75, 85), 189), ((-10, 25), 403),
                             ((230, 250), 170), ((87, 185), 1662)]:
            assert abs(h.range_query_compressed(a, b) - want) <= err
        assert h.range_query_compressed(0, 240) == 4000
        assert h.range_query_compressed(-80, 0) == 0
        assert h.range_query_compressed(600, 1000) == 0
        assert h.range_query_compressed(155, 155) == 0

    def test_merge_invert_roundtrip_and_padding(self):
        from condor_spark.synopsis.base import Synopsis
        from condor_spark.synopsis.histograms import EquiWidth4LTHistogram
        h = EquiWidth4LTHistogram(0.0, 10.0, 10)   # pads to 16 bins
        assert h.num_buckets == 16 and h.upper == 16.0
        rng = np.random.default_rng(0)
        h.update_batch(rng.uniform(0, 10, 5000))
        other = EquiWidth4LTHistogram(0.0, 10.0, 10)
        other.update_batch(rng.uniform(0, 10, 3000))
        h.merge(other)
        assert h.n_processed == 8000
        assert h.decoded_frequency().sum() == 8000  # deltas conserve the root
        rt = Synopsis.from_bytes(h.to_bytes())
        assert isinstance(rt, EquiWidth4LTHistogram)
        assert (rt.frequency == h.frequency).all()
        h.invert(other)
        assert h.n_processed == 5000
        # compressed estimate tracks the exact one: quantization error is
        # ~root/2^6 per level-2 delta, well under 2% of n here
        assert abs(h.range_query_compressed(2, 7) - h.range_query(2, 7)) \
            <= 0.02 * h.n_processed


def test_eh3_independence_structure():
    """EH3's exact independence structure, enumerated over the full
    effective seed space of an 8-bit input domain (512 seeds): E[∏h] = 0
    for 1-3 distinct inputs; for 4 distinct inputs E[∏h] = 0 unless
    a⊕b⊕c⊕d = 0, where the product is deterministically ±1 (the linear
    parts cancel). Clears the kernel: the AMS bench residual vs F2/√w is
    the scheme's variance math, not an implementation defect."""
    from condor_spark.synopsis.hashing import EH3Family

    fam = EH3Family(512, seed=0)
    S = np.arange(256, dtype=np.uint64)
    fam.S = np.concatenate([S, S])
    fam.s0 = np.concatenate([np.zeros(256, np.uint64),
                             np.ones(256, np.uint64)])
    signs = fam.signs(np.arange(256))  # (512 seeds, 256 inputs)

    rng = np.random.default_rng(1)
    for _ in range(1500):
        q = rng.choice(256, size=4, replace=False)
        for k in (1, 2, 3):
            assert abs(np.prod(signs[:, q[:k]], axis=1).mean()) < 1e-12
        e4 = np.prod(signs[:, q], axis=1).mean()
        if q[0] ^ q[1] ^ q[2] ^ q[3] != 0:
            assert abs(e4) < 1e-12
        else:
            assert abs(abs(e4) - 1.0) < 1e-12
    # force-construct XOR-zero quadruples (rare under random sampling)
    hits = 0
    for _ in range(300):
        a, b, c = (int(v) for v in rng.choice(256, size=3, replace=False))
        d = a ^ b ^ c
        if d in (a, b, c) or d > 255:
            continue
        e4 = np.prod(signs[:, [a, b, c, d]], axis=1).mean()
        assert abs(abs(e4) - 1.0) < 1e-12
        hits += 1
    assert hits > 100


def test_distributed_slice_wavelets_manager():
    """Combined slices x round-robin manager: global routing through slice
    offsets then residue arithmetic must reproduce exact point and range
    queries when every wavelet is under budget (lossless)."""
    from condor_spark.synopsis.wavelet import (DistributedSliceWaveletsManager,
                                               DistributedWaveletsManager,
                                               WaveletSynopsis)

    rng = np.random.default_rng(5)
    data = rng.uniform(0, 100, 700)
    # two slices (400 + 300), each interleaved round-robin over P=2
    slices = []
    off = 0
    for ln in (400, 300):
        chunk = data[off:off + ln]
        ws = []
        for p in range(2):
            w = WaveletSynopsis(size=1 << 10)
            w.update_batch(chunk[p::2])
            w.finalize()
            ws.append(w)
        slices.append((off, ln, DistributedWaveletsManager(2, ws)))
        off += ln
    mgr = DistributedSliceWaveletsManager(slices)
    assert mgr.n == 700
    for i in (0, 1, 399, 400, 401, 699):
        assert abs(mgr.point_query(i) - data[i]) < 1e-9
    for lo, hi in ((0, 700), (10, 390), (395, 405), (500, 700)):
        assert abs(mgr.range_sum_query(lo, hi) - data[lo:hi].sum()) < 1e-6


class TestSplitMergeDD:
    """Split-and-merge equi-depth with a DDSketch backer (paper-correct
    re-derivation of SplitAndMergeWithDDSketch.java — divergences from the
    reference's undebugged version are documented in the kernel)."""

    def _build(self, data, **kw):
        from condor_spark.synopsis.histograms import SplitMergeDDHistogram
        h = SplitMergeDDHistogram(**kw)
        h.update_batch(data)
        return h

    def test_invariants(self):
        rng = np.random.default_rng(11)
        data = rng.lognormal(3, 1, 8000) + 1
        h = self._build(data, num_buckets=12, relative_accuracy=0.01)
        bounds, freqs = h.bounds()
        assert len(freqs) <= 12
        assert abs(sum(freqs) - len(data)) < 1e-6  # conservation
        assert bounds[0] == data.min()             # exact leftmost boundary
        assert bounds[-1] == data.max()            # exact rightmost boundary
        assert (np.diff(bounds) >= 0).all()

    def test_equidepth_accuracy_at_all_times(self):
        """The algorithm's selling point: bounded error mid-stream, not just
        at window end — check after every quarter of the input."""
        rng = np.random.default_rng(7)
        from condor_spark.synopsis.histograms import SplitMergeDDHistogram
        h = SplitMergeDDHistogram(num_buckets=10, relative_accuracy=0.01)
        data = rng.uniform(1, 100, 8000)
        seen = np.empty(0)
        for chunk in np.array_split(data, 4):
            h.update_batch(chunk)
            seen = np.concatenate([seen, chunk])
            exact = ((seen >= 20) & (seen < 60)).sum()
            est = h.range_query(20.0, 60.0)
            assert abs(est - exact) / max(exact, 1) < 0.15

    def test_merge_recomputes_from_sketch(self):
        rng = np.random.default_rng(3)
        a, b = rng.uniform(1, 50, 4000), rng.uniform(25, 100, 4000)
        ha = self._build(a, num_buckets=10)
        hb = self._build(b, num_buckets=10)
        m = ha.merge(hb)
        bounds, freqs = m.bounds()
        assert m.total == 8000
        assert bounds[0] == min(a.min(), b.min())
        assert bounds[-1] == max(a.max(), b.max())
        # post-merge buckets are near-equi-depth (recomputed from the
        # combined sketch): each within 2x of the ideal share
        both = np.concatenate([a, b])
        for lo, hi, f in zip(bounds[:-1], bounds[1:], freqs):
            true = ((both >= lo) & (both < hi)).sum()
            assert abs(f - true) <= 0.5 * 800 + 80, (lo, hi, f, true)

    def test_merge_order_invariant_after_recompute(self):
        """Merging recomputes from the (order-free) sketch, so any merge
        topology gives the same boundaries."""
        rng = np.random.default_rng(9)
        parts = [rng.uniform(1, 200, 2000) for _ in range(3)]
        def build(i):
            return self._build(parts[i], num_buckets=8)
        m1 = build(0).merge(build(1)).merge(build(2))
        m2 = build(2).merge(build(0)).merge(build(1))
        assert m1.keys == m2.keys
        assert m1.freqs == m2.freqs
        assert m1.right_most == m2.right_most

    def test_serialization_roundtrip(self):
        from condor_spark.synopsis.base import Synopsis
        rng = np.random.default_rng(1)
        h = self._build(rng.uniform(1, 10, 3000), num_buckets=6)
        h2 = Synopsis.from_bytes(h.to_bytes())
        assert h2.keys == h.keys and h2.freqs == h.freqs
        assert h2.total == h.total and h2.threshold == h.threshold


def test_splitmerge_dd_rejects_nonpositive():
    """The DDSketch backer bins only v > 0 — zero/negative inputs would
    silently corrupt split-boundary medians, so update_batch raises."""
    import pytest

    from condor_spark.synopsis.histograms import SplitMergeDDHistogram

    h = SplitMergeDDHistogram(num_buckets=8, relative_accuracy=0.01)
    with pytest.raises(ValueError, match="strictly positive"):
        h.update_batch(np.array([3.0, 0.0, 5.0]))
    with pytest.raises(ValueError, match="strictly positive"):
        h.update_batch(np.array([-1.0]))
    h.update_batch(np.array([1.0, 2.0, float("nan")]))  # NaN still skipped
    assert h.n_processed == 2
