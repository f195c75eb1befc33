"""Misra-Gries heavy-hitters kernel laws.

Covers both regimes the module docstring promises:
  * OVERSIZED (capacity >= distinct): the summary IS the exact count table,
    byte-identical across any partitioning / merge order — the regime the
    driver oracles run in.
  * UNDERSIZED: the Agarwal et al. (PODS 2012) merge guarantee — for every
    key, f(x) - n/(capacity+1) <= est(x) <= f(x); every key with
    f(x) > n/(capacity+1) is present; `deficit` is a valid per-key bound
    and never exceeds n/(capacity+1).
"""

import collections

import numpy as np
import pytest

from condor_spark.synopsis.base import Synopsis, make


def _zipf_batch(rng, n, a=1.5, n_keys=5000):
    return rng.zipf(a, size=n).clip(max=n_keys).astype(np.int64)


def _exact(values) -> dict:
    return collections.Counter(list(values))


def test_oversized_is_exact_counts():
    rng = np.random.default_rng(7)
    vals = _zipf_batch(rng, 20_000)
    syn = make("mg", capacity=len(set(vals.tolist())) + 10)
    syn.update_batch(vals)
    truth = _exact(vals)
    assert syn.deficit == 0
    assert len(syn.keys) == len(truth)
    for k, c in truth.items():
        assert syn.estimate(k) == c


def test_oversized_partition_invariance_byte_equal():
    rng = np.random.default_rng(11)
    vals = _zipf_batch(rng, 30_000)
    cap = len(set(vals.tolist())) + 1
    whole = make("mg", capacity=cap)
    whole.update_batch(vals)
    for n_parts in (2, 7, 16):
        parts = np.array_split(vals, n_parts)
        partials = []
        for p in parts:
            s = make("mg", capacity=cap)
            s.update_batch(p)
            partials.append(s)
        # right-fold in a shuffled order: merge must be order-insensitive
        rng.shuffle(partials)
        merged = partials[0]
        for s in partials[1:]:
            merged = merged.merge(s)
        assert merged.to_bytes() == whole.to_bytes()


def test_string_keys_exact_and_topk_order():
    words = ["spark", "flink", "spark", "duck", "spark", "duck", "arrow"]
    syn = make("mg", capacity=16)
    syn.update_batch(np.asarray(words, dtype=object))
    assert syn.estimate("spark") == 3
    keys, cnts = syn.topk(3)
    # order (-count, key): duck ties nobody; arrow vs flink tie at 1 -> asc
    assert list(keys) == ["spark", "duck", "arrow"]
    assert list(cnts) == [3, 2, 1]
    kk, cc = syn.heavy_hitters(min_count=2)
    assert list(kk) == ["spark", "duck"]


def test_undersized_deficit_and_bounds():
    rng = np.random.default_rng(13)
    vals = _zipf_batch(rng, 100_000)
    truth = _exact(vals)
    for cap in (8, 64, 256):
        partials = []
        for p in np.array_split(vals, 10):
            s = make("mg", capacity=cap)
            s.update_batch(p)
            partials.append(s)
        merged = partials[0]
        for s in partials[1:]:
            merged = merged.merge(s)
        n = merged.n_processed
        assert n == len(vals)
        bound = n / (cap + 1)
        assert merged.deficit <= bound + 1e-9
        assert len(merged.keys) <= cap
        for k, c in truth.items():
            est = merged.estimate(k)
            assert est <= c, f"over-estimate at cap={cap} key={k}"
            assert c - est <= merged.deficit, f"deficit bound broken cap={cap}"
            if c > bound:  # no false negatives above the threshold
                assert est > 0, f"heavy key {k} (f={c}) missing at cap={cap}"


def test_undersized_merge_order_keeps_guarantee():
    """Counter values may differ by merge order in the undersized regime —
    the guarantee must not."""
    rng = np.random.default_rng(17)
    vals = _zipf_batch(rng, 50_000)
    truth = _exact(vals)
    cap = 32
    for perm_seed in (0, 1, 2):
        order = np.random.default_rng(perm_seed).permutation(8)
        partials = []
        for p in np.array_split(vals, 8):
            s = make("mg", capacity=cap)
            s.update_batch(p)
            partials.append(s)
        merged = partials[order[0]]
        for i in order[1:]:
            merged = merged.merge(partials[int(i)])
        bound = merged.n_processed / (cap + 1)
        assert merged.deficit <= bound + 1e-9
        for k, c in truth.items():
            assert merged.estimate(k) <= c
            assert c - merged.estimate(k) <= merged.deficit


def test_serde_roundtrip_and_merge_guard():
    syn = make("mg", capacity=4)
    syn.update_batch(np.asarray([1, 1, 2, 3, 4, 5, 5, 5], dtype=np.int64))
    back = Synopsis.from_bytes(syn.to_bytes())
    assert back.to_bytes() == syn.to_bytes()
    other = make("mg", capacity=8)
    with pytest.raises(ValueError):
        syn.merge(other)


def test_empty_and_single():
    syn = make("mg", capacity=4)
    syn.update_batch(np.empty(0, dtype=np.int64))
    assert syn.n_processed == 0 and len(syn.keys) == 0
    syn.update_batch(np.asarray([42], dtype=np.int64))
    assert syn.estimate(42) == 1
    k, c = syn.heavy_hitters(min_count=1)
    assert list(k) == [42] and list(c) == [1]


def test_query_batch_matches_estimate():
    rng = np.random.default_rng(23)
    vals = _zipf_batch(rng, 5000)
    syn = make("mg", capacity=16)
    syn.update_batch(vals)
    probe = np.concatenate([vals[:50], np.asarray([10**9, -5], dtype=np.int64)])
    got = syn.query(probe)
    assert got.tolist() == [syn.estimate(int(k)) for k in probe]
    # string-key summaries answer string batches
    s = make("mg", capacity=8)
    s.update_batch(np.asarray(["a", "b", "a"], dtype=object))
    assert s.query(np.asarray(["a", "zz"], dtype=object)).tolist() == [2, 0]
    assert s.query(np.asarray([], dtype=object)).tolist() == []


def test_mixed_key_dtypes_fail_loudly():
    a = make("mg", capacity=8)
    a.update_batch(np.asarray([1, 2], dtype=np.int64))
    with pytest.raises(TypeError, match="mix integer and string"):
        a.update_batch(np.asarray(["x"], dtype=object))
    b = make("mg", capacity=8)
    b.update_batch(np.asarray(["x"], dtype=object))
    with pytest.raises(TypeError, match="mix integer and string"):
        a.merge(b)
