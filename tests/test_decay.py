"""Exponentially time-decayed counts — kernel laws (synopsis/decay.py).

Float state, so cross-partitioning equality is asserted to 1e-12 relative
(the module's documented ~1e-15 noise), never at the byte level.
"""

import numpy as np
import pytest

from condor_spark.synopsis.base import make

HOUR = 3_600_000_000  # µs


def _direct(keys, ts, hl_us):
    """Ground truth: single-pass decayed weights as of max(ts)."""
    tr = max(ts)
    out = {}
    for k, t in zip(keys, ts):
        out[k] = out.get(k, 0.0) + 0.5 ** ((tr - t) / hl_us)
    return tr, out


def test_weights_match_direct_sum():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=2000).astype(np.int64)
    ts = rng.integers(0, 24 * HOUR, size=2000).astype(np.int64)
    syn = make("decay", half_life="1 hour", capacity=128)
    syn.update_batch(keys, ts=ts)
    tr, truth = _direct(keys, ts, HOUR)
    assert syn.t_ref == tr and syn.deficit == 0.0
    for k, w in truth.items():
        assert syn.estimate(int(k)) == pytest.approx(w, rel=1e-12)


def test_partition_and_merge_order_invariance():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 80, size=5000).astype(np.int64)
    ts = np.sort(rng.integers(0, 48 * HOUR, size=5000)).astype(np.int64)
    tr, truth = _direct(keys, ts, HOUR)
    for n_parts, perm in ((2, 0), (8, 1), (16, 2)):
        partials = []
        for kp, tp in zip(np.array_split(keys, n_parts),
                          np.array_split(ts, n_parts)):
            s = make("decay", half_life="1 hour", capacity=256)
            s.update_batch(kp, ts=tp)
            partials.append(s)
        order = np.random.default_rng(perm).permutation(n_parts)
        merged = partials[order[0]]
        for i in order[1:]:
            merged = merged.merge(partials[int(i)])
        assert merged.t_ref == tr
        for k, w in truth.items():
            assert merged.estimate(int(k)) == pytest.approx(w, rel=1e-12)


def test_halving_and_recency():
    """A key idle for exactly one half-life carries half its weight; a
    fresh event always outweighs an equally-counted stale one."""
    syn = make("decay", half_life="1 hour", capacity=16)
    syn.update_batch(np.asarray([1], dtype=np.int64),
                     ts=np.asarray([0], dtype=np.int64))
    syn.update_batch(np.asarray([2], dtype=np.int64),
                     ts=np.asarray([HOUR], dtype=np.int64))
    assert syn.estimate(1) == pytest.approx(0.5)
    assert syn.estimate(2) == pytest.approx(1.0)
    k, w = syn.topk(2)
    assert list(k) == [2, 1]


def test_capacity_trim_keeps_lower_bound():
    rng = np.random.default_rng(13)
    keys = rng.zipf(1.5, size=20000).clip(max=1000).astype(np.int64)
    ts = np.sort(rng.integers(0, 12 * HOUR, size=20000)).astype(np.int64)
    tr, truth = _direct(keys, ts, HOUR)
    syn = make("decay", half_life="1 hour", capacity=32)
    for kp, tp in zip(np.array_split(keys, 10), np.array_split(ts, 10)):
        syn.update_batch(kp, ts=tp)
    assert len(syn.keys) <= 32 and syn.deficit > 0
    for k, w in truth.items():
        est = syn.estimate(int(k))
        assert est <= w + 1e-9                     # lower bound
        assert w - est <= syn.deficit + 1e-9      # deficit bound


def test_requires_ts_and_guards():
    syn = make("decay", half_life="1 hour", capacity=4)
    with pytest.raises(ValueError, match="timestamps"):
        syn.update_batch(np.asarray([1], dtype=np.int64))
    with pytest.raises(ValueError):
        make("decay", half_life="0 seconds", capacity=4)
    other = make("decay", half_life="2 hours", capacity=4)
    syn.update_batch(np.asarray([1], dtype=np.int64),
                     ts=np.asarray([0], dtype=np.int64))
    with pytest.raises(ValueError):
        syn.merge(other)


def test_out_of_order_update_batches_match_merge():
    """ADVICE r3 (high): a later update_batch carrying an OLDER batch-max
    timestamp must enter pre-decayed to the summary's t_ref — batches are
    not guaranteed ts-ascending (builder partials absorb Arrow batches in
    partition order). Regression: update([1]@1h) then update([2]@0) must
    equal the merge path and the direct sum (estimate(2) == 0.5)."""
    a = make("decay", half_life="1 hour", capacity=16)
    a.update_batch(np.asarray([1], dtype=np.int64),
                   ts=np.asarray([HOUR], dtype=np.int64))
    a.update_batch(np.asarray([2], dtype=np.int64),
                   ts=np.asarray([0], dtype=np.int64))
    assert a.t_ref == HOUR
    assert a.estimate(1) == pytest.approx(1.0)
    assert a.estimate(2) == pytest.approx(0.5)

    # full shuffle: many batches in decreasing/random time order must match
    # the single-pass direct sum
    rng = np.random.default_rng(23)
    keys = rng.integers(0, 60, size=4000).astype(np.int64)
    ts = rng.integers(0, 24 * HOUR, size=4000).astype(np.int64)
    tr, truth = _direct(keys, ts, HOUR)
    order = np.argsort(-ts, kind="stable")  # strictly time-DESCENDING
    syn = make("decay", half_life="1 hour", capacity=256)
    for kp, tp in zip(np.array_split(keys[order], 7),
                      np.array_split(ts[order], 7)):
        syn.update_batch(kp, ts=tp)
    assert syn.t_ref == tr
    for k, w in truth.items():
        assert syn.estimate(int(k)) == pytest.approx(w, rel=1e-12)


def test_serde_canonical_bytes():
    """ADVICE r3 (low): to_bytes() must be identical before and after a
    from_bytes round-trip (t_ref stored as plain int, not np.int64)."""
    syn = make("decay", half_life="1 hour", capacity=16)
    syn.update_batch(np.asarray([1, 2, 2], dtype=np.int64),
                     ts=np.asarray([0, HOUR, 2 * HOUR], dtype=np.int64))
    b1 = syn.to_bytes()
    syn2 = type(syn).from_bytes(b1)
    assert syn2.to_bytes() == b1
    assert syn2.estimate(2) == pytest.approx(syn.estimate(2))
