"""KMV (k-minimum-values) distinct sketch with set operations.

An EXTENSION beyond the reference's twelve synopses (its distinct-count
representative is HyperLogLog, ``core/.../Sketches/HyperLogLogSketch.java``):
KMV (Bar-Yossef et al. 2002; set operations per Beyer et al., SIGMOD 2007)
keeps the k smallest distinct 64-bit hash values seen. What HLL cannot do
and KMV can is ESTIMATE SET OVERLAP between two independently-built
sketches — union size, intersection size and Jaccard — which is exactly the
train/test-contamination question a large-scale training-data pipeline asks
("how much of corpus B is already in corpus A?") without ever joining the
raw corpora.

Properties that matter here:

* **Deterministic.** The hash is the seeded splitmix64 finalizer
  (``hashing.hash64``) and "k smallest distinct values" has no RNG, so the
  sketch — and every estimate derived from it — is exactly reproducible and
  exactly replayable in SQL (the driver oracles replay the hash via the
  hi/lo HUGEINT stages and the estimator via integer floor division; see
  ``__spark_entry__._kmv_*``). Estimates are computed in EXACT integer
  arithmetic (``(k-1) * 2^64 // tau`` on Python ints) so the SQL twin is
  bit-identical, not merely close.
* **Commutative & partition-parallel.** merge = k smallest of the union of
  two min-k sets — order-insensitive, so the standard two-phase build
  applies: each partition ships one <= 8 KB blob (k uint64s), the shuffle
  is O(partitions x k), row-count-independent.
* **Error bound.** For n >> k the estimator (k-1)/h_(k) has relative
  standard error ~ 1/sqrt(k-2) (Beyer et al. 2007, Theorem 1) — asserted
  (at 4 sigma) by ``tests/test_kmv.py``.

Set-operation math (Beyer et al. 2007 §3): let L = the k smallest of
mins(A) ∪ mins(B) (a valid KMV of A ∪ B — the union's k-th smallest hash
is <= either side's k-th smallest, so both sides fully cover the region
below tau), tau = max(L), K∩ = |{v in L : v in mins(A) and v in mins(B)}|.
Then jaccard ~= K∩/|L|, |A ∪ B| ~= (k-1)/tau, and |A ∩ B| ~= jaccard x
union. When the union of the min-k sets has fewer than k values both
corpora were fully enumerated and every figure is exact.
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .hashing import hash64, strings_to_ints

_TWO64 = 1 << 64


def _kmv_estimate(mins: np.ndarray, k: int) -> int:
    """Distinct estimate from a sorted min-k array — EXACT integer math so
    the SQL oracle twin reproduces it bit-for-bit."""
    if mins.shape[0] < k:
        return int(mins.shape[0])  # fully enumerated: exact
    tau = max(int(mins[k - 1]), 1)  # hash 0 is measure-zero; guard div-by-0
    return ((k - 1) * _TWO64) // tau


@register
class KMVSketch(Synopsis):
    KIND = "kmv"
    TRAIT = Trait.COMMUTATIVE

    def __init__(self, k: int = 1024, seed: int = 7):
        if int(k) < 2:
            raise ValueError("k must be >= 2")
        super().__init__(k=int(k), seed=int(seed))
        self.k = int(k)
        self.seed = int(seed)
        self.mins = np.empty(0, dtype=np.uint64)  # sorted ascending, distinct
        self.n_processed = 0

    def _state(self) -> dict:
        return {"mins": self.mins, "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.mins = state["mins"]
        self.n_processed = int(state["n_processed"])

    # --- update -------------------------------------------------------------
    def _absorb(self, h: np.ndarray) -> None:
        if h.shape[0] == 0:
            return
        if self.mins.shape[0] == self.k:
            # saturated: only values below the current tau can enter
            h = h[h < self.mins[-1]]
            if h.shape[0] == 0:
                return
        merged = np.union1d(self.mins, h)  # sorted distinct union
        self.mins = merged[: self.k]

    def update_batch(self, values, ts=None) -> None:
        x = strings_to_ints(values)
        self._absorb(hash64(x, self.seed))
        self.n_processed += x.shape[0]

    # whole-batch fast path (builder._partial_builder): hash the whole Arrow
    # batch once; each (slice, stratum) group absorbs its contiguous view
    def precompute(self, values):
        return hash64(strings_to_ints(values), self.seed)

    def update_precomputed(self, pre, lo: int, hi: int) -> None:
        self._absorb(pre[lo:hi])
        self.n_processed += hi - lo

    # --- merge / estimates ----------------------------------------------------
    def merge(self, other: "KMVSketch") -> "KMVSketch":
        self._check_same(other)
        self._absorb(other.mins)
        self.n_processed += other.n_processed
        return self

    def estimate(self) -> int:
        """Distinct count, (k-1)/h_(k) — exact below k distinct values."""
        return _kmv_estimate(self.mins, self.k)

    def overlap(self, other: "KMVSketch") -> dict:
        """Set-operation estimates vs another sketch built with the SAME
        (k, seed): ``est_a``/``est_b`` per-corpus distinct, ``est_union``,
        ``est_intersection``, ``jaccard`` — all exact integer/ratio math
        (Beyer et al. 2007 §3; module docstring)."""
        self._check_same(other)
        a, b = self.mins, other.mins
        u = np.union1d(a, b)
        L = u[: self.k]
        k_int = int((np.isin(L, a) & np.isin(L, b)).sum())
        est_union = _kmv_estimate(u, self.k)
        if u.shape[0] < self.k:  # both corpora fully enumerated: exact
            est_inter = k_int
        else:
            est_inter = (k_int * est_union) // self.k
        l_cnt = int(L.shape[0])
        return {"est_a": _kmv_estimate(a, self.k),
                "est_b": _kmv_estimate(b, other.k),
                "est_union": est_union,
                "est_intersection": est_inter,
                "jaccard": (k_int / l_cnt) if l_cnt else 0.0}
