"""Exponentially time-decayed counts — recency-weighted heavy hitters.

An EXTENSION beyond the reference's twelve synopses, and the COUNTING twin
of its recency primitive: the reference biases *samples* toward recent
elements (``core/.../Sampling/BiasedReservoirSampler.java`` — Aggarwal
bias); this synopsis biases *counts*: each event contributes
``0.5 ** ((t_ref - ts) / half_life)`` where ``t_ref`` is the newest event
time the summary has absorbed, so a key's weight halves every
``half_life`` of inactivity. "What is hot NOW" instead of "what was
frequent overall" — the trending question a monitoring pipeline asks per
window (time-decayed counters per Cormode, Shkapenyuk, Srivastava &
Xu, "Forward decay", ICDE 2009 — exponential decay is the one decay
function that is mergeable by rescaling).

Mechanics:

* **State**: sorted keys + float64 weights + ``t_ref`` (max event-time
  seen, epoch µs). Absorbing a batch first decays the existing weights to
  the batch's newer ``t_ref`` (multiply by ``0.5 ** (dt/half_life)``),
  then adds the batch's per-key decayed weights. ``merge`` aligns both
  sides to ``max(t_ref_a, t_ref_b)`` the same way — exponential decay
  makes the rescale exact up to float rounding, so merge is commutative
  and partition-parallel like every other kind here.
* **Capacity bound**: the Misra-Gries trim generalized to weights
  (subtract the (capacity+1)-th largest weight from all, drop the
  non-positive) keeps at most ``capacity`` counters; ``deficit`` tracks
  the cumulative subtraction, so every estimate is a lower bound with
  per-key error <= deficit (<= decayed-n / (capacity+1), the weighted
  form of the Agarwal et al. bound).
* **Determinism**: no RNG. Weights are float64, and partials rescale in
  different groupings than a single-pass sum, so results agree across
  partitionings to ~1e-15 relative — NOT byte-identical (unlike the
  integer MG). The driver query therefore rounds to 6 decimals, where
  that noise cannot reach; the oracle recomputes the direct sum
  ``sum(0.5^((max_ts - ts)/half_life))`` per key in SQL.
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .mg import _combine


def _half_life_us(v) -> int:
    if isinstance(v, (int, float)):
        return int(v)
    import pandas as pd
    return int(pd.Timedelta(v).total_seconds() * 1_000_000)


@register
class DecayedCounts(Synopsis):
    KIND = "decay"
    TRAIT = Trait.COMMUTATIVE
    NEEDS_TIMESTAMPS = True

    def __init__(self, half_life="1 hour", capacity: int = 1024):
        if int(capacity) < 1:
            raise ValueError("capacity must be >= 1")
        super().__init__(half_life=half_life, capacity=int(capacity))
        self.hl_us = _half_life_us(half_life)
        if self.hl_us <= 0:
            raise ValueError("half_life must be positive")
        self.capacity = int(capacity)
        self.keys = np.empty(0, dtype=np.int64)
        self.wts = np.empty(0, dtype=np.float64)
        self.t_ref = np.int64(-(1 << 62))  # effectively -inf
        self.deficit = 0.0
        self.n_processed = 0

    def _state(self) -> dict:
        # t_ref as a plain int so to_bytes() is canonical: np.int64 pickles
        # differently before vs after a round-trip (dtype-object memoization).
        return {"keys": self.keys, "wts": self.wts, "t_ref": int(self.t_ref),
                "deficit": self.deficit, "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.keys = state["keys"]
        self.wts = state["wts"]
        self.t_ref = np.int64(state["t_ref"])
        self.deficit = float(state["deficit"])
        self.n_processed = int(state["n_processed"])

    # --- kernel -----------------------------------------------------------
    def _decay_to(self, t_new) -> None:
        if self.wts.shape[0] and t_new > self.t_ref:
            self.wts = self.wts * 0.5 ** (float(t_new - self.t_ref) / self.hl_us)
        self.t_ref = max(self.t_ref, np.int64(t_new))

    def _trim(self) -> None:
        extra = self.keys.shape[0] - self.capacity
        if extra <= 0:
            return
        d = float(np.partition(self.wts, extra - 1)[extra - 1])
        self.wts = self.wts - d
        keep = self.wts > 0
        self.keys, self.wts = self.keys[keep], self.wts[keep]
        self.deficit += d

    def update_batch(self, values, ts=None) -> None:
        if ts is None:
            raise ValueError("decay needs event timestamps (ts_column)")
        arr = np.asarray(values)
        if arr.shape[0] == 0:
            return
        if arr.dtype.kind in "iu":
            arr = arr.astype(np.int64, copy=False)
        elif arr.dtype.kind == "f":
            arr = arr.astype(np.int64)
        else:
            arr = arr.astype(str)
        tarr = np.asarray(ts).astype(np.int64)
        t_new = tarr.max()
        self._decay_to(t_new)
        # Reference weights to the summary's (already-advanced) t_ref, not
        # the batch-local max: successive update_batch calls need not arrive
        # ts-ascending (builder partials absorb Arrow batches in partition
        # order), and an older batch (t_new < t_ref) must enter pre-decayed
        # by 2^((t_ref-t_new)/hl) to keep partition-order invariance.
        w = 0.5 ** ((float(self.t_ref) - tarr.astype(np.float64)) / self.hl_us)
        u, inv = np.unique(arr, return_inverse=True)
        wsum = np.bincount(inv, weights=w)
        if (self.keys.shape[0] and
                (self.keys.dtype.kind in "iu") != (u.dtype.kind in "iu")):
            raise TypeError("cannot mix integer and string keys")
        self.keys, self.wts = _combine(self.keys, self.wts, u, wsum)
        self._trim()
        self.n_processed += arr.shape[0]

    def merge(self, other: "DecayedCounts") -> "DecayedCounts":
        self._check_same(other)
        t_new = max(self.t_ref, other.t_ref)
        self._decay_to(t_new)
        ow = other.wts
        if ow.shape[0] and t_new > other.t_ref:
            ow = ow * 0.5 ** (float(t_new - other.t_ref) / self.hl_us)
        if (self.keys.shape[0] and other.keys.shape[0] and
                (self.keys.dtype.kind in "iu") != (other.keys.dtype.kind in "iu")):
            raise TypeError("cannot mix integer and string keys")
        self.keys, self.wts = _combine(self.keys, self.wts, other.keys, ow)
        self._trim()
        self.deficit += other.deficit
        self.n_processed += other.n_processed
        return self

    # --- queries ----------------------------------------------------------
    def estimate(self, key) -> float:
        """Lower-bound decayed weight as of t_ref; 0 when trimmed/unseen."""
        i = np.searchsorted(self.keys, key)
        if i < self.keys.shape[0] and self.keys[i] == key:
            return float(self.wts[i])
        return 0.0

    def query(self, values) -> np.ndarray:
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            arr = arr.astype(np.int64, copy=False)
        elif arr.dtype.kind == "f":
            arr = arr.astype(np.int64)
        else:
            arr = arr.astype(str)
        if self.keys.shape[0] == 0 or arr.shape[0] == 0:
            return np.zeros(arr.shape[0], dtype=np.float64)
        idx = np.clip(np.searchsorted(self.keys, arr), 0,
                      self.keys.shape[0] - 1)
        return np.where(self.keys[idx] == arr, self.wts[idx], 0.0)

    def heavy_hitters(self, min_weight: float):
        """(key, weight) pairs with weight >= min_weight, (-w, key) order."""
        keep = self.wts >= float(min_weight)
        keys, wts = self.keys[keep], self.wts[keep]
        order = np.lexsort((keys, -wts))
        return keys[order], wts[order]

    def topk(self, k: int):
        order = np.lexsort((self.keys, -self.wts))[: int(k)]
        return self.keys[order], self.wts[order]
