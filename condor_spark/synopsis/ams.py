"""AMS / Fast-AGMS sketch — invertible F2 (self-join size) synopsis.

Capability parity with ``core/.../Sketches/FastAGMS.java`` (ctor 60-67
``(width, height, seed)``; signed update 93-117 — bucket via H3, sign via EH3;
merge 176-193 cellwise add; invert 131-145; F2 estimate = median over rows of
sum of squared cells; errorBound 200-202 ``F2/sqrt(width)``; errorProbability
209-211 ``1/2^height``).
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .hashing import EH3Family, H3Family, strings_to_ints


@register
class FastAGMS(Synopsis):
    KIND = "ams"
    TRAIT = Trait.INVERTIBLE

    def __init__(self, width: int = 256, height: int = 5, seed: int = 7):
        super().__init__(width=int(width), height=int(height), seed=int(seed))
        self.width = int(width)
        self.height = int(height)
        self.seed = int(seed)
        self.counts = np.zeros((self.height, self.width), dtype=np.int64)
        self.n_processed = 0
        self._h3 = H3Family(self.height, self.seed)
        self._eh3 = EH3Family(self.height, self.seed)

    def _state(self) -> dict:
        from .countmin import _pack_counts
        return {"counts": _pack_counts(self.counts),
                "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        from .countmin import _unpack_counts
        self.counts = _unpack_counts(state["counts"], (self.height, self.width))
        self.n_processed = int(state["n_processed"])

    def update_batch(self, values, ts=None) -> None:
        x = strings_to_ints(values)
        cols = self._h3.hash(x) % self.width       # (h, n)
        signs = self._eh3.signs(x).astype(np.int64)  # (h, n) ±1
        for r in range(self.height):
            np.add.at(self.counts[r], cols[r], signs[r])
        self.n_processed += x.shape[0]

    # ---- whole-batch fast path (builder._partial_builder) -----------------
    def precompute(self, values):
        x = strings_to_ints(values)
        return (self._h3.hash(x) % self.width,
                self._eh3.signs(x).astype(np.int64))

    def update_precomputed(self, pre, lo: int, hi: int) -> None:
        cols, signs = pre
        for r in range(self.height):
            np.add.at(self.counts[r], cols[r, lo:hi], signs[r, lo:hi])
        self.n_processed += hi - lo

    def estimate_f2(self) -> float:
        """Median over rows of the sum of squared counters."""
        per_row = (self.counts.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(per_row))

    def error_bound(self) -> float:
        """The reference's errorBound (FastAGMS.java:200-202) = F2/√w.

        NOTE: per-row Var(F2_hat) ≤ 2·F2²/w under 4-wise independent signs,
        so one per-row std dev is √2·F2/√w — this "bound" is 0.71σ, a
        design target, not a high-probability guarantee (the max over many
        windows exceeds it with sizeable probability even for a perfect
        kernel; EH3's XOR-zero quadruples add a further small variance
        term, see hashing.EH3Family). bench.py checks max ≤ 1σ_row."""
        return self.estimate_f2() / np.sqrt(self.width)

    def error_probability(self) -> float:
        return 1.0 / (2 ** self.height)

    def estimate_join(self, other: "FastAGMS") -> float:
        """Equi-join size |A ⋈ B| = Σ_k f_A(k)·f_B(k): median over rows of
        the inner product of two sketches built with the SAME hash family.

        The classic AGMS estimator (Alon/Gibbons/Matias/Szegedy, "Tracking
        join and self-join sizes in limited storage"); the reference exposes
        only the self-join special case (FastAGMS.estimateF2,
        core/.../Sketches/FastAGMS.java:219) — ``estimate_f2()`` ==
        ``estimate_join(self)``. Requires identical (width, height, seed);
        ``_check_same`` enforces it."""
        self._check_same(other)
        per_row = (self.counts.astype(np.float64)
                   * other.counts.astype(np.float64)).sum(axis=1)
        return float(np.median(per_row))

    def join_error_bound(self, other: "FastAGMS") -> float:
        """One per-row std dev of the join estimate: Var ≤ 2·F2_A·F2_B/w
        under 4-wise independent signs ⇒ 1σ_row = √2·√(F2_A·F2_B)/√w
        (same algebra as ``error_bound``'s note with A=B)."""
        return float(np.sqrt(2.0 * self.estimate_f2() * other.estimate_f2()
                             / self.width))

    def merge(self, other: "FastAGMS") -> "FastAGMS":
        self._check_same(other)
        self.counts += other.counts
        self.n_processed += other.n_processed
        return self

    def invert(self, other: "FastAGMS") -> "FastAGMS":
        self._check_same(other)
        self.counts -= other.counts
        self.n_processed -= other.n_processed
        return self
