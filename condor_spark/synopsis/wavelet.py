"""Haar wavelet synopsis — the one non-mergeable (order-based) synopsis.

Capability parity with ``core/.../Wavelets/WaveletSynopsis.java`` (ctor 34-45
``(size)`` coefficient budget; point query 76-119; range-sum query 128-194;
padding 200-256; per-pair climb-up 266-347; discard of minimum-error
coefficients 352-411). Re-derived from the standard Haar error-tree algorithm
(bottom-up averages/details, hard thresholding by L2-normalized magnitude)
rather than transliterating the reference's sibling-tree pointer code —
validated the way the reference validates itself, against exact prefix sums
(``benchmark/.../reliablility/HaarWaveletsAccuracy.java:69-84``).

Distribution model mirrors the reference's managers
(``Wavelets/SliceWaveletsManager.java:40-49,78-98``): the stream is split
into contiguous ordered slices, one wavelet per slice, and a manager indexes
queries into the right slice by element offset — slices are *concatenated*,
never merged (``NonMergeableSynopsisManager.java:5-35``).
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register


@register
class WaveletSynopsis(Synopsis):
    KIND = "wavelet"
    TRAIT = Trait.NON_MERGEABLE

    def __init__(self, size: int = 256):
        super().__init__(size=int(size))
        self.size = int(size)
        self._buffer: list[np.ndarray] = []  # pre-finalize value chunks (in order)
        self.n = 0                  # true (unpadded) element count
        self.n_pad = 0              # padded length (power of two)
        self.c0 = 0.0               # overall average of the padded array
        self.coef_idx = np.empty(0, dtype=np.int64)   # error-tree indices (1-based)
        self.coef_val = np.empty(0, dtype=np.float64)
        self.finalized = False
        self.n_processed = 0

    def _state(self) -> dict:
        return {"_buffer": self._buffer, "n": self.n, "n_pad": self.n_pad,
                "c0": self.c0, "coef_idx": self.coef_idx, "coef_val": self.coef_val,
                "finalized": self.finalized, "n_processed": self.n_processed}

    def update_batch(self, values, ts=None) -> None:
        if self.finalized:
            raise RuntimeError("wavelet already finalized")
        x = np.asarray(values, dtype=np.float64)
        self._buffer.append(x)
        self.n += int(x.size)
        self.n_processed += int(x.size)

    def finalize(self) -> "WaveletSynopsis":
        """Build the error tree and keep the ``size`` largest normalized
        coefficients. Vectorized bottom-up Haar transform."""
        if self.finalized:
            return self
        data = (np.concatenate(self._buffer) if self._buffer
                else np.zeros(0, dtype=np.float64))
        self._buffer = []
        n = data.size
        n_pad = 1 if n == 0 else 1 << int(np.ceil(np.log2(max(1, n))))
        if n_pad > n:  # zero-padding roots the tree (WaveletSynopsis.java:200-256)
            data = np.concatenate([data, np.zeros(n_pad - n)])
        self.n_pad = n_pad
        # error tree: index 1..n_pad-1 are details; averages climb up.
        # detail at tree index k reconstructs: +d for left subtree, -d for right.
        details = np.zeros(n_pad, dtype=np.float64)  # [0] unused, [1..n_pad-1]
        level = data
        idx_base = n_pad
        while level.size > 1:
            idx_base //= 2
            avg = (level[0::2] + level[1::2]) / 2.0
            det = (level[0::2] - level[1::2]) / 2.0
            details[idx_base: idx_base + det.size] = det
            level = avg
        self.c0 = float(level[0]) if level.size else 0.0
        # L2-normalized magnitude: ||basis_k||^2 = leaves(k) (= n_pad / 2^level)
        k = np.arange(1, n_pad, dtype=np.int64)
        if k.size:
            leaves = n_pad // (1 << np.floor(np.log2(k)).astype(np.int64))
            weight = details[1:] ** 2 * leaves
            budget = min(self.size, k.size)
            keep = np.argpartition(-weight, budget - 1)[:budget] if budget < k.size \
                else np.arange(k.size)
            keep = keep[np.abs(details[1:][keep]) > 0]
            self.coef_idx = k[keep]
            self.coef_val = details[1:][keep]
        self.finalized = True
        return self

    # --- queries (on finalized synopsis) -----------------------------------
    def point_query(self, i: int) -> float:
        """Reconstruct element i (WaveletSynopsis.java:76-119)."""
        coeffs = dict(zip(self.coef_idx.tolist(), self.coef_val.tolist()))
        val = self.c0
        node = 1
        lo, hi = 0, self.n_pad  # current subtree range [lo, hi)
        while hi - lo > 1:
            d = coeffs.get(node, 0.0)
            mid = (lo + hi) // 2
            if i < mid:
                val += d
                hi = mid
                node = 2 * node
            else:
                val -= d
                lo = mid
                node = 2 * node + 1
        return float(val)

    def range_sum_query(self, lo: int, hi: int) -> float:
        """Sum of elements in [lo, hi) (WaveletSynopsis.java:128-194).

        O(kept coefficients): each kept detail contributes
        d * (|range ∩ left-half| − |range ∩ right-half|).
        """
        hi = min(hi, self.n_pad)
        lo = max(lo, 0)
        if hi <= lo:
            return 0.0
        total = self.c0 * (hi - lo)
        if self.coef_idx.size == 0:
            return float(total)
        k = self.coef_idx
        lvl = np.floor(np.log2(k)).astype(np.int64)
        span = self.n_pad >> lvl          # subtree width
        start = (k - (1 << lvl)) * span    # subtree start
        mid = start + span // 2
        left = np.clip(np.minimum(hi, mid) - np.maximum(lo, start), 0, None)
        right = np.clip(np.minimum(hi, start + span) - np.maximum(lo, mid), 0, None)
        total += float((self.coef_val * (left - right)).sum())
        return float(total)


class SliceWaveletsManager:
    """Contiguous-slice manager (SliceWaveletsManager.java:40-49,78-98).

    Holds (offset, length, wavelet) triples sorted by offset; queries route by
    global element index. 'Unify' = concatenation, never merge.
    """

    def __init__(self, slices: list[tuple[int, int, WaveletSynopsis]]):
        self.slices = sorted(slices, key=lambda t: t[0])
        self.offsets = np.array([s[0] for s in self.slices], dtype=np.int64)

    @property
    def n(self) -> int:
        return int(sum(s[1] for s in self.slices))

    def point_query(self, i: int) -> float:
        j = int(np.searchsorted(self.offsets, i, side="right")) - 1
        off, ln, syn = self.slices[j]
        return syn.point_query(i - off)

    def range_sum_query(self, lo: int, hi: int) -> float:
        total = 0.0
        for off, ln, syn in self.slices:
            s_lo, s_hi = max(lo, off), min(hi, off + ln)
            if s_hi > s_lo:
                total += syn.range_sum_query(s_lo - off, s_hi - off)
        return total


class DistributedSliceWaveletsManager:
    """Combined manager (``Wavelets/DistributedSliceWaveletsManager.java``):
    the stream is cut into consecutive SLICES, and each slice is itself a
    round-robin :class:`DistributedWaveletsManager` over P wavelets — the
    layout a parallel build over an ordered stream produces when slices roll
    over time while every slice's elements interleave across P builders.

    Routing composes the two managers' arithmetic: global index i → the
    slice whose [offset, offset+length) contains i, then i − offset
    round-robins inside that slice. 'Unify' remains concatenation at the
    slice level and side-by-side placement within a slice — wavelets are
    never merged.
    """

    def __init__(self, slices: list[tuple[int, int, "DistributedWaveletsManager"]]):
        self.slices = sorted(slices, key=lambda t: t[0])
        self.offsets = np.array([s[0] for s in self.slices], dtype=np.int64)

    @property
    def n(self) -> int:
        return int(sum(s[1] for s in self.slices))

    def point_query(self, i: int) -> float:
        j = int(np.searchsorted(self.offsets, i, side="right")) - 1
        off, _ln, mgr = self.slices[j]
        return mgr.point_query(i - off)

    def range_sum_query(self, lo: int, hi: int) -> float:
        total = 0.0
        for off, ln, mgr in self.slices:
            s_lo, s_hi = max(lo, off), min(hi, off + ln)
            if s_hi > s_lo:
                total += mgr.range_sum_query(s_lo - off, s_hi - off)
        return total


class DistributedWaveletsManager:
    """Round-robin-interleave manager (DistributedWaveletsManager.java:21-29,
    42-76): element with global order-index i lives in wavelet i % P at local
    index i // P. 'Unify' = keep the P wavelets side by side; queries do the
    index arithmetic.

    Contrast with :class:`SliceWaveletsManager` (contiguous slices): round-
    robin spreads any query range across ALL partitions, so per-wavelet
    ranges stay short and the per-wavelet coefficient budget is used evenly —
    the reference's choice for parallel builds over an ordered stream.
    """

    def __init__(self, parallelism: int, wavelets: list["WaveletSynopsis"]):
        if len(wavelets) != parallelism:
            raise ValueError("need exactly one wavelet per partition")
        self.parallelism = int(parallelism)
        self.wavelets = wavelets

    @property
    def n(self) -> int:
        return int(sum(getattr(w, "n_processed", 0) for w in self.wavelets))

    def point_query(self, i: int) -> float:
        p = i % self.parallelism
        return self.wavelets[p].point_query(i // self.parallelism)

    def range_sum_query(self, lo: int, hi: int) -> float:
        """Sum of elements with global index in [lo, hi): each partition p
        holds the arithmetic progression p, p+P, p+2P, … — a contiguous LOCAL
        range [ceil((lo-p)/P), floor((hi-1-p)/P)] (java :58-76)."""
        total = 0.0
        P = self.parallelism
        for p, syn in enumerate(self.wavelets):
            j_lo = -((lo - p) // -P)          # ceil div
            j_hi = (hi - 1 - p) // P          # floor div
            if j_hi >= j_lo:
                total += syn.range_sum_query(j_lo, j_hi + 1)
        return total
