"""DDSketch — invertible relative-error quantile synopsis.

Capability parity with ``core/.../Sketches/DDSketch.java`` (ctor 47-61
``(relative_accuracy, max_num_bins)``; log-gamma bucket index 126-129 and
representative value 137-139; lowest-bins collapse beyond ``max_num_bins``
110-116; ``getValueAtQuantile`` 198-239 rank walk; merge 325-346; invert
246-293 — NOTE the reference's invert zeroes ``globalCount`` (bug at
256-282); ours keeps counts consistent, with the quirk documented).

Kernel conventions (also mirrored exactly by the DuckDB oracle SQL in
``__spark_entry__.py`` so estimates value-match):
  * gamma = (1 + a) / (1 - a)
  * bucket index  i = ceil(log(x) / log(gamma)) for x > 0
  * representative(i) = 2 * gamma^i / (gamma + 1)
  * quantile rank (q in (0,1]) = ceil(q * n); value = representative of the
    first bucket whose cumulative count reaches the rank.
  * non-positive values are counted in a dedicated underflow bucket whose
    representative is 0.0 (the reference requires positive inputs).

Vectorized: bucket indices for a whole batch via ``np.ceil(log)`` and
``np.unique`` aggregation — no per-row Python.
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register


@register
class DDSketch(Synopsis):
    KIND = "ddsketch"
    TRAIT = Trait.INVERTIBLE

    def __init__(self, relative_accuracy: float = 0.01, max_num_bins: int = 2048):
        if not (0 < relative_accuracy < 1):
            raise ValueError("relative_accuracy must be in (0,1)")
        super().__init__(relative_accuracy=float(relative_accuracy),
                         max_num_bins=int(max_num_bins))
        self.relative_accuracy = float(relative_accuracy)
        self.max_num_bins = int(max_num_bins)
        self.gamma = (1.0 + relative_accuracy) / (1.0 - relative_accuracy)
        self._log_gamma = np.log(self.gamma)
        self.keys = np.empty(0, dtype=np.int64)     # sorted bucket indices
        self.bin_counts = np.empty(0, dtype=np.int64)
        self.zero_count = 0                          # x <= 0 underflow bucket
        self.n_processed = 0
        self.collapsed = False

    def _state(self) -> dict:
        return {"keys": self.keys, "bin_counts": self.bin_counts,
                "zero_count": self.zero_count, "n_processed": self.n_processed,
                "collapsed": self.collapsed}

    def _load_state(self, state: dict) -> None:
        self.__dict__.update(state)
        self.gamma = (1.0 + self.relative_accuracy) / (1.0 - self.relative_accuracy)
        self._log_gamma = np.log(self.gamma)

    def bucket_index(self, x: np.ndarray) -> np.ndarray:
        return np.ceil(np.log(x) / self._log_gamma).astype(np.int64)

    def representative(self, idx: np.ndarray | int) -> np.ndarray | float:
        return 2.0 * np.power(self.gamma, idx) / (self.gamma + 1.0)

    def _add_bins(self, keys: np.ndarray, counts: np.ndarray) -> None:
        if keys.size == 0:
            return
        merged_keys = np.concatenate([self.keys, keys])
        merged_counts = np.concatenate([self.bin_counts, counts])
        uniq, inv = np.unique(merged_keys, return_inverse=True)
        agg = np.zeros(uniq.shape[0], dtype=np.int64)
        np.add.at(agg, inv, merged_counts)
        live = agg != 0
        self.keys, self.bin_counts = uniq[live], agg[live]
        self._collapse()

    def _collapse(self) -> None:
        """Collapse lowest bins into one when over max_num_bins (DDSketch.java:110-116)."""
        over = self.keys.shape[0] - self.max_num_bins
        if over <= 0:
            return
        spill = int(self.bin_counts[: over + 1].sum())
        self.keys = self.keys[over:].copy()
        self.bin_counts = self.bin_counts[over:].copy()
        self.bin_counts[0] = spill
        self.collapsed = True

    def update_batch(self, values, ts=None) -> None:
        x = np.asarray(values, dtype=np.float64)
        x = x[~np.isnan(x)]
        pos = x[x > 0]
        self.zero_count += int((x <= 0).sum())
        if pos.size:
            idx = self.bucket_index(pos)
            uniq, cnt = np.unique(idx, return_counts=True)
            self._add_bins(uniq, cnt.astype(np.int64))
        self.n_processed += int(x.size)

    # ---- whole-batch fast path (builder._partial_builder) -----------------
    def precompute(self, values):
        x = np.asarray(values, dtype=np.float64)
        nan = np.isnan(x)
        pos = x > 0  # False for NaN
        idx = np.zeros(x.shape[0], dtype=np.int64)
        if pos.any():
            idx[pos] = self.bucket_index(x[pos])
        return idx, pos, nan

    def update_precomputed(self, pre, lo: int, hi: int) -> None:
        idx, pos, nan = pre
        p = pos[lo:hi]
        if p.any():
            uniq, cnt = np.unique(idx[lo:hi][p], return_counts=True)
            self._add_bins(uniq, cnt.astype(np.int64))
        self.zero_count += int((~p & ~nan[lo:hi]).sum())
        self.n_processed += int((hi - lo) - nan[lo:hi].sum())

    def quantile(self, q: float) -> float:
        """Value at quantile q using rank = ceil(q*n) (see module docstring)."""
        n = self.n_processed
        if n == 0:
            return float("nan")
        rank = max(1, int(np.ceil(q * n)))
        if rank <= self.zero_count:
            return 0.0
        cum = self.zero_count + np.cumsum(self.bin_counts)
        pos = int(np.searchsorted(cum, rank, side="left"))
        pos = min(pos, self.keys.shape[0] - 1)
        return float(self.representative(int(self.keys[pos])))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs], dtype=np.float64)

    def equidepth_bounds(self, num_buckets: int) -> np.ndarray:
        """Equi-depth histogram boundaries as the quantiles at i/B — the
        DDSketch-backed equi-depth variant the reference ships as
        ``SplitAndMergeWithDDSketch`` (core/.../Histograms/
        SplitAndMergeWithDDSketch.java:15-37); fully mergeable and
        partition-parallel here, unlike the reference's parallelism-1
        recommendation."""
        # i/B by correctly-rounded IEEE division — the exact doubles an
        # oracle's `i / B.0` reproduces (linspace's `i*step` rounds
        # differently at e.g. 3/10 and can shift ceil(q*n) by one rank);
        # rank is clamped >= 1 inside quantile(), covering q=0
        qs = np.arange(num_buckets + 1, dtype=np.float64) / num_buckets
        return self.quantiles(qs)

    def merge(self, other: "DDSketch") -> "DDSketch":
        self._check_same(other)
        self._add_bins(other.keys, other.bin_counts)
        self.zero_count += other.zero_count
        self.n_processed += other.n_processed
        return self

    def invert(self, other: "DDSketch") -> "DDSketch":
        # corrected semantics: subtract bin counts and keep global count
        # consistent (the reference zeroes globalCount — DDSketch.java:256-282)
        self._check_same(other)
        self._add_bins(other.keys, -other.bin_counts)
        self.zero_count -= other.zero_count
        self.n_processed -= other.n_processed
        return self
