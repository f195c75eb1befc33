"""HyperLogLog — commutative distinct-count synopsis.

Capability parity with ``core/.../Sketches/HyperLogLogSketch.java`` (ctor
38-44 ``(logRegNum in [4,16], seed)``; update 51-68 — 64-bit hash, register
index from the top ``logRegNum`` bits, rank = trailing-zeros(hash)+1; merge
74-90 register-wise max; estimator 115-146 — harmonic mean with the alpha
table, linear-counting fallback when rawEstimate < 2.5*m and zero registers
exist). Accuracy bound asserted by the reference's test: relative error
~ 1.04/sqrt(m) (``core/.../tests/HyperLogLogSketchTest.java:125-158``).
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .hashing import hash64, strings_to_ints


@register
class HyperLogLog(Synopsis):
    KIND = "hll"
    TRAIT = Trait.COMMUTATIVE

    def __init__(self, log_reg_num: int = 12, seed: int = 7):
        if not (4 <= int(log_reg_num) <= 16):
            raise ValueError("log_reg_num must be in [4, 16]")
        super().__init__(log_reg_num=int(log_reg_num), seed=int(seed))
        self.log_reg_num = int(log_reg_num)
        self.seed = int(seed)
        self.m = 1 << self.log_reg_num
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.n_processed = 0

    def _state(self) -> dict:
        return {"registers": self.registers, "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.registers = state["registers"]
        self.n_processed = int(state["n_processed"])

    def update_batch(self, values, ts=None) -> None:
        x = strings_to_ints(values)
        h = hash64(x, self.seed)  # uint64 (n,)
        idx = (h >> np.uint64(64 - self.log_reg_num)).astype(np.int64)
        # rank = trailing zeros + 1, as in the reference (update :63-66)
        low = h & np.uint64((1 << (64 - self.log_reg_num)) - 1)
        # trailing zeros via isolating lowest set bit; cap at 64-log_reg_num
        tz = np.where(
            low == 0,
            np.uint64(64 - self.log_reg_num),
            np.log2((low & (~low + np.uint64(1))).astype(np.float64)).astype(np.uint64),
        )
        rank = (tz + np.uint64(1)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        self.n_processed += x.shape[0]

    # ---- whole-batch fast path (builder._partial_builder) -----------------
    def precompute(self, values):
        x = strings_to_ints(values)
        h = hash64(x, self.seed)
        idx = (h >> np.uint64(64 - self.log_reg_num)).astype(np.int64)
        low = h & np.uint64((1 << (64 - self.log_reg_num)) - 1)
        tz = np.where(
            low == 0,
            np.uint64(64 - self.log_reg_num),
            np.log2((low & (~low + np.uint64(1))).astype(np.float64)).astype(np.uint64),
        )
        return idx, (tz + np.uint64(1)).astype(np.uint8)

    def update_precomputed(self, pre, lo: int, hi: int) -> None:
        idx, rank = pre
        np.maximum.at(self.registers, idx[lo:hi], rank[lo:hi])
        self.n_processed += hi - lo

    def estimate(self) -> int:
        m = self.m
        if self.log_reg_num == 4:
            alpha = 0.673
        elif self.log_reg_num == 5:
            alpha = 0.697
        elif self.log_reg_num == 6:
            alpha = 0.709
        else:
            alpha = 0.7213 / (1 + 1.079 / m)
        raw = 1.0 / np.power(2.0, -self.registers.astype(np.float64)).sum()
        raw = raw * alpha * m * m
        zero_regs = int((self.registers == 0).sum())
        if zero_regs > 0 and raw < 2.5 * m:
            return int(round(m * np.log(m / float(zero_regs))))
        return int(round(raw))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self._check_same(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        self.n_processed += other.n_processed
        return self
