"""Bloom filter — commutative membership synopsis.

Capability parity with ``core/.../Sketches/BloomFilter.java`` (ctor derives
``k = round(ln2 * nBits / maxElems)`` hash functions :38-45; update 54-70;
query 72-86; merge 116-134). Reference quirk reproduced behind a flag: its
``merge`` uses ``hashmap.and(...)`` — set *intersection*, not union
(``BloomFilter.java:121``). ``merge_mode='intersect'`` (default, reference
behavior) vs ``'union'`` (textbook behavior).

False-positive bound asserted by the reference's test:
``fp_rate <= (1 - e^{-kn/m})^k`` (``core/.../tests/BloomFilterTest.java:32-56``).
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .hashing import H3Family, strings_to_ints


@register
class BloomFilter(Synopsis):
    KIND = "bloom"
    TRAIT = Trait.COMMUTATIVE

    def __init__(self, n_bits: int = 4096, max_elements: int = 256, seed: int = 7,
                 merge_mode: str = "intersect"):
        super().__init__(n_bits=int(n_bits), max_elements=int(max_elements),
                         seed=int(seed), merge_mode=merge_mode)
        self.n_bits = int(n_bits)
        self.max_elements = int(max_elements)
        self.seed = int(seed)
        self.merge_mode = merge_mode
        self.k = max(1, round(np.log(2) * self.n_bits / self.max_elements))
        self.bits = np.zeros(self.n_bits, dtype=bool)
        self.n_processed = 0
        self._h3 = H3Family(self.k, self.seed)

    def _state(self) -> dict:
        return {"bits": np.packbits(self.bits), "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.bits = np.unpackbits(state["bits"])[: self.n_bits].astype(bool)
        self.n_processed = int(state["n_processed"])

    def _positions(self, values) -> np.ndarray:
        x = strings_to_ints(values)
        return self._h3.hash(x) % self.n_bits  # (k, n)

    def update_batch(self, values, ts=None) -> None:
        pos = self._positions(values)
        self.bits[pos.ravel()] = True
        self.n_processed += pos.shape[1]

    def query(self, values) -> np.ndarray:
        """Membership for a batch of keys → bool (n,). No false negatives."""
        pos = self._positions(values)
        return self.bits[pos].all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._check_same(other)
        if self.merge_mode == "union":
            self.bits |= other.bits
        else:  # reference behavior: intersection (BloomFilter.java:121)
            self.bits &= other.bits
        self.n_processed += other.n_processed
        return self

    def fp_bound(self, n_inserted: int | None = None) -> float:
        n = self.n_processed if n_inserted is None else n_inserted
        return float((1 - np.exp(-self.k * n / self.n_bits)) ** self.k)
