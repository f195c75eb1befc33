"""Samplers: reservoir, biased reservoir, FiFo, and deterministic bottom-k.

Capability parity:
  * ``ReservoirSampler`` — ``core/.../Sampling/ReservoirSampler.java`` (ctor
    36-41 ``(sample_size)``; update 59-69 insert w.p. k/n replacing a random
    slot; weighted merge 93-140 draws from each side w.p. n1/(n1+n2) without
    replacement).
  * ``BiasedReservoirSampler`` — ``core/.../Sampling/BiasedReservoirSampler.java``
    (insert always while not full, else replace a random slot w.p.
    actual/size :57-70 — Aggarwal recency bias; merge keeps the globally
    newest by timestamp :102-140).
  * ``FiFoSampler`` — ``core/.../Sampling/FiFoSampler.java`` (keep the newest
    k elements by timestamp :42-50; merge = k newest of the union :72-97).
  * ``BottomKSampler`` — **extension** (not in the reference): a uniform
    sample as the k smallest seeded-hash priorities. Deterministic given the
    input set, commutative, and partition-count invariant — the
    distributed-friendly formulation of the reference's reservoir (same
    uniformity guarantee; classic KMV construction).

Samplers are Trait.MERGEABLE with NEEDS_TIMESTAMPS (the reference wraps
elements into ``TimestampedElement`` — ``Sampling/TimestampedElement.java:17-30``).
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .hashing import hash64


@register
class ReservoirSampler(Synopsis):
    KIND = "reservoir"
    TRAIT = Trait.COMMUTATIVE  # CommutativeSynopsis in the reference
    NEEDS_TIMESTAMPS = False
    MERGE_IGNORE_PARAMS = ("seed",)  # sample contents are hash-independent

    def __init__(self, sample_size: int = 100, seed: int = 7):
        super().__init__(sample_size=int(sample_size), seed=int(seed))
        self.sample_size = int(sample_size)
        self.seed = int(seed)
        self.sample: list = []
        self.n_processed = 0
        self._rng = np.random.default_rng(self.seed)

    def _state(self) -> dict:
        return {"sample": self.sample, "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.sample = list(state["sample"])
        self.n_processed = int(state["n_processed"])
        # reseed deterministically from progress for self-reproducibility
        self._rng = np.random.default_rng(self.seed + self.n_processed)

    def update_batch(self, values, ts=None) -> None:
        vals = np.asarray(values)
        n = vals.shape[0]
        k = self.sample_size
        c = self.n_processed
        fill = max(0, min(k - len(self.sample), n))
        if fill:
            self.sample.extend(vals[:fill].tolist())
        if n > fill:
            rest = vals[fill:]
            counts = c + fill + 1 + np.arange(rest.shape[0], dtype=np.int64)
            accept = self._rng.random(rest.shape[0]) < (k / counts)
            slots = self._rng.integers(0, k, size=int(accept.sum()))
            acc_vals = rest[accept]
            for s, v in zip(slots.tolist(), acc_vals.tolist()):
                self.sample[s] = v
        self.n_processed += n

    def merge(self, other: "ReservoirSampler") -> "ReservoirSampler":
        """Weighted merge: classic distributed reservoir combine
        (ReservoirSampler.java:93-140)."""
        self._check_same(other)
        n1, n2 = self.n_processed, other.n_processed
        a, b = list(self.sample), list(other.sample)
        if n1 + n2 == 0:
            return self
        k = self.sample_size
        out: list = []
        rng = self._rng
        while len(out) < k and (a or b):
            take_a = (a and not b) or (a and rng.random() < n1 / max(1, n1 + n2))
            src = a if take_a else b
            out.append(src.pop(int(rng.integers(len(src)))))
        self.sample = out
        self.n_processed = n1 + n2
        return self


@register
class BiasedReservoirSampler(Synopsis):
    KIND = "biased_reservoir"
    TRAIT = Trait.MERGEABLE
    NEEDS_TIMESTAMPS = True
    MERGE_IGNORE_PARAMS = ("seed",)

    def __init__(self, sample_size: int = 100, seed: int = 7):
        super().__init__(sample_size=int(sample_size), seed=int(seed))
        self.sample_size = int(sample_size)
        self.seed = int(seed)
        self.values: list = []
        self.ts: list = []
        self.n_processed = 0
        self._rng = np.random.default_rng(self.seed)

    def _state(self) -> dict:
        return {"values": self.values, "ts": self.ts, "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.values = list(state["values"])
        self.ts = list(state["ts"])
        self.n_processed = int(state["n_processed"])
        self._rng = np.random.default_rng(self.seed + self.n_processed)

    def update_batch(self, values, ts=None) -> None:
        if ts is None:
            ts = np.arange(self.n_processed, self.n_processed + len(values))
        vals = np.asarray(values)
        tss = np.asarray(ts)
        k = self.sample_size
        us = self._rng.random(vals.shape[0])
        slots = self._rng.integers(0, k, size=vals.shape[0])
        for i in range(vals.shape[0]):  # recency-biased replacement is sequential
            if len(self.values) < k:
                self.values.append(vals[i])
                self.ts.append(tss[i])
            elif us[i] < len(self.values) / k:
                self.values[slots[i]] = vals[i]
                self.ts[slots[i]] = tss[i]
        self.n_processed += vals.shape[0]

    def merge(self, other: "BiasedReservoirSampler") -> "BiasedReservoirSampler":
        """Keep the globally newest sample_size by timestamp
        (BiasedReservoirSampler.java:102-140)."""
        self._check_same(other)
        vals = np.asarray(self.values + other.values)
        tss = np.asarray(self.ts + other.ts)
        if vals.shape[0] > self.sample_size:
            keep = np.argsort(tss, kind="stable")[-self.sample_size:]
            vals, tss = vals[keep], tss[keep]
        self.values, self.ts = vals.tolist(), tss.tolist()
        self.n_processed += other.n_processed
        return self


@register
class FiFoSampler(Synopsis):
    KIND = "fifo"
    TRAIT = Trait.MERGEABLE
    NEEDS_TIMESTAMPS = True

    def __init__(self, sample_size: int = 100):
        super().__init__(sample_size=int(sample_size))
        self.sample_size = int(sample_size)
        self.values = np.empty(0, dtype=object)
        self.ts = np.empty(0, dtype=np.int64)
        self.tiebreak = np.empty(0, dtype=np.int64)
        self.n_processed = 0

    def _state(self) -> dict:
        return {"values": self.values, "ts": self.ts, "tiebreak": self.tiebreak,
                "n_processed": self.n_processed}

    def update_batch(self, values, ts=None, tiebreak=None) -> None:
        """Keep the newest sample_size by (ts, tiebreak) — vectorized top-k.

        ``tiebreak`` makes the sample deterministic under timestamp ties
        (the reference's TreeSet tie behavior is order-dependent,
        TimestampedElement.java:46-52 — we make it explicit instead).
        """
        vals = np.asarray(values, dtype=object)
        n = vals.shape[0]
        if ts is None:
            ts = np.arange(self.n_processed, self.n_processed + n)
        tss = np.asarray(ts, dtype=np.int64)
        tb = (np.asarray(tiebreak, dtype=np.int64) if tiebreak is not None
              else np.arange(self.n_processed, self.n_processed + n, dtype=np.int64))
        self.values = np.concatenate([self.values, vals])
        self.ts = np.concatenate([self.ts, tss])
        self.tiebreak = np.concatenate([self.tiebreak, tb])
        self._trim()
        self.n_processed += n

    def _trim(self) -> None:
        if self.values.shape[0] > self.sample_size:
            order = np.lexsort((self.tiebreak, self.ts))  # ascending
            keep = order[-self.sample_size:]
            self.values = self.values[keep]
            self.ts = self.ts[keep]
            self.tiebreak = self.tiebreak[keep]

    def merge(self, other: "FiFoSampler") -> "FiFoSampler":
        self._check_same(other)
        self.values = np.concatenate([self.values, other.values])
        self.ts = np.concatenate([self.ts, other.ts])
        self.tiebreak = np.concatenate([self.tiebreak, other.tiebreak])
        self._trim()
        self.n_processed += other.n_processed
        return self

    def sorted_sample(self):
        order = np.lexsort((self.tiebreak, self.ts))
        return self.values[order], self.ts[order], self.tiebreak[order]


@register
class BottomKSampler(Synopsis):
    KIND = "bottomk"
    TRAIT = Trait.COMMUTATIVE

    def __init__(self, sample_size: int = 100, seed: int = 7):
        super().__init__(sample_size=int(sample_size), seed=int(seed))
        self.sample_size = int(sample_size)
        self.seed = int(seed)
        self.values = np.empty(0, dtype=object)
        self.prio = np.empty(0, dtype=object)
        self.n_processed = 0

    def _state(self) -> dict:
        return {"values": self.values, "prio": self.prio, "n_processed": self.n_processed}

    def update_batch(self, values, ts=None, priorities=None) -> None:
        """priorities: orderable array (precomputed, e.g. md5 hex via Spark's
        JVM-side F.md5); defaults to seeded hash64 of integer inputs."""
        vals = np.asarray(values, dtype=object)
        if priorities is None:
            from .hashing import strings_to_ints
            priorities = hash64(strings_to_ints(values), self.seed)
        prio = np.asarray(priorities, dtype=object)
        self.values = np.concatenate([self.values, vals])
        self.prio = np.concatenate([self.prio, prio])
        self._trim()
        self.n_processed += vals.shape[0]

    def _trim(self) -> None:
        # canonical state: kept sample always sorted by (prio, value), so the
        # serialized bytes are a pure function of the input multiset — byte-
        # identical across any merge topology (flat, tree, N vs 4N partitions)
        order = np.lexsort((self.values, self.prio))[: self.sample_size]
        self.values = self.values[order]
        self.prio = self.prio[order]

    def merge(self, other: "BottomKSampler") -> "BottomKSampler":
        self._check_same(other)
        self.values = np.concatenate([self.values, other.values])
        self.prio = np.concatenate([self.prio, other.prio])
        self._trim()
        self.n_processed += other.n_processed
        return self

    def sorted_sample(self):
        order = np.argsort(self.prio, kind="stable")
        return self.values[order], self.prio[order]
