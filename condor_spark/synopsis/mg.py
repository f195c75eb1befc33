"""Misra-Gries heavy-hitters summary (frequent-items synopsis).

An EXTENSION beyond the reference's twelve synopses: the reference answers
frequency queries only through Count-Min (``core/.../Sketches/
CountMinSketch.java``), which needs the query key up front — it cannot
*enumerate* the frequent items without an external key list (our dyadic-CM
family fixes that for bounded INTEGER domains only). Misra-Gries (Misra &
Gries 1982; merge rule per Agarwal et al., "Mergeable Summaries", PODS
2012) keeps at most ``capacity`` (key, counter) pairs over an UNBOUNDED key
domain — tokens, ids, arbitrary strings — and enumerates every key whose
true frequency exceeds n/(capacity+1), with per-key estimates that are
lower bounds with deficit <= n/(capacity+1). That is the "top tokens /
heavy users per window without knowing the keys in advance" question a
training-data pipeline asks at corpus scale.

Properties that matter here:

* **Deterministic, no hashing.** The summary is a pure function of the
  multiset of (key, weight) pairs *given a fixed grouping* — no RNG, no
  hash family. In the OVERSIZED regime (capacity >= distinct keys in every
  partial and in the merged result) no decrement ever fires, the summary
  IS the exact per-key count table, and the result is byte-identical
  across any partitioning / merge order — the driver oracles run the
  sketch in that regime, so the exact GROUP BY twin replays it
  bit-for-bit (same promotion pattern as the dyadic family's oversampled
  levels). In the UNDERSIZED regime the counter *values* depend on merge
  grouping (the guarantee does not): pytest asserts the deficit bound
  instead of bytes.
* **Mergeable, partition-parallel.** merge = counter-wise sum, then if more
  than ``capacity`` counters survive, subtract the (capacity+1)-th largest
  counter value from all and drop the non-positive (Agarwal et al. 2012
  §3.1). The two-phase build applies unchanged: each partition ships one
  O(capacity) blob; the shuffle is O(partitions x capacity),
  row-count-independent.
* **Error guarantee (asserted by tests/test_mg.py).** After any merge tree
  over inputs totalling n elements: for every key x,
  ``f(x) - n/(capacity+1) <= estimate(x) <= f(x)``, and every key with
  ``f(x) > n/(capacity+1)`` is present in the summary (no false negatives
  above the threshold). ``self.deficit`` tracks the exact cumulative
  decrement, so ``estimate + deficit`` is a valid upper bound.

State is a pair of aligned arrays (keys sorted ascending, int64 counts) —
canonical, so equal summaries serialize to equal blobs.
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register


def _combine(keys_a: np.ndarray, cnts_a: np.ndarray,
             keys_b: np.ndarray, cnts_b: np.ndarray):
    """Sum two sorted (keys, counts) tables into one sorted table."""
    if keys_a.shape[0] == 0:
        return keys_b, cnts_b
    if keys_b.shape[0] == 0:
        return keys_a, cnts_a
    keys = np.concatenate([keys_a, keys_b])
    cnts = np.concatenate([cnts_a, cnts_b])
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    new = np.ones(keys.shape[0], dtype=bool)
    new[1:] = keys[1:] != keys[:-1]  # works for int64 and 'U' strings alike
    starts = np.flatnonzero(new)
    return keys[starts], np.add.reduceat(cnts, starts)


@register
class MisraGries(Synopsis):
    KIND = "mg"
    TRAIT = Trait.COMMUTATIVE  # counter addition; trim is deterministic

    def __init__(self, capacity: int = 1024):
        if int(capacity) < 1:
            raise ValueError("capacity must be >= 1")
        super().__init__(capacity=int(capacity))
        self.capacity = int(capacity)
        self.keys = np.empty(0, dtype=np.int64)
        self.cnts = np.empty(0, dtype=np.int64)
        self.deficit = 0       # exact cumulative decrement (per-key bound)
        self.n_processed = 0

    def _state(self) -> dict:
        return {"keys": self.keys, "cnts": self.cnts,
                "deficit": self.deficit, "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.keys = state["keys"]
        self.cnts = state["cnts"]
        self.deficit = int(state["deficit"])
        self.n_processed = int(state["n_processed"])

    # --- kernel -----------------------------------------------------------
    def _trim(self) -> None:
        """Agarwal et al. 2012 §3.1: keep <= capacity counters by
        subtracting the (capacity+1)-th largest counter value from all."""
        extra = self.keys.shape[0] - self.capacity
        if extra <= 0:
            return
        # d = (capacity+1)-th largest = extra-th smallest; at least `extra`
        # counters are <= d, so <= capacity survive, and at least
        # capacity+1 counters each lose exactly d, which is what bounds the
        # cumulative deficit by n/(capacity+1)
        d = int(np.partition(self.cnts, extra - 1)[extra - 1])
        self.cnts = self.cnts - d
        keep = self.cnts > 0
        self.keys, self.cnts = self.keys[keep], self.cnts[keep]
        self.deficit += d

    def _absorb(self, keys: np.ndarray, cnts: np.ndarray) -> None:
        if (self.keys.shape[0] and keys.shape[0]
                and (self.keys.dtype.kind in "iu") != (keys.dtype.kind in "iu")):
            # np.concatenate would silently promote int64+str to all-str,
            # merging 5 and "5" into one key — fail loudly instead
            raise TypeError(
                "cannot mix integer and string keys in one MG summary "
                f"(have {self.keys.dtype}, got {keys.dtype})")
        self.keys, self.cnts = _combine(self.keys, self.cnts, keys, cnts)
        self._trim()

    def update_batch(self, values, ts=None) -> None:
        arr = np.asarray(values)
        if arr.shape[0] == 0:
            return
        if arr.dtype.kind in "iu":
            arr = arr.astype(np.int64, copy=False)
        elif arr.dtype.kind == "f":
            arr = arr.astype(np.int64)  # Number -> intValue(), reference rule
        else:
            # numpy 'U' dtype: vectorized conversion, and code-point compare
            # == binary UTF-8 order (what the SQL oracles' ORDER BY uses)
            arr = arr.astype(str)
        u, c = np.unique(arr, return_counts=True)
        self._absorb(u, c.astype(np.int64))
        self.n_processed += arr.shape[0]

    def merge(self, other: "MisraGries") -> "MisraGries":
        self._check_same(other)
        self._absorb(other.keys, other.cnts)
        self.deficit += other.deficit
        self.n_processed += other.n_processed
        return self

    # --- queries ----------------------------------------------------------
    def estimate(self, key) -> int:
        """Lower-bound frequency estimate; 0 when the key was trimmed out.
        True count is within [estimate, estimate + deficit]."""
        i = np.searchsorted(self.keys, key)
        if i < self.keys.shape[0] and self.keys[i] == key:
            return int(self.cnts[i])
        return 0

    def query(self, values) -> np.ndarray:
        """Vectorized lower-bound frequency estimates for a key batch
        (0 for trimmed-out / never-seen keys) — the batch form of
        ``estimate`` the query-stream evaluator calls."""
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            arr = arr.astype(np.int64, copy=False)
        elif arr.dtype.kind == "f":
            arr = arr.astype(np.int64)
        else:
            arr = arr.astype(str)
        if self.keys.shape[0] == 0 or arr.shape[0] == 0:
            return np.zeros(arr.shape[0], dtype=np.int64)
        idx = np.clip(np.searchsorted(self.keys, arr), 0,
                      self.keys.shape[0] - 1)
        return np.where(self.keys[idx] == arr, self.cnts[idx],
                        0).astype(np.int64)

    def threshold(self) -> float:
        """Every key with true frequency > n/(capacity+1) is present."""
        return self.n_processed / (self.capacity + 1)

    def heavy_hitters(self, min_count: int):
        """(key, est) pairs with est >= min_count, ordered (-est, key)."""
        keep = self.cnts >= min_count
        keys, cnts = self.keys[keep], self.cnts[keep]
        order = np.lexsort((keys, -cnts))
        return keys[order], cnts[order]

    def topk(self, k: int):
        """The k largest counters, ordered (-est, key) deterministically."""
        order = np.lexsort((self.keys, -self.cnts))[: int(k)]
        return self.keys[order], self.cnts[order]
