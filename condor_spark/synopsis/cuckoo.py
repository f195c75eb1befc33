"""Cuckoo filter — commutative membership synopsis with deletes.

Capability parity with ``core/.../Sketches/CuckooFilter.java`` (ctor 42-52
``(bucket_size, num_buckets, seed)``; insert with up to 500 kicks and a
``full`` flag 80-113; lookup 122-133; delete 141-158; best-effort merge
192-226 — silently keeps ``this`` entry when the other side's entry cannot be
placed, reproduced here).

Fingerprints are 1..255 (one byte, 0 = reserved empty, mirroring the
reference's low-byte-of-hash fingerprint :60-62). Bucket choice uses the
standard partial-key cuckoo scheme: ``b2 = b1 XOR hash(fp)``.

``update_batch`` places a whole pre-hashed batch vectorized: a first-fit
pass over primary buckets, a second over alternate buckets (stable batch
order within each bucket), then ONLY the leftovers — elements whose both
buckets were contended full — walk the sequential kick chains. Kick chains
are inherently sequential; everything before them is not. Batch placement
is deterministic (a pure function of batch order) but may fill contended
buckets in a different element order than a strict per-element walk —
membership semantics are identical, only the residual table layout under
contention can differ.
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .hashing import hash64, strings_to_ints

_MAX_KICKS = 500  # CuckooFilter.java:96-112


@register
class CuckooFilter(Synopsis):
    KIND = "cuckoo"
    TRAIT = Trait.COMMUTATIVE

    def __init__(self, bucket_size: int = 4, num_buckets: int = 1024, seed: int = 7):
        super().__init__(bucket_size=int(bucket_size), num_buckets=int(num_buckets),
                         seed=int(seed))
        self.bucket_size = int(bucket_size)
        self.num_buckets = int(num_buckets)
        self.seed = int(seed)
        self.table = np.zeros((self.num_buckets, self.bucket_size), dtype=np.uint8)
        self.full = False
        self.n_processed = 0
        self._rng = np.random.default_rng(self.seed)

    def _state(self) -> dict:
        return {"table": self.table, "full": self.full, "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.table = state["table"]
        self.full = bool(state["full"])
        self.n_processed = int(state["n_processed"])
        self._rng = np.random.default_rng(self.seed + self.n_processed)

    def _fp_and_buckets(self, values):
        x = strings_to_ints(values)
        h = hash64(x, self.seed)
        fp = ((h & np.uint64(0xFF)).astype(np.int64) % 255 + 1).astype(np.uint8)  # 1..255
        b1 = ((h >> np.uint64(8)).astype(np.int64) % self.num_buckets)
        b2 = self._alt_bucket(b1, fp)
        return fp, b1, b2

    def _alt_bucket(self, b, fp):
        fph = hash64(fp.astype(np.int64), self.seed ^ 0xC0C0).astype(np.int64)
        return (np.asarray(b) ^ (fph % self.num_buckets)) % self.num_buckets

    def _insert_one(self, fp: int, b1: int, b2: int) -> bool:
        for b in (b1, b2):
            row = self.table[b]
            empties = np.nonzero(row == 0)[0]
            if empties.size:
                row[empties[0]] = fp
                return True
        # kick chain
        b = int(b1 if self._rng.integers(2) == 0 else b2)
        cur = int(fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(self.bucket_size))
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            b = int(self._alt_bucket(np.int64(b), np.uint8(cur)))
            row = self.table[b]
            empties = np.nonzero(row == 0)[0]
            if empties.size:
                row[empties[0]] = cur
                return True
        self.full = True  # reference sets a flag and drops (CuckooFilter.java:96-112)
        return False

    def _place_first_fit(self, idx: np.ndarray, buckets: np.ndarray,
                         fp: np.ndarray) -> np.ndarray:
        """Vectorized first-fit of elements ``idx`` into ``buckets[idx]``;
        returns the indices that did NOT fit. Stable batch order within a
        bucket: earlier elements take earlier empty slots."""
        bs = buckets[idx]
        order = np.argsort(bs, kind="stable")
        bs_s, idx_s = bs[order], idx[order]
        uniq, start, counts = np.unique(bs_s, return_index=True,
                                        return_counts=True)
        pos = np.arange(bs_s.size) - np.repeat(start, counts)
        empt = self.table[uniq] == 0                  # (u, bucket_size)
        cap = np.repeat(empt.sum(axis=1), counts)
        placed = pos < cap
        if placed.any():
            rank = empt.cumsum(axis=1) - 1            # rank among empties
            slot_for_pos = np.full((uniq.size, self.bucket_size), -1,
                                   dtype=np.int64)
            uu, ss = np.nonzero(empt)
            slot_for_pos[uu, rank[uu, ss]] = ss
            urow = np.repeat(np.arange(uniq.size), counts)
            self.table[bs_s[placed],
                       slot_for_pos[urow[placed], pos[placed]]] = fp[idx_s[placed]]
        return idx_s[~placed]

    def update_batch(self, values, ts=None) -> None:
        fp, b1, b2 = self._fp_and_buckets(values)
        n = fp.shape[0]
        leftover = np.arange(n)
        for buckets in (b1, b2):
            if leftover.size == 0:
                break
            leftover = self._place_first_fit(leftover, buckets, fp)
        for i in leftover:  # contended buckets: sequential kick chains
            self._insert_one(int(fp[i]), int(b1[i]), int(b2[i]))
        self.n_processed += n

    def query(self, values) -> np.ndarray:
        fp, b1, b2 = self._fp_and_buckets(values)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_batch(self, values) -> np.ndarray:
        """Delete one occurrence per present key; returns bool mask of deletions."""
        fp, b1, b2 = self._fp_and_buckets(values)
        out = np.zeros(fp.shape[0], dtype=bool)
        for i in range(fp.shape[0]):
            for b in (int(b1[i]), int(b2[i])):
                row = self.table[b]
                hits = np.nonzero(row == fp[i])[0]
                if hits.size:
                    row[hits[0]] = 0
                    out[i] = True
                    break
        return out

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Best-effort merge: reinsert the other table's fingerprints.

        Mirrors the reference's silent keep-on-overflow (CuckooFilter.java:216-225).
        """
        self._check_same(other)
        occ_b, occ_s = np.nonzero(other.table)
        for b, s in zip(occ_b.tolist(), occ_s.tolist()):
            fp = int(other.table[b, s])
            # b may be the primary or the alt bucket for fp; both work since
            # alt(alt(b)) == b under the XOR scheme
            self._insert_one(fp, b, int(self._alt_bucket(np.int64(b), np.uint8(fp))))
        self.full = self.full or other.full
        self.n_processed += other.n_processed
        return self
