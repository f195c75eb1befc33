"""Count-Min sketch — invertible frequency synopsis.

Capability parity with ``core/.../Sketches/CountMinSketch.java`` (ctor 41-49
``(width, height, seed)``; update 57-71; query 96-113 = min over rows; merge
156-173 = cellwise add; invert 200-215; decrement 184-197). Estimate bound
asserted by the reference's own test: ``|est - true| <= residual mass / width``
(``core/.../tests/CountMinSketchTest.java:97-122``).

Spark-first re-expression: ``update_batch`` hashes the whole Arrow batch with
the vectorized H3 family and scatters with ``np.add.at`` — one call per
sketch row, zero per-row Python.
"""

from __future__ import annotations

import numpy as np

from .base import Synopsis, Trait, register
from .hashing import H3Family, hash64_multi, strings_to_ints


def _pack_counts(counts: np.ndarray):
    """Sparse-encode a counter grid when <25% of cells are set."""
    flat = counts.ravel()
    nz = np.flatnonzero(flat)
    if nz.size * 3 < flat.size:  # (idx,val) pairs still ~2/3 smaller
        return ("sparse", nz.astype(np.int64), flat[nz])
    return counts


def _unpack_counts(packed, shape) -> np.ndarray:
    if isinstance(packed, tuple) and packed[0] == "sparse":
        _, idx, vals = packed
        flat = np.zeros(shape[0] * shape[1], dtype=np.int64)
        flat[idx] = vals
        return flat.reshape(shape)
    return packed


@register
class CountMinSketch(Synopsis):
    KIND = "countmin"
    TRAIT = Trait.INVERTIBLE

    def __init__(self, width: int = 633, height: int = 5, seed: int = 7):
        super().__init__(width=int(width), height=int(height), seed=int(seed))
        self.width = int(width)
        self.height = int(height)
        self.seed = int(seed)
        self.counts = np.zeros((self.height, self.width), dtype=np.int64)
        self.n_processed = 0
        self._h3 = H3Family(self.height, self.seed)

    # H3Family is derived from params; keep blobs small by rebuilding it.
    # Partial sketches over few rows are mostly zeros → sparse blobs keep the
    # phase-2 shuffle bounded by data volume, not sketch width (a 65536x5
    # dense partial is 2.6 MB even when only 1k cells are set).
    def _state(self) -> dict:
        return {"counts": _pack_counts(self.counts),
                "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.counts = _unpack_counts(state["counts"], (self.height, self.width))
        self.n_processed = int(state["n_processed"])

    def _cols(self, values) -> np.ndarray:
        x = strings_to_ints(values)
        return self._h3.hash(x) % self.width  # (height, n)

    def update_batch(self, values, ts=None, weights: np.ndarray | None = None) -> None:
        cols = self._cols(values)
        n = cols.shape[1]
        w = np.ones(n, dtype=np.int64) if weights is None else np.asarray(weights, dtype=np.int64)
        for r in range(self.height):
            np.add.at(self.counts[r], cols[r], w)
        self.n_processed += int(w.sum())

    # ---- whole-batch fast path (builder._partial_builder) -----------------
    # hash once for an entire Arrow batch; each (slice, stratum) group then
    # scatters its contiguous [lo, hi) view — the per-group cost drops from
    # "hash a tiny array" (fixed numpy dispatch × 32 bit-steps) to one
    # np.add.at per sketch row.
    def precompute(self, values):
        return self._cols(values)  # (height, n)

    def update_precomputed(self, pre, lo: int, hi: int) -> None:
        for r in range(self.height):
            np.add.at(self.counts[r], pre[r, lo:hi], 1)
        self.n_processed += hi - lo

    def decrement_batch(self, values) -> None:
        cols = self._cols(values)
        for r in range(self.height):
            np.subtract.at(self.counts[r], cols[r], 1)
        self.n_processed -= cols.shape[1]

    def query(self, values) -> np.ndarray:
        """Frequency estimates for a batch of query keys → int64 (n,)."""
        cols = self._cols(values)
        ests = np.take_along_axis(self.counts, cols, axis=1)  # (height, n)
        return ests.min(axis=0)

    def estimate_join(self, other: "CountMinSketch") -> float:
        """Equi-join size |A ⋈ B| = Σ_k f_A(k)·f_B(k): MIN over rows of the
        inner product of two CM grids built with the SAME hash family.

        The Cormode–Muthukrishnan inner-product estimate ("An improved data
        stream summary: the count-min sketch and its applications", §4.2):
        one-sided like the point query — each row's inner product equals the
        true join size plus non-negative collision mass ≤ N_A·N_B/width in
        expectation, so the min is an upper-biased estimate with additive
        error ≤ e·N_A·N_B/w at probability 1−δ. The reference exposes no
        join estimator (CountMinSketch.java has query/merge/invert only);
        the AGMS twin is ``FastAGMS.estimate_join`` (unbiased, two-sided)."""
        self._check_same(other)
        per_row = (self.counts.astype(np.float64)
                   * other.counts.astype(np.float64)).sum(axis=1)
        return float(per_row.min())

    def join_error_bound(self, other: "CountMinSketch") -> float:
        """Expected per-row collision mass e·N_A·N_B/width (CM §4.2)."""
        return float(np.e * self.n_processed * other.n_processed / self.width)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self._check_same(other)
        self.counts += other.counts
        self.n_processed += other.n_processed
        return self

    def invert(self, other: "CountMinSketch") -> "CountMinSketch":
        self._check_same(other)
        self.counts -= other.counts
        self.n_processed -= other.n_processed
        return self


@register
class DyadicCountMin(CountMinSketch):
    """CountMin with splitmix64 row bucketing over a power-of-two width —
    the per-level sketch of ``engine/dyadic.py``'s dyadic hierarchy.

    Same grid/merge/invert/query semantics as ``CountMinSketch`` (the
    reference kernel, ``core/.../Sketches/CountMinSketch.java``); only the
    row-hash family differs, and for an expressible reason: H3's SQL form is
    4x256-literal byte-LUT arrays PER ROW HASH (``sqlbuild.h3_bucket_exprs``)
    — fine for one sketch, but a dyadic range decomposition stages
    ``2 endpoints x height x (bits+1)`` bucket expressions, which would put
    ~100k literal nodes in the plan. ``hash64``'s splitmix64 finalizer is
    ~15 arithmetic nodes as a Column (``sqlbuild.splitmix64_expr``, bit-exact
    with the kernel), so the full decomposition stays plan-light and
    whole-stage-codegen-friendly. Power-of-two width makes the SQL-side
    signed ``h & (width-1)`` identical to the kernel's uint64 modulo.

    Accuracy is the standard CM bound (pairwise-independent row hashes;
    splitmix64 is the same family HLL/minhash/bottom-k here already rely
    on): overestimate-only, additive error eps·N w.p. 1-delta at
    width=e/eps, height=ln(1/delta)."""

    KIND = "dyadiccm"

    def __init__(self, width: int = 1024, height: int = 5, seed: int = 7):
        if width & (width - 1) or width <= 0:
            raise ValueError(f"dyadiccm width must be a power of two, got {width}")
        super().__init__(width=width, height=height, seed=seed)
        self._row_seeds = np.array(
            [row_seed(self.seed, r) for r in range(self.height)], dtype=np.uint64)

    def _cols(self, values) -> np.ndarray:
        x = strings_to_ints(values)
        h = hash64_multi(x, self._row_seeds)  # (height, n) uint64
        return (h & np.uint64(self.width - 1)).astype(np.int64)


def row_seed(seed: int, r: int) -> int:
    """Per-row seed derivation shared by the kernel and the SQL/codegen
    query path (``engine/dyadic.py``): distinct odd-ish offsets off the
    golden ratio, masked to 64 bits."""
    return (seed + 0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF


#: per-worker node-bucket tables shared across DyadicSketch instances,
#: keyed by (bits, height, seed, widths, level) — see _bucket_table
_DYADIC_TABLES: dict = {}


def _pow2ceil(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def level_widths(bits: int, oversample: int = 64, min_width: int = 1024,
                 max_width: int = 1 << 17) -> list[int]:
    """Per-level width policy of the dyadic hierarchy: ``oversample``x the
    level's key-domain size, clamped and rounded to powers of two (pow-2
    keeps SQL ``h & (width-1)`` == the kernel's uint64 modulo) — small
    levels stay cheap, level 0 carries the accuracy."""
    return [_pow2ceil(max(min_width,
                          min(max_width, (1 << (bits - l)) * oversample)))
            for l in range(bits + 1)]


@register
class DyadicSketch(Synopsis):
    """The WHOLE dyadic Count-Min hierarchy as one mergeable synopsis:
    bits+1 ``DyadicCountMin``-style grids, level l summarizing ``key >> l``
    (level ``bits`` is the 1-node root).

    Packaging all levels into a single registered kernel (rather than bits+1
    separate specs through ``build_batch_many``) makes the hierarchy a
    first-class citizen of EVERY existing execution path with one spec and
    one blob per window: the batch builder and its whole-batch fast path,
    the applyInPandasWithState streaming build (``StatefulSynopsisStream``),
    the exactly-once manifest sink, checkpoint resume — none of them need to
    know the blob holds a tree. Query surface: ``engine/dyadic.py``
    (range counts / heavy hitters / rank quantiles without key
    enumeration, CM paper §4.2-4.3).

    Keys MUST lie in ``[0, 2**bits)`` — out-of-domain keys would update
    shifted node ids the queries never visit (silently missing from range
    counts and heavy hitters while still counted in n), so ``update_batch``
    raises instead."""

    KIND = "dyadic"
    TRAIT = Trait.INVERTIBLE

    def __init__(self, bits: int, height: int = 5, seed: int = 7,
                 oversample: int = 64, min_width: int = 1024,
                 max_width: int = 1 << 17):
        super().__init__(bits=int(bits), height=int(height), seed=int(seed),
                         oversample=int(oversample),
                         min_width=int(min_width), max_width=int(max_width))
        self.bits = int(bits)
        self.height = int(height)
        self.seed = int(seed)
        self.widths = level_widths(self.bits, int(oversample),
                                   int(min_width), int(max_width))
        self.grids = [np.zeros((self.height, w), dtype=np.int64)
                      for w in self.widths]
        self.n_processed = 0
        self._row_seeds = np.array(
            [row_seed(self.seed, r) for r in range(self.height)],
            dtype=np.uint64)

    def _state(self) -> dict:
        return {"grids": [_pack_counts(g) for g in self.grids],
                "n_processed": self.n_processed}

    def _load_state(self, state: dict) -> None:
        self.grids = [_unpack_counts(p, (self.height, self.widths[l]))
                      for l, p in enumerate(state["grids"])]
        self.n_processed = int(state["n_processed"])

    def _guard(self, x: np.ndarray) -> np.ndarray:
        x = x.astype(np.int64, copy=False)
        if x.size and (int(x.min()) < 0 or int(x.max()) >= (1 << self.bits)):
            bad = x[(x < 0) | (x >= (1 << self.bits))][0]
            raise ValueError(
                f"dyadic key out of domain [0, {1 << self.bits}): {int(bad)}")
        return x

    # Update strategy. Naively every row hashes at every level x row —
    # (bits+1)·height hashes per value, ~11x a flat CM build. Instead the
    # batch is reduced to a level-0 COUNT VECTOR (one O(n) bincount) and
    # folded up the tree (c_{l+1} = c_l[0::2] + c_l[1::2], O(domain) per
    # level); each level then scatters count MASS for its present node ids
    # only. Node-id buckets don't depend on the data, so for small domains
    # they come from a lazily-built per-level table (O(2^{bits+1}·height)
    # ints, built once per kernel instance, shared by every batch/group).
    # Above _TABLE_BITS the table would dominate memory and the per-batch
    # hash covers only np.unique node ids instead. Identical grids either
    # way (integer adds commute) — asserted by the parity pytest.
    _TABLE_BITS = 16

    def _bucket_table(self, level: int) -> np.ndarray:
        """(height, 2^{bits-level}) bucket ids of every node at ``level``.

        Cached at MODULE level keyed by the hash-determining params: the
        builder creates one kernel instance per (slice, stratum), so an
        instance-level cache would rebuild (and hold) up to ~5 MB of
        tables per window — per-worker sharing makes it one copy per
        distinct sizing. Bounded: tables are O(2^{bits+1}·height) total
        per sizing and _TABLE_BITS caps bits."""
        key = (self.bits, self.height, self.seed, tuple(self.widths), level)
        tbl = _DYADIC_TABLES.get(key)
        if tbl is None:
            dom = np.arange(1 << (self.bits - level), dtype=np.int64)
            h = hash64_multi(dom, self._row_seeds)
            tbl = (h & np.uint64(self.widths[level] - 1)).astype(np.int64)
            if len(_DYADIC_TABLES) > 256:  # distinct sizings, not instances
                _DYADIC_TABLES.clear()
            _DYADIC_TABLES[key] = tbl
        return tbl

    def _add_counts(self, c: np.ndarray, sign: int = 1) -> None:
        """Scatter a level-0 count vector (len 2^bits) into every grid."""
        total = int(c.sum())
        use_tables = self.bits <= self._TABLE_BITS
        for l in range(self.bits + 1):
            nz = np.flatnonzero(c)
            if nz.size:
                vals = (sign * c[nz]).astype(np.int64)
                if use_tables:
                    cols = self._bucket_table(l)[:, nz]
                else:
                    h = hash64_multi(nz, self._row_seeds)
                    cols = (h & np.uint64(self.widths[l] - 1)).astype(np.int64)
                g = self.grids[l]
                for r in range(self.height):
                    np.add.at(g[r], cols[r], vals)
            if l < self.bits:
                c = c[0::2] + c[1::2]
        self.n_processed += sign * total

    # whole-batch fast path (builder._partial_builder): the precompute is
    # just guard+convert; each (slice, stratum) group bincounts its
    # contiguous [lo, hi) view and scatters mass via the shared tables
    def precompute(self, values):
        return self._guard(strings_to_ints(values))

    def update_precomputed(self, pre, lo: int, hi: int) -> None:
        n = hi - lo
        if n * 4 < (1 << self.bits):
            # tiny group (fine slices/strata): an O(2^bits) count vector per
            # group would dominate — hash the few values per level directly
            x = pre[lo:hi]
            for l, w in enumerate(self.widths):
                h = hash64_multi(x >> l, self._row_seeds)
                cols = (h & np.uint64(w - 1)).astype(np.int64)
                g = self.grids[l]
                for r in range(self.height):
                    np.add.at(g[r], cols[r], 1)
            self.n_processed += n
            return
        self._add_counts(np.bincount(pre[lo:hi], minlength=1 << self.bits))

    def update_batch(self, values, ts=None) -> None:
        x = self._guard(strings_to_ints(values))
        self._add_counts(np.bincount(x, minlength=1 << self.bits))

    def decrement_batch(self, values) -> None:
        x = self._guard(strings_to_ints(values))
        self._add_counts(np.bincount(x, minlength=1 << self.bits), sign=-1)

    def merge(self, other: "DyadicSketch") -> "DyadicSketch":
        self._check_same(other)
        for g, og in zip(self.grids, other.grids):
            g += og
        self.n_processed += other.n_processed
        return self

    def invert(self, other: "DyadicSketch") -> "DyadicSketch":
        self._check_same(other)
        for g, og in zip(self.grids, other.grids):
            g -= og
        self.n_processed -= other.n_processed
        return self

    def query(self, values) -> np.ndarray:
        """Point (level-0) frequency estimates, CM semantics."""
        x = self._guard(strings_to_ints(values))
        h = (hash64_multi(x, self._row_seeds)
             & np.uint64(self.widths[0] - 1)).astype(np.int64)
        ests = np.take_along_axis(self.grids[0], h, axis=1)
        return ests.min(axis=0)
