"""Seeded, vectorized hash families for the synopsis kernels.

Re-derivation of the hash families the reference uses
(H3 universal hashing, EH3 four-wise-independent sign bits):

- reference H3: ``core/.../Sketches/HashFunctions/EfficientH3Functions.java:20-59``
  (32 random 32-bit words per function, XOR of words selected by the input's
  bits, then absolute value).
- reference EH3: ``core/.../Sketches/HashFunctions/EH3_HashFunction.java:22-60``
  (33-bit seeds, parity of ``seed AND [1,input]`` XOR a nonlinear term).

The reference seeds its q-matrices from Flink's ``XORShiftRandom``. Bitwise
parity with the JVM generator is not verifiable in this sandbox, so we seed
from SplitMix64 (public algorithm, Steele et al. 2014) instead and assert the
reference's *statistical* bounds — which is exactly what the reference's own
unit tests assert (``core/.../tests/CountMinSketchTest.java:97-122`` etc.).

All functions are pure numpy, vectorized over whole Arrow batches; no
per-row Python in any hot path.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64_stream(seed: int, n: int) -> np.ndarray:
    """Deterministic stream of n 64-bit values from SplitMix64 (public PRNG)."""
    out = np.empty(n, dtype=_U64)
    # scalar loop in Python ints (exact wraparound, no numpy overflow warnings);
    # only runs at synopsis construction (k*32 values), never per batch
    m = 0xFFFFFFFFFFFFFFFF
    x = seed & m
    for i in range(n):
        x = (x + 0x9E3779B97F4A7C15) & m
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m
        out[i] = z ^ (z >> 31)
    return out


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count for uint64 arrays (SWAR; numpy<2 lacks bitwise_count)."""
    x = x.astype(_U64, copy=True)
    m1 = _U64(0x5555555555555555)
    m2 = _U64(0x3333333333333333)
    m4 = _U64(0x0F0F0F0F0F0F0F0F)
    h01 = _U64(0x0101010101010101)
    x = x - ((x >> _U64(1)) & m1)
    x = (x & m2) + ((x >> _U64(2)) & m2)
    x = (x + (x >> _U64(4))) & m4
    return ((x * h01) & _MASK64) >> _U64(56)


class H3Family:
    """k independent H3 hash functions over 32-bit inputs → values in [0, 2^31).

    Mirrors the reference's construction (XOR of 32 seeded words selected by
    the input bits, made non-negative). We mask the sign bit instead of the
    Java ``-1 * current`` (both fold the sign; ours keeps the map 2-to-1
    uniform on [0, 2^31)).
    """

    def __init__(self, num_functions: int, seed: int):
        self.num_functions = int(num_functions)
        self.seed = int(seed)
        words = splitmix64_stream(seed, num_functions * 32)
        # low 32 bits of each splitmix output as the q-matrix words
        self.q = (words & _U64(0xFFFFFFFF)).astype(np.uint32).reshape(num_functions, 32)

    def hash(self, values: np.ndarray) -> np.ndarray:
        """values: int array (n,) → (num_functions, n) int64 in [0, 2^31)."""
        x = np.asarray(values).astype(np.int64, copy=False).astype(np.uint64) & _U64(0xFFFFFFFF)
        n = x.shape[0]
        acc = np.zeros((self.num_functions, n), dtype=np.uint32)
        for j in range(32):
            bit = ((x >> _U64(j)) & _U64(1)).astype(np.uint32)  # (n,)
            acc ^= self.q[:, j : j + 1] * bit[None, :]
        return (acc & np.uint32(0x7FFFFFFF)).astype(np.int64)


class EH3Family:
    """k EH3 sign functions over 32-bit inputs → ±1.

    Textbook EH3 (also used by the reference's AMS sketch): for a 33-bit seed
    ``(s0, S)``, ``h(i) = s0 XOR parity(S & i) XOR f(i)`` with the nonlinear
    term ``f(i) = (i0&i1) ^ (i2&i3) ^ ... ^ (i30&i31)``.

    Exact independence structure (enumerated over the full seed space in
    ``tests/test_kernels.py::test_eh3_independence_structure``): E[∏h] = 0
    for any 1–3 distinct inputs (3-wise independent), and for 4 distinct
    inputs E[∏h] = 0 UNLESS ``a⊕b⊕c⊕d = 0``, where the linear parts cancel
    and the product is the deterministic sign ``(-1)^(f(a)⊕f(b)⊕f(c)⊕f(d))``
    (Rusu & Dobra, "Pseudo-random number generation for sketch-based
    estimations", TODS 2007). This is a property of the EH3 *scheme* — the
    reference's ``EH3_HashFunction.java:22-60`` has the identical algebra —
    so the AMS variance carries the same small XOR-quadruple term beyond
    the ideal 2·F2²/w; see ``ams.FastAGMS.error_bound``.
    """

    def __init__(self, num_functions: int, seed: int):
        self.num_functions = int(num_functions)
        self.seed = int(seed)
        raw = splitmix64_stream(seed ^ 0xE11357, num_functions)
        self.s0 = ((raw >> _U64(32)) & _U64(1)).astype(np.uint64)  # (k,)
        self.S = (raw & _U64(0xFFFFFFFF)).astype(_U64)  # (k,)

    def signs(self, values: np.ndarray) -> np.ndarray:
        """values: int array (n,) → (num_functions, n) int8 in {-1, +1}."""
        x = np.asarray(values).astype(np.int64, copy=False).astype(np.uint64) & _U64(0xFFFFFFFF)
        # nonlinear term f(i): parity of ANDs of adjacent bit pairs (n,)
        even = (x >> _U64(0)) & _U64(0x55555555)
        odd = (x >> _U64(1)) & _U64(0x55555555)
        f = popcount64(even & odd) & _U64(1)  # (n,)
        # parity(S & x): (k, n)
        par = popcount64(self.S[:, None] & x[None, :]) & _U64(1)
        bits = (par ^ f[None, :] ^ self.s0[:, None]) & _U64(1)
        return (bits.astype(np.int8) * 2 - 1)


def hash64(values: np.ndarray, seed: int) -> np.ndarray:
    """Single vectorized 64-bit mix (splitmix64 finalizer) of integer inputs.

    Used for HLL's 64-bit hash, bottom-k sampler priorities, minhash, etc.
    """
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        x = np.asarray(values).astype(np.int64, copy=False).astype(np.uint64)
        x = x ^ _U64(seed & 0xFFFFFFFFFFFFFFFF)
        c1 = _U64(0xBF58476D1CE4E5B9)
        c2 = _U64(0x94D049BB133111EB)
        x = (x + _U64(0x9E3779B97F4A7C15)) & _MASK64
        x = ((x ^ (x >> _U64(30))) * c1) & _MASK64
        x = ((x ^ (x >> _U64(27))) * c2) & _MASK64
        return x ^ (x >> _U64(31))


def hash64_multi(values: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Vectorized hash64 across many seeds at once: (k_seeds, n_values)."""
    with np.errstate(over="ignore"):
        x = np.asarray(values).astype(np.int64, copy=False).astype(np.uint64)
        s = np.asarray(seeds, dtype=np.uint64)
        m = x[None, :] ^ s[:, None]
        c1 = _U64(0xBF58476D1CE4E5B9)
        c2 = _U64(0x94D049BB133111EB)
        m = (m + _U64(0x9E3779B97F4A7C15)) & _MASK64
        m = ((m ^ (m >> _U64(30))) * c1) & _MASK64
        m = ((m ^ (m >> _U64(27))) * c2) & _MASK64
        return m ^ (m >> _U64(31))


def strings_to_ints(values) -> np.ndarray:
    """Deterministically map a batch of arbitrary values to int64 hash inputs.

    Numbers pass through as ``int(value)`` (mirrors the reference's
    ``element instanceof Number ? intValue() : hashCode()``,
    ``core/.../Sketches/CountMinSketch.java:58-64``); other types hash their
    UTF-8 bytes with FNV-1a 64 (public algorithm), vectorized per batch.
    """
    # fast path: already-numeric ndarray — no pandas Series construction
    # (session builds call this once per session; Series.__init__ alone was
    # ~60% of the per-tiny-session cost)
    if isinstance(values, np.ndarray) and values.dtype.kind in "iuf":
        return values.astype(np.int64, copy=False)

    import pandas as pd

    arr = pd.Series(values)
    if arr.dtype.kind in "iuf":
        return arr.to_numpy().astype(np.int64, copy=False)
    if arr.dtype.kind == "M":  # datetimes → epoch micros
        return arr.astype("int64").to_numpy()
    # vectorized deterministic string hashing (pandas siphash with fixed key)
    h = pd.util.hash_pandas_object(arr.astype(str), index=False,
                                   hash_key="condor_spark_16b")  # exactly 16 bytes
    return h.to_numpy().view(np.int64)
