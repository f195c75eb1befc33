"""JVM-side point-query evaluation against a synopsis snapshot.

The reference's query-stream path sustains ~1M point queries/s/core
(``benchmark/.../scalability/evaluation/QueryLatest.java:60-65`` fed by
``sources/queries/IPQuerySource.java``). Answering in Python — decode the
sketch blob per Arrow batch, numpy-gather per query batch — tops out
~80k q/s/core: the per-query work is trivial, so the Arrow round trip IS
the cost. This module removes Python from the answer path entirely:

  * the snapshot's cell grid is decoded ONCE (O(sketch bytes), driver-side,
    per window — never per query) into a one-row DataFrame holding a flat
    ``array<long>`` / ``array<boolean>``;
  * the query stream ``crossJoin(broadcast(cells))`` — a 1-row broadcast,
    no shuffle of the query rows;
  * each query row computes its buckets with the SAME constant-folded H3
    byte-LUT expressions the pure-SQL build path uses
    (``sqlbuild.h3_bucket_exprs`` — parity with ``H3Family.hash % width``
    is what makes the answers bit-identical to ``CountMinSketch.query`` /
    ``BloomFilter.query``), gathers ``element_at(cells, off)`` per row and
    reduces with ``least`` / ``and`` — whole-stage codegen end to end.

Scale posture: the broadcast is O(sketch bytes) per window (CM 65536×5 =
2.6 MB), each query row does h gathers — no shuffle, no Python worker, no
state. At 1000 executors every core answers independently against its
local broadcast copy, exactly the reference's per-core scaling model.

Hash expressions are STAGED through ``withColumn`` Projects (one per
sketch row) so no fused codegen method crosses the HotSpot 8000-byte JIT
limit (PLANS.md §9 — an inlined span runs bytecode-interpreted, 13x slow).

Every key/parameter-bearing canonical query kind is covered JVM-side:

  * frequency   — CountMin gather+least          (``frequency_point_queries``)
  * membership  — Bloom k-probe AND / Cuckoo two-bucket fingerprint probe
                  with a 256-entry constant alt-bucket LUT
                  (``membership_point_queries`` / ``cuckoo_point_queries``)
  * quantile    — DDSketch rank + UNROLLED O(log bins) codegen binary
                  search over the broadcast cumulative array
                  (``quantile_point_queries``)
  * range count — equi-width histogram boundary fractions + exact prefix-
                  sum interior, O(1) per query (``range_point_queries``)

Kinds that take no per-query parameter (distinct count, F2, full
histogram/sample dumps) are one answer per window, not a query stream —
they stay on ``evaluate``'s snapshot kernels where per-query throughput
is meaningless.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .sqlbuild import h3_bucket_exprs, splitmix64_expr

_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer",
              "short", "byte"}


def cm_cells(syn) -> list[int]:
    """Flatten a CountMinSketch's counter grid row-major (row r, bucket b →
    index r*width + b) for ``frequency_point_queries``."""
    return [int(v) for v in syn.counts.ravel()]


def bloom_bits(syn) -> list[bool]:
    """A BloomFilter's bit array for ``membership_point_queries``."""
    return [bool(v) for v in syn.bits]


def cuckoo_table(syn) -> list[int]:
    """A CuckooFilter's fingerprint table flattened bucket-major (bucket b,
    slot s → index b*bucket_size + s) for ``cuckoo_point_queries``."""
    return [int(v) for v in syn.table.ravel()]


def dd_quantile_state(syn) -> dict:
    """A DDSketch snapshot reduced to the four pieces ``quantile_point_
    queries`` needs: the cumulative rank array (zero bucket folded in), the
    bin representatives (computed with the SAME numpy ops as
    ``DDSketch.representative`` so answers are bit-identical), and the two
    scalars of the rank formula."""
    cums = (syn.zero_count + np.cumsum(syn.bin_counts)).astype(np.int64)
    reps = 2.0 * np.power(syn.gamma, syn.keys) / (syn.gamma + 1.0)
    return {"cums": [int(v) for v in cums],
            "reps": [float(v) for v in reps],
            "zero_count": int(syn.zero_count),
            "n_processed": int(syn.n_processed)}


def hist_state(syn) -> dict:
    """An equi-width histogram snapshot for ``range_point_queries``: the bin
    counts plus their exclusive prefix sums (``prefix[i] = Σ freq[0..i-1]``,
    length num_buckets+1 — interior spans become one subtraction).

    A 4LT-compressed histogram is snapshotted through its LOSSY compressed
    view (``decoded_frequency()`` — the bins a reader of the 4LT encoding
    sees), so ``range_point_queries`` answers exactly
    ``range_query_compressed`` (``EquiWidthHistogram4LT.rangeQuery``)."""
    from ..synopsis.histograms import EquiWidth4LTHistogram

    freqs = (syn.decoded_frequency()
             if isinstance(syn, EquiWidth4LTHistogram) else syn.frequency)
    prefix = np.concatenate([[0], np.cumsum(freqs)]).astype(np.int64)
    return {"freqs": [int(v) for v in freqs],
            "prefix": [int(v) for v in prefix],
            "lower": float(syn.lower), "upper": float(syn.upper),
            "num_buckets": int(syn.num_buckets)}


def _attach(queries_df: DataFrame, cells: list, cells_type: str) -> DataFrame:
    spark = queries_df.sparkSession
    one = spark.createDataFrame([(cells,)], f"__cells array<{cells_type}>")
    return queries_df.crossJoin(F.broadcast(one))


def _attach_many(queries_df: DataFrame, arrays: dict[str, tuple[list, str]]
                 ) -> DataFrame:
    """crossJoin(broadcast(...)) of a single row holding several named
    constant arrays (same 1-row BroadcastNestedLoopJoin as ``_attach``)."""
    spark = queries_df.sparkSession
    names = list(arrays)
    schema = ", ".join(f"{n} array<{arrays[n][1]}>" for n in names)
    one = spark.createDataFrame([tuple(arrays[n][0] for n in names)], schema)
    return queries_df.crossJoin(F.broadcast(one))


def _require_int_key(queries_df: DataFrame, key_col: str, fn: str) -> None:
    kt = dict(queries_df.dtypes).get(key_col)
    if kt not in _INT_TYPES:
        raise ValueError(
            f"{fn} needs an integer key column; {key_col} is {kt!r} "
            "(string keys take the Python path — strings_to_ints is a "
            "pandas hash)")


def frequency_point_queries(queries_df: DataFrame, key_col: str,
                            cells: list[int], width: int, height: int,
                            seed: int,
                            out_col: str = "est_count") -> DataFrame:
    """CountMin point queries in pure codegen: min over rows of
    ``cells[r*width + H3_r(key) % width]`` — bit-identical to
    ``CountMinSketch.query`` for integer keys (``CountMinSketch.java:
    96-113``). ``cells`` comes from ``cm_cells`` of the snapshot window."""
    _require_int_key(queries_df, key_col, "frequency_point_queries")
    if len(cells) != width * height:
        raise ValueError(f"cells length {len(cells)} != width*height "
                         f"{width * height}")
    q = _attach(queries_df, cells, "long")
    key = F.col(key_col).cast("long")
    for r, b in enumerate(h3_bucket_exprs(key, height, seed, width)):
        # stage each bucket in its own Project: constant-folded LUT arrays,
        # bounded codegen method size (PLANS.md §9)
        q = q.withColumn(f"__b{r}", b)
    gathers = [F.element_at(F.col("__cells"),
                            F.col(f"__b{r}") + F.lit(r * width + 1))
               for r in range(height)]
    est = gathers[0] if height == 1 else F.least(*gathers)
    return q.select(*queries_df.columns, est.alias(out_col))


def membership_point_queries(queries_df: DataFrame, key_col: str,
                             bits: list[bool], n_bits: int, k: int,
                             seed: int,
                             out_col: str = "member") -> DataFrame:
    """Bloom membership in pure codegen: AND over ``bits[H3_j(key) %
    n_bits]`` — bit-identical to ``BloomFilter.query`` for integer keys
    (``BloomFilter.java`` k-probe semantics)."""
    _require_int_key(queries_df, key_col, "membership_point_queries")
    if len(bits) != n_bits:
        raise ValueError(f"bits length {len(bits)} != n_bits {n_bits}")
    q = _attach(queries_df, bits, "boolean")
    key = F.col(key_col).cast("long")
    for j, b in enumerate(h3_bucket_exprs(key, k, seed, n_bits)):
        q = q.withColumn(f"__p{j}", b)
    probes = [F.element_at(F.col("__cells"), F.col(f"__p{j}") + F.lit(1))
              for j in range(k)]
    member = probes[0]
    for p in probes[1:]:
        member = member & p
    return q.select(*queries_df.columns, member.alias(out_col))


def cuckoo_point_queries(queries_df: DataFrame, key_col: str,
                         table: list[int], bucket_size: int,
                         num_buckets: int, seed: int,
                         out_col: str = "member") -> DataFrame:
    """Cuckoo-filter membership in pure codegen, bit-identical to
    ``CuckooFilter.query`` for integer keys (``CuckooFilter.java`` two-bucket
    probe semantics; kernel at ``condor_spark/synopsis/cuckoo.py:130``):

      h  = splitmix64(key, seed)                (``splitmix64_expr`` — the
                                                 same wrapping-limb SQL as
                                                 the build path)
      fp = (h & 0xFF) % 255 + 1                 (1..255, never 0 = empty)
      b1 = (h >>> 8) % num_buckets
      b2 = (b1 ^ altlut[fp]) % num_buckets

    The alt-bucket hash only ever sees the 255 possible fingerprints, so
    ``hash64(fp, seed^0xC0C0) % num_buckets`` collapses to a 256-entry
    constant LUT — precomputed here with the SAME numpy ops as
    ``_alt_bucket`` (signed-int64 view before the modulo matters).
    Membership is then an OR over 2×bucket_size ``element_at`` equality
    probes of the broadcast table. No shuffle, no Python."""
    from ..synopsis.hashing import hash64

    _require_int_key(queries_df, key_col, "cuckoo_point_queries")
    if len(table) != num_buckets * bucket_size:
        raise ValueError(f"table length {len(table)} != num_buckets*"
                         f"bucket_size {num_buckets * bucket_size}")
    fps = np.arange(256, dtype=np.int64)
    altlut = [int(v) for v in
              (hash64(fps, seed ^ 0xC0C0).astype(np.int64) % num_buckets)]
    q = _attach_many(queries_df, {"__tbl": (table, "int"),
                                  "__alt": (altlut, "int")})
    key = F.col(key_col).cast("long")
    q = q.withColumn("__h", splitmix64_expr(key, seed))
    q = q.withColumn("__fp", (F.col("__h").bitwiseAND(F.lit(0xFF))
                              % F.lit(255) + F.lit(1)).cast("int"))
    q = q.withColumn("__b1", (F.shiftrightunsigned(F.col("__h"), 8)
                              % F.lit(num_buckets)).cast("int"))
    q = q.withColumn(
        "__b2",
        (F.col("__b1").bitwiseXOR(
            F.element_at(F.col("__alt"), F.col("__fp") + F.lit(1)))
         % F.lit(num_buckets)).cast("int"))
    probes = [
        F.element_at(F.col("__tbl"),
                     F.col(b) * F.lit(bucket_size) + F.lit(s + 1))
        == F.col("__fp")
        for b in ("__b1", "__b2") for s in range(bucket_size)]
    member = probes[0]
    for p in probes[1:]:
        member = member | p
    return q.select(*queries_df.columns, member.alias(out_col))


def quantile_point_queries(queries_df: DataFrame, q_col: str,
                           state: dict,
                           out_col: str = "quantile") -> DataFrame:
    """DDSketch quantile queries in pure codegen, bit-identical to
    ``DDSketch.quantile`` (``condor_spark/synopsis/ddsketch.py:120``):
    rank = max(1, ceil(q·n)); rank ≤ zero_count → 0.0; else the value is
    ``reps[searchsorted(cums, rank, 'left') clipped to the last bin]``.

    The searchsorted is an UNROLLED binary search — ceil(log2(bins))
    iterations, each staged in its own Project (PLANS.md §9) updating a
    [lo, hi] interval with two conditionals over ``element_at(cums, mid)``
    — so the whole answer path stays inside whole-stage codegen: O(log
    bins) per query, no higher-order functions (those are CodegenFallback),
    no shuffle, no Python. ``state`` comes from ``dd_quantile_state``."""
    cums, reps = state["cums"], state["reps"]
    zc, n = int(state["zero_count"]), int(state["n_processed"])
    if n == 0:
        return queries_df.withColumn(
            out_col, F.lit(float("nan")).cast("double"))
    rank = F.greatest(F.lit(1).cast("long"),
                      F.ceil(F.col(q_col).cast("double") * F.lit(float(n))))
    if not cums:
        # all mass in the zero bucket: the kernel's rank ≤ zero_count branch
        # is the only reachable one (zero_count == n ≥ rank for q ≤ 1)
        return queries_df.withColumn(
            out_col,
            F.when(rank <= F.lit(zc), F.lit(0.0))
             .otherwise(F.lit(float("nan"))).cast("double"))
    q = _attach_many(queries_df, {"__cums": (cums, "long"),
                                  "__reps": (reps, "double")})
    q = q.withColumn("__rank", rank)
    last = len(cums) - 1
    q = q.withColumn("__lo", F.lit(0)).withColumn("__hi", F.lit(last))
    for _ in range(max(0, last.bit_length())):
        mid = ((F.col("__lo") + F.col("__hi")) / 2).cast("int")
        q = q.withColumn("__mid", mid)
        ge = (F.element_at(F.col("__cums"), F.col("__mid") + F.lit(1))
              >= F.col("__rank"))
        q = (q.withColumn("__hi", F.when(ge, F.col("__mid"))
                                   .otherwise(F.col("__hi")))
              .withColumn("__lo", F.when(ge, F.col("__lo"))
                                   .otherwise(F.col("__mid") + F.lit(1))))
    val = F.element_at(F.col("__reps"), F.col("__lo") + F.lit(1))
    out = F.when(F.col("__rank") <= F.lit(zc), F.lit(0.0)).otherwise(val)
    return q.select(*queries_df.columns, out.cast("double").alias(out_col))


def range_point_queries(queries_df: DataFrame, lo_col: str, hi_col: str,
                        state: dict,
                        out_col: str = "est_count") -> DataFrame:
    """Equi-width histogram range estimates in pure codegen, matching
    ``EquiWidthHistogram.range_query`` (``condor_spark/synopsis/
    histograms.py:65``; reference ``EquiWidthHistogram.java:102-138``):
    clip [lo, hi) to the domain, fractional coverage for the two boundary
    bins (same ``(min(hi,b_hi) − max(lo,b_lo))/w`` formula), exact int64
    interior span via the precomputed prefix sums — O(1) per query, no loop
    over bins. The kernel accumulates left-to-right in float64, so interior-
    heavy answers can differ in the last ulp; boundary fractions use
    identical expressions. ``state`` comes from ``hist_state``."""
    lower, upper = state["lower"], state["upper"]
    nb = state["num_buckets"]
    w = (upper - lower) / nb
    q = _attach_many(queries_df, {"__freq": (state["freqs"], "long"),
                                  "__pfx": (state["prefix"], "long")})
    q = q.withColumn("__lo", F.greatest(F.col(lo_col).cast("double"),
                                        F.lit(lower)))
    q = q.withColumn("__hi", F.least(F.col(hi_col).cast("double"),
                                     F.lit(upper)))
    q = q.withColumn(
        "__first",
        F.floor((F.col("__lo") - F.lit(lower)) / F.lit(w)).cast("int"))
    # clamp only guards float ulp edges the kernel would IndexError on
    q = q.withColumn("__first", F.least(F.greatest(F.col("__first"),
                                                   F.lit(0)),
                                        F.lit(nb - 1)))
    q = q.withColumn(
        "__last",
        F.ceil((F.col("__hi") - F.lit(lower)) / F.lit(w)).cast("int")
        - F.lit(1))
    q = q.withColumn("__last", F.least(F.greatest(F.col("__last"),
                                                  F.col("__first")),
                                       F.lit(nb - 1)))

    def frac(bcol):
        b_lo = F.lit(lower) + bcol.cast("double") * F.lit(w)
        b_hi = b_lo + F.lit(w)
        return ((F.least(F.col("__hi"), b_hi)
                 - F.greatest(F.col("__lo"), b_lo)) / F.lit(w))

    f_first = (F.element_at(F.col("__freq"), F.col("__first") + F.lit(1))
               .cast("double") * frac(F.col("__first")))
    f_last = (F.element_at(F.col("__freq"), F.col("__last") + F.lit(1))
              .cast("double") * frac(F.col("__last")))
    interior = F.when(
        F.col("__last") > F.col("__first") + F.lit(1),
        (F.element_at(F.col("__pfx"), F.col("__last") + F.lit(1))
         - F.element_at(F.col("__pfx"), F.col("__first") + F.lit(2)))
        .cast("double")).otherwise(F.lit(0.0))
    total = (f_first + interior
             + F.when(F.col("__last") > F.col("__first"), f_last)
                .otherwise(F.lit(0.0)))
    out = F.when(F.col("__hi") <= F.col("__lo"), F.lit(0.0)).otherwise(total)
    return q.select(*queries_df.columns, out.cast("double").alias(out_col))


def query_latest_frequency(syn_df: DataFrame, queries_df: DataFrame,
                           key_col: str = "key",
                           out_col: str = "est_count") -> DataFrame:
    """``queryLatest`` against a CountMin snapshot, answered JVM-side: the
    newest window's blob is decoded once on the driver (O(sketch), per
    window — the snapshot is O(strata) rows by construction), then every
    query row is answered in codegen. The Python twin is
    ``evaluate.frequency_estimates`` (all windows, any key type)."""
    from ..synopsis.base import Synopsis

    row = syn_df.orderBy(F.col("window_end").desc()).limit(1).collect()
    if not row:
        return queries_df.limit(0).withColumn(out_col, F.lit(0).cast("long"))
    syn = Synopsis.from_bytes(bytes(row[0]["state"]))
    return frequency_point_queries(queries_df, key_col, cm_cells(syn),
                                   syn.width, syn.height, syn.seed, out_col)


def _latest(syn_df: DataFrame):
    from ..synopsis.base import Synopsis

    row = syn_df.orderBy(F.col("window_end").desc()).limit(1).collect()
    return Synopsis.from_bytes(bytes(row[0]["state"])) if row else None


def query_latest_membership(syn_df: DataFrame, queries_df: DataFrame,
                            key_col: str = "key",
                            out_col: str = "member") -> DataFrame:
    """``queryLatest`` membership against the newest Bloom OR Cuckoo
    snapshot, answered JVM-side (dispatches on the decoded synopsis kind)."""
    from ..synopsis.bloom import BloomFilter
    from ..synopsis.cuckoo import CuckooFilter

    syn = _latest(syn_df)
    if syn is None:
        return (queries_df.limit(0)
                .withColumn(out_col, F.lit(False).cast("boolean")))
    if isinstance(syn, BloomFilter):
        return membership_point_queries(queries_df, key_col, bloom_bits(syn),
                                        syn.n_bits, syn.k, syn.seed, out_col)
    if isinstance(syn, CuckooFilter):
        return cuckoo_point_queries(queries_df, key_col, cuckoo_table(syn),
                                    syn.bucket_size, syn.num_buckets,
                                    syn.seed, out_col)
    raise TypeError(f"not a membership synopsis: {type(syn).__name__}")


def query_latest_quantile(syn_df: DataFrame, queries_df: DataFrame,
                          q_col: str = "q",
                          out_col: str = "quantile") -> DataFrame:
    """``queryLatest`` quantiles against the newest DDSketch snapshot,
    answered JVM-side (unrolled binary search — see
    ``quantile_point_queries``)."""
    syn = _latest(syn_df)
    if syn is None:
        return (queries_df.limit(0)
                .withColumn(out_col, F.lit(0.0).cast("double")))
    return quantile_point_queries(queries_df, q_col,
                                  dd_quantile_state(syn), out_col)


def query_latest_range(syn_df: DataFrame, queries_df: DataFrame,
                       lo_col: str = "lo", hi_col: str = "hi",
                       out_col: str = "est_count") -> DataFrame:
    """``queryLatest`` range estimates against the newest equi-width
    histogram snapshot, answered JVM-side in O(1) per query. A 4LT-
    compressed snapshot answers through its lossy decoded view
    (= ``range_query_compressed``)."""
    syn = _latest(syn_df)
    if syn is None:
        return (queries_df.limit(0)
                .withColumn(out_col, F.lit(0.0).cast("double")))
    return range_point_queries(queries_df, lo_col, hi_col, hist_state(syn),
                               out_col)
