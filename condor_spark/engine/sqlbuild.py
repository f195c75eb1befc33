"""Pure-JVM SQL build path for hash sketches (Count-Min, Fast-AGMS, HLL).

The update pipeline of ``CountMinSketch.java:57-71`` / ``FastAGMS.java:93-117``
is *linear* over counter cells: hash the key, pick a bucket per row, add ±1;
``HyperLogLogSketch.java:51-68`` is a register-wise max, which packs into the
same shape (see ``_cell_space``). The whole pipeline — hashing, scatter,
slice→window expansion, merge — is expressible as Spark SQL aggregation, so
it runs entirely inside whole-stage codegen with zero Python in the hot path:

  numpy kernel path (builder.py)          this path
  ------------------------------          ---------------------------------
  mapInPandas partial build               H3 via four 256-entry byte-LUT
    (Arrow decode + np.add.at)              ``element_at`` lookups + XOR,
                                            EH3 sign via ``bit_count`` parity
                                            → posexplode(height cells/row)
                                            → groupBy(slice, stratum, row,
                                              bucket).sum  (map-side combine)
  applyInPandas merge of blobs            slice→window sequence+explode on
                                            the AGGREGATED cells, second sum
  —                                       tiny applyInPandas assembles each
                                            window's ≤ height×width cells
                                            into the canonical kernel blob

The H3 decomposition is exact: H3 is XOR-linear over input bits
(``hashing.H3Family``), so ``h(x) = T0[x&255] ^ T1[(x>>8)&255] ^ T2[..] ^
T3[..]`` with ``Tb[v] = XOR of q-words for the set bits of v``. EH3's sign is
``s0 ^ parity(S & x) ^ f(x)`` with ``f(x) = parity(x & (x>>1) & 0x55555555)``
— both are single ``bit_count(...) & 1`` expressions. HLL's SplitMix64 hash
needs wrapping 64-bit ``+``/``×`` under ANSI mode — done exactly with 16-bit
limb products and 32-bit lane carries (``_wrap_mul_const``), and its
trailing-zero rank is ``bit_count(lowest_set_bit − 1)``. Constants come from
the same seeded families as the numpy kernels, so the resulting blobs are
**byte-identical** to ``build_batch`` output (asserted in
``tests/test_sqlbuild.py``), and every downstream evaluator works unchanged.

Shuffle volume is O(cells touched) = O(partitions × slices × strata × height
× min(width, distinct keys)) after map-side combine — independent of row
count, the same scale property as the blob path, but the per-row update cost
is a handful of codegen'd long ops instead of Arrow decode + numpy dispatch.

Scope: integer-typed key columns (string keys go through pandas' keyed
siphash in ``strings_to_ints``, which has no JVM equivalent — use the kernel
path); tumbling / sliding / global windows; unit weights. ``build_batch``
remains the general surface; this is the throughput fast path for the
sketches that dominate the reference's scalability benchmarks
(``benchmark/.../scalability/jobs/CountMinSlicing.java``).

Deployment note: set ``spark.sql.codegen.hugeMethodLimit=8000`` (HotSpot's
JIT refusal threshold). The default 65536 lets Spark fuse these wide hash
pipelines into one whole-stage method that HotSpot then refuses to JIT
(-XX:DontCompileHugeMethods) — the span runs bytecode-interpreted, measured
4-13x slower. At 8000 Spark falls back to per-operator codegen for
oversized spans, which JITs fine. bench.py and tests/conftest.py set it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..synopsis.hashing import EH3Family, H3Family
from .builder import _FINAL_SCHEMA, SynopsisSpec, _rescale_degenerate
from .windows import GlobalWindow, Sliding, Tumbling

_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}


def _h3_byte_luts(height: int, seed: int) -> np.ndarray:
    """(height, 4, 256) byte-lookup tables; Tb[v] = XOR of q[8b+j] over set bits j."""
    q = H3Family(height, seed).q  # (height, 32) uint32
    luts = np.zeros((height, 4, 256), dtype=np.uint32)
    v = np.arange(256)
    for b in range(4):
        for j in range(8):
            mask = ((v >> j) & 1).astype(bool)
            for r in range(height):
                luts[r, b, mask] ^= q[r, 8 * b + j]
    return luts


def h3_bucket_exprs(col, height: int, seed: int, width: int) -> list:
    """One Column per H3 row: bucket index in [0, width), parity-exact with
    ``H3Family.hash(x) % width`` for integer inputs."""
    luts = _h3_byte_luts(height, seed)
    x = col.bitwiseAND(F.lit(0xFFFFFFFF))
    idx = [(F.shiftright(x, 8 * b).bitwiseAND(F.lit(255)) + 1).cast("int")
           for b in range(4)]
    out = []
    for r in range(height):
        h = None
        for b in range(4):
            arr = F.array(*[F.lit(int(w)) for w in luts[r, b]])
            term = F.element_at(arr, idx[b])
            h = term if h is None else h.bitwiseXOR(term)
        out.append(F.pmod(h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(width)).cast("int"))
    return out


def eh3_sign_exprs(col, height: int, seed: int) -> list:
    """One ±1 Column per EH3 row, parity-exact with ``EH3Family.signs``."""
    fam = EH3Family(height, seed)
    x = col.bitwiseAND(F.lit(0xFFFFFFFF))
    nonlin = F.bit_count(
        x.bitwiseAND(F.shiftright(x, 1)).bitwiseAND(F.lit(0x55555555))
    ).bitwiseAND(F.lit(1))
    out = []
    for r in range(height):
        par = F.bit_count(x.bitwiseAND(F.lit(int(fam.S[r])))).bitwiseAND(F.lit(1))
        bit = par.bitwiseXOR(nonlin).bitwiseXOR(F.lit(int(fam.s0[r])))
        out.append((bit * F.lit(2) - F.lit(1)).cast("long"))
    return out


_M32 = 0xFFFFFFFF


def _slit(v: int):
    """64-bit literal with two's-complement reinterpretation (F.lit rejects
    ints ≥ 2^63)."""
    v &= 0xFFFFFFFFFFFFFFFF
    return F.lit(v - (1 << 64) if v >= (1 << 63) else v)


def _wrap_add_const(x, c: int):
    """(x + c) mod 2^64 on a long Column, ANSI-safe: 32-bit lane adds (every
    intermediate < 2^35), recombined with wrapping bitwise shifts."""
    lo = x.bitwiseAND(F.lit(_M32)) + F.lit(c & _M32)
    hi = (F.shiftrightunsigned(x, 32) + F.lit((c >> 32) & _M32)
          + F.shiftrightunsigned(lo, 32))
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(F.lit(_M32)))


def _wrap_mul_const(x, c: int):
    """(x × c) mod 2^64 on a long Column, ANSI-safe: 16-bit limbs of x times
    16-bit limbs of c — every product < 2^32, every lane sum < 2^36 — then
    lane recombination. ~30 codegen ops; the price of exact unsigned
    arithmetic under ANSI mode."""
    xs = [x.bitwiseAND(F.lit(0xFFFF))] + [
        F.shiftrightunsigned(x, 16 * i).bitwiseAND(F.lit(0xFFFF))
        for i in range(1, 4)]
    cs = [(c >> (16 * j)) & 0xFFFF for j in range(4)]
    # S_s = Σ_{i+j=s} x_i·c_j  (only s ≤ 3 survives mod 2^64)
    S = []
    for s_ in range(4):
        terms = [xs[i] * F.lit(cs[s_ - i]) for i in range(s_ + 1) if cs[s_ - i]]
        S.append(sum(terms[1:], terms[0]) if terms else None)
    lo = F.lit(0)
    hi = F.lit(0)
    if S[0] is not None:
        lo = S[0].bitwiseAND(F.lit(_M32))
        hi = F.shiftrightunsigned(S[0], 32)
    if S[1] is not None:
        lo = lo + S[1].bitwiseAND(F.lit(0xFFFF)) * F.lit(1 << 16)
        hi = hi + F.shiftrightunsigned(S[1], 16)
    if S[2] is not None:
        hi = hi + S[2]
    if S[3] is not None:
        hi = hi + S[3].bitwiseAND(F.lit(0xFFFF)) * F.lit(1 << 16)
    hi = hi + F.shiftrightunsigned(lo, 32)
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(F.lit(_M32)))


def splitmix64_expr(col, seed: int):
    """``hashing.hash64`` (seeded SplitMix64 finalizer) as a pure Column
    expression — bit-exact with the numpy kernel (tested on random vectors)."""
    x = col.bitwiseXOR(_slit(seed))
    x = _wrap_add_const(x, 0x9E3779B97F4A7C15)
    x = _wrap_mul_const(x.bitwiseXOR(F.shiftrightunsigned(x, 30)),
                        0xBF58476D1CE4E5B9)
    x = _wrap_mul_const(x.bitwiseXOR(F.shiftrightunsigned(x, 27)),
                        0x94D049BB133111EB)
    return x.bitwiseXOR(F.shiftrightunsigned(x, 31))


def with_hll_registers(df: DataFrame, column: str, log_reg_num: int, seed: int,
                       idx_name: str, rank_name: str) -> DataFrame:
    """Add (register index, rank) columns matching ``HyperLogLog.precompute``:
    idx = top ``log_reg_num`` hash bits; rank = trailing-zeros(low bits) + 1
    capped at 64 − log_reg_num + 1. Trailing zeros are exact integer ops:
    ``bit_count(lowest_set_bit − 1)`` — no floating point.

    The hash is STAGED through intermediate columns rather than composed as
    one Column: ``_wrap_mul_const`` references its argument 7×, so nesting
    the two multiplies plus the idx/low/lsb reuse textually multiplies the
    expression tree ~7³× — big enough to OOM the codegen's subexpression
    elimination. Materialized intermediates are plain attributes; Catalyst
    keeps the stages because it refuses to collapse projections that would
    duplicate non-cheap multi-referenced expressions (SPARK-36718)."""
    p = int(log_reg_num)
    t = f"__smx_{idx_name}"
    x = F.col(column)
    d = df.withColumn(t, _wrap_add_const(x.bitwiseXOR(_slit(seed)),
                                         0x9E3779B97F4A7C15))
    c = F.col(t)
    d = d.withColumn(t, _wrap_mul_const(
        c.bitwiseXOR(F.shiftrightunsigned(c, 30)), 0xBF58476D1CE4E5B9))
    d = d.withColumn(t, _wrap_mul_const(
        c.bitwiseXOR(F.shiftrightunsigned(c, 27)), 0x94D049BB133111EB))
    d = d.withColumn(t, c.bitwiseXOR(F.shiftrightunsigned(c, 31)))
    low = f"__low_{idx_name}"
    d = d.withColumn(idx_name, F.shiftrightunsigned(c, 64 - p))
    d = d.withColumn(low, c.bitwiseAND(F.lit((1 << (64 - p)) - 1)))
    lo = F.col(low)
    lsb = lo.bitwiseAND(F.bitwise_not(lo) + F.lit(1))
    d = d.withColumn(rank_name,
                     F.when(lo == 0, F.lit(64 - p + 1))
                     .otherwise(F.bit_count(lsb - F.lit(1)) + F.lit(1)))
    return d.drop(t, low)


def _key_is_integer(df: DataFrame, column: str) -> bool:
    for f in df.schema.fields:
        if f.name == column:
            return f.dataType.simpleString() in _INT_TYPES
    return False


def _key_is_numeric(df: DataFrame, column: str) -> bool:
    for f in df.schema.fields:
        if f.name == column:
            return (f.dataType.simpleString() in _INT_TYPES
                    or f.dataType.simpleString() in ("float", "double"))
    return False


def equiwidth_cell_expr(col, lower: float, upper: float, nb: int, offset: int):
    """Equi-width bucket index as a Column, replicating numpy's uniform-bin
    histogram EXACTLY (``np.histogram`` fast path): scaled multiply, cast,
    then the two boundary corrections against the ``linspace`` edges — the
    edge doubles are baked in as literals, so float behavior is identical
    to the kernel's ``np.histogram`` call. NULL (→ dropped by
    ``array_compact``) for NaN/out-of-range, mirroring the kernel's silent
    drop (``EquiWidthHistogram.java:49-52``)."""
    x = col.cast("double")
    edges = np.linspace(lower, upper, nb + 1)
    earr = F.array(*[F.lit(float(e)) for e in edges])
    # numpy 1.26 _histogram: ((x - first) / norm_denom) * norm_numerator —
    # divide THEN multiply, same double ops in the same order
    idx0 = (((x - F.lit(float(lower))) / F.lit(float(upper - lower)))
            * F.lit(float(nb))).cast("int")
    idx1 = F.when(idx0 == nb, F.lit(nb - 1)).otherwise(idx0)
    idx2 = F.when(x < F.element_at(earr, idx1 + 1), idx1 - 1).otherwise(idx1)
    idx3 = F.when((x >= F.element_at(earr, idx2 + 2)) & (idx2 != nb - 1),
                  idx2 + 1).otherwise(idx2)
    # Spark sorts NaN above all doubles, so NaN fails x < upper and drops.
    # Dropped rows emit the SENTINEL cell (local id 0) instead of nothing:
    # the kernel still materializes an all-zero histogram for a window whose
    # rows are all out-of-range (the group exists before the filter), so the
    # SQL path must keep the group alive too; the sentinel carries no count.
    in_range = x.isNotNull() & (x >= float(lower)) & (x < float(upper))
    return (F.when(in_range, idx3.cast("long") + F.lit(offset + 2))
            .otherwise(F.lit(offset + 1)))


def _cell_exprs(col, spec: SynopsisSpec, width: int, height: int, seed: int,
                offset: int) -> list:
    """Pack (row, bucket, sign) into ONE signed long per cell:

        cell = sign × (offset + row·width + bucket + 1)

    so the hot aggregation is a plain count over a single long group key —
    measured ~10% over (r, b) struct keys; the ± split falls out of the key
    (opposite-sign hits on the same (r, b) form two groups that the assembly
    scatter re-combines), and ``offset`` disambiguates sketches in a
    shared-scan multi-build."""
    buckets = h3_bucket_exprs(col, height, seed, width)
    if spec.kind == "ams":
        signs = eh3_sign_exprs(col, height, seed)
        return [((buckets[r] + F.lit(offset + r * width + 1)).cast("long")
                 * signs[r]) for r in range(height)]
    return [(buckets[r] + F.lit(offset + r * width + 1)).cast("long")
            for r in range(height)]


_SQL_KINDS = ("countmin", "ams", "hll", "equiwidth", "equiwidth4lt", "bloom")


def _validate_spec(df: DataFrame, spec: SynopsisSpec) -> None:
    if spec.kind not in _SQL_KINDS:
        raise ValueError(f"SQL build supports {'/'.join(_SQL_KINDS)}, "
                         f"not {spec.kind}")
    if spec.kind in ("equiwidth", "equiwidth4lt"):
        if not _key_is_numeric(df, spec.column):
            raise ValueError(f"column {spec.column!r} is not numeric")
    elif not _key_is_integer(df, spec.column):
        raise ValueError(
            f"column {spec.column!r} is not integer-typed; string keys hash "
            "through pandas siphash (no JVM equivalent) — use build_batch")


# cells per row and packed-id space per synopsis kind:
#   countmin/ams — height cells/row, ids in (0, height·width]
#   hll          — 1 cell/row: id = idx·65 + rank (rank ≤ 61 < 65), so a
#                  (register, rank) pair groups under ONE count key and the
#                  register max is taken at assembly — max folds into the
#                  same count aggregation the linear sketches use
#   equiwidth    — 1 cell/row: id = bucket + 2, or the sentinel id 1 for
#                  dropped (NaN / out-of-range) rows, which keeps the
#                  (window, stratum) group alive without counting
#   bloom        — k cells/row (bit positions); bit set iff count > 0
def _cell_space(proto) -> int:
    if proto.KIND == "hll":
        return proto.m * 65
    if proto.KIND in ("equiwidth", "equiwidth4lt"):
        # 4LT keeps the exact fine bins as its streaming state and only
        # compresses at serialization, so it shares the equi-width cell model
        return proto.num_buckets + 1
    if proto.KIND == "bloom":
        return proto.n_bits
    return proto.width * proto.height


def _cells_per_row(proto) -> int:
    if proto.KIND in ("hll", "equiwidth", "equiwidth4lt"):
        return 1
    if proto.KIND == "bloom":
        return proto.k
    return proto.height


def _attach_cells(work: DataFrame, specs, protos, offsets, keep: list):
    """Compute every spec's packed cell ids as ``__c0..__cN`` columns in a
    standalone Project (plus SplitMix64 staging for HLL), returning
    ``(df[keep + __c*], n_cells)``.

    The cells are evaluated in a Project and ONLY attribute refs reach the
    downstream explode. Inlining the hash expressions into the Generate
    fuses every element_at chain into ONE codegen method that blows past
    HotSpot's 8000-byte JIT threshold (DontCompileHugeMethods) → the whole
    hot loop runs bytecode-interpreted (measured 13x on the AMS shape)."""
    cells = []
    for i, (spec, proto) in enumerate(zip(specs, protos)):
        off = int(offsets[i])
        if spec.kind == "hll":
            work = with_hll_registers(work, f"__v{i}", proto.log_reg_num,
                                      proto.seed, f"__idx{i}", f"__rank{i}")
            cells.append(F.lit(off) + F.col(f"__idx{i}") * F.lit(65)
                         + F.col(f"__rank{i}"))
        elif spec.kind in ("equiwidth", "equiwidth4lt"):
            # proto geometry (4LT pads num_buckets to a multiple of 8 and
            # widens upper accordingly) — use the proto's values, not params
            cells.append(equiwidth_cell_expr(F.col(f"__v{i}"), proto.lower,
                                             proto.upper, proto.num_buckets,
                                             off))
        elif spec.kind == "bloom":
            # distributed bit-OR only matches union merge; the reference's
            # intersect-merge quirk is partition-dependent by construction
            if proto.merge_mode != "union":
                raise ValueError('SQL bloom build requires merge_mode="union"')
            cells.extend([
                (b + F.lit(off + 1)).cast("long")
                for b in h3_bucket_exprs(F.col(f"__v{i}"), proto.k,
                                         proto.seed, proto.n_bits)])
        else:
            cells.extend(_cell_exprs(F.col(f"__v{i}"), spec, proto.width,
                                     proto.height, proto.seed, off))
    return (work.select(*keep, *[c.alias(f"__c{j}") for j, c in enumerate(cells)]),
            len(cells))


def _explode_cells(ncells: int):
    # array_compact drops NULL cells (equiwidth's out-of-range/NaN rows)
    return F.explode(F.array_compact(
        F.array(*[F.col(f"__c{j}") for j in range(ncells)]))).alias("cell")


def _assemble_sketches(specs, offsets, bounds, pdf: pd.DataFrame):
    """Scatter a (cell, m) frame into one synopsis per spec; yields
    ``(spec_id, blob_bytes, n_processed)`` for specs with any cells."""
    cell = pdf["cell"].to_numpy()
    m = pdf["m"].to_numpy()
    idx = np.abs(cell) - 1
    which = np.searchsorted(bounds, idx, side="right")
    for i, spec in enumerate(specs):
        sel = which == i
        if not sel.any():
            continue
        spec.ensure_registered()
        syn = spec.make_synopsis()
        local = idx[sel] - int(offsets[i])
        if spec.kind == "hll":
            # local = register·65 + (rank − 1) → unpack and take the
            # register-wise max (the groupBy counted (idx, rank) pairs)
            np.maximum.at(syn.registers, local // 65,
                          (local % 65 + 1).astype(np.uint8))
        elif spec.kind in ("equiwidth", "equiwidth4lt"):
            real = local >= 1  # local 0 = dropped-row sentinel, no count
            np.add.at(syn.frequency, local[real] - 1, m[sel][real])
            syn.n_processed = int(m[sel][real].sum())
            yield i, syn.to_bytes(), syn.n_processed
            continue
        elif spec.kind == "bloom":
            syn.bits[local] = True
        else:
            flat = np.zeros(syn.height * syn.width, dtype=np.int64)
            np.add.at(flat, local, np.sign(cell[sel]) * m[sel])
            syn.counts = flat.reshape(syn.height, syn.width)
        syn.n_processed = int(m[sel].sum()) // _cells_per_row(syn)
        yield i, syn.to_bytes(), syn.n_processed


def _member_windows(win):
    """Window starts containing each slice (relational slice->windows
    expansion, shared by every sliding SQL builder): for slice start s,
    the member windows are the arithmetic sequence from the first window
    whose span covers s to the last window starting at or before s."""
    slide, size, sl = win.slide_us, win.size_us, win.slice_us
    first_w = (-F.floor((F.lit(size) - F.lit(sl) - F.col("__slice"))
                        / F.lit(slide)) * F.lit(slide)).cast("long")
    last_w = (F.floor(F.col("__slice") / F.lit(slide))
              * F.lit(slide)).cast("long")
    return F.when(first_w <= last_w,
                  F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                  ).otherwise(F.array().cast("array<long>"))


def _build_sql(df: DataFrame, specs: list[SynopsisSpec]) -> DataFrame:
    win = specs[0].window or GlobalWindow()
    for spec in specs:
        _validate_spec(df, spec)
        if (spec.window or GlobalWindow()) != win \
                or spec.ts_column != specs[0].ts_column \
                or spec.stratify_by != specs[0].stratify_by:
            raise ValueError("SQL multi-build specs must share window/ts/strata")
    if isinstance(win, GlobalWindow):
        slice_us, size_us = None, 0
    elif isinstance(win, (Tumbling, Sliding)):
        slice_us, size_us = win.slice_us, win.size_us
    else:
        raise ValueError(f"unsupported window {win} for the SQL path")

    protos = [spec.make_synopsis() for spec in specs]
    offsets = np.concatenate([[0], np.cumsum([_cell_space(p) for p in protos])])

    s0 = specs[0]
    cols = [F.col(spec.column).alias(f"__v{i}") for i, spec in enumerate(specs)]
    if s0.ts_column:
        cols.append(F.unix_micros(F.col(s0.ts_column).cast("timestamp")).alias("__ts"))
    else:
        cols.append(F.lit(0).cast("long").alias("__ts"))
    if s0.stratify_by:
        cols.append(F.col(s0.stratify_by).cast("string").alias("__st"))
    work = df.select(*cols)
    if slice_us is not None:
        work = work.withColumn(
            "__slice", (F.floor(F.col("__ts") / F.lit(slice_us)) * F.lit(slice_us)))
    else:
        work = work.withColumn("__slice", F.lit(0).cast("long"))
    work = _rescale_degenerate(work)

    work, ncells = _attach_cells(work, specs, protos, offsets,
                                 keep=(["__slice", "__st"] if s0.stratify_by
                                       else ["__slice"]))
    # the constant stratum is NOT carried through the hot aggregation when
    # unstratified — hashing an extra (empty-string) key per probe is pure
    # overhead; it is re-attached after the heavy aggs
    grp = ["__slice", "__st"] if s0.stratify_by else ["__slice"]
    # one shuffle: partial agg collapses each task to ≤ slices×strata×Σ(h×w)
    # cells — independent of row count, the blob path's scale property
    agg = (work.select(*grp, _explode_cells(ncells))
           .groupBy(*grp, "cell")
           .agg(F.count(F.lit(1)).alias("m")))

    if isinstance(win, Sliding):
        slide, size, sl = win.slide_us, win.size_us, win.slice_us
        # identical window-expansion algebra to build_batch (builder.py:267-278)
        wins = _member_windows(win)
        agg = (agg.withColumn("__w", F.explode(wins))
               .groupBy("__w", *grp[1:], "cell")
               .agg(F.sum("m").alias("m")))
    else:
        agg = agg.withColumnRenamed("__slice", "__w")
    if not s0.stratify_by:
        agg = agg.withColumn("__st", F.lit(""))

    bounds = offsets[1:-1]  # np.searchsorted bin edges between sketches

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        w = int(key[0])
        out = [(i, pd.Timestamp(w, unit="us"),
                pd.Timestamp(w + size_us, unit="us") if size_us else
                pd.Timestamp(w, unit="us"),
                key[1], blob, n)
               for i, blob, n in _assemble_sketches(specs, offsets, bounds, pdf)]
        return pd.DataFrame(out, columns=["spec_id", "window_start", "window_end",
                                          "stratum", "state", "n"])

    return (agg.groupBy("__w", "__st")
            .applyInPandas(assemble, schema="spec_id int, " + _FINAL_SCHEMA))


def build_sketch_sql(df: DataFrame, spec: SynopsisSpec) -> DataFrame:
    """JVM-expression build for ``kind in {"countmin", "ams", "hll",
    "equiwidth"}`` over an integer (numeric for equiwidth) key column. Output rows and blob bytes are identical to
    ``build_batch(df, spec)`` (asserted in ``tests/test_sqlbuild.py``)."""
    return _build_sql(df, [spec]).drop("spec_id")


def build_sketch_sql_many(df: DataFrame, specs: list[SynopsisSpec]) -> DataFrame:
    """Shared-scan SQL multi-build: N countmin/ams/hll sketches from ONE pass
    and ONE shuffle — ``build_batch_many``'s contract (leading ``spec_id``
    column), with the whole hash→scatter→merge pipeline in codegen."""
    return _build_sql(df, specs)


def build_bottomk_sql(df: DataFrame, spec: SynopsisSpec) -> DataFrame:
    """Bottom-k distinct sampler as a rank-limited window query.

    The sampler's state IS "the k smallest (priority, value) pairs per
    (window, stratum)", which Spark answers natively:
    ``row_number() over (partition by window, stratum order by priority,
    value) <= k``. Spark ≥3.5 plans the filter as **WindowGroupLimit** —
    each map task keeps only its local top-k before the shuffle, so shuffle
    volume is O(partitions × k), not O(rows) (asserted on the plan in
    ``tests/test_sqlbuild.py``). This is the same communication bound as
    the kernel path's partial samplers, with the per-row Python replaced by
    codegen comparisons.

    Priorities: ``spec.priority_column`` (any orderable type — e.g. the
    driver's JVM ``F.md5`` hex) or, when absent, the kernel's default
    seeded SplitMix64 of the integer key — computed with the same staged
    limb arithmetic as HLL and ordered UNSIGNED via a sign-bit flip.
    Output rows and blob bytes match ``build_batch`` exactly: the k
    survivors are the same rows, and assembly feeds them through the
    kernel's own canonicalizing ``update_batch``.
    """
    from pyspark.sql import Window
    from .builder import _normalize

    if spec.kind != "bottomk":
        raise ValueError(f"build_bottomk_sql needs kind='bottomk', not {spec.kind}")
    if spec.priority_column is None and not _key_is_integer(df, spec.column):
        raise ValueError("default-hash bottomk needs an integer key column; "
                         "provide priority_column for other types")
    win = spec.window or GlobalWindow()
    if isinstance(win, GlobalWindow):
        slice_us, size_us = None, 0
    elif isinstance(win, (Tumbling, Sliding)):
        slice_us, size_us = win.slice_us, win.size_us
    else:
        raise ValueError(f"unsupported window {win} for the SQL path")

    proto = spec.make_synopsis()
    k, seed = proto.sample_size, proto.seed
    work = _rescale_degenerate(_normalize(df, spec, slice_us))
    hashed = spec.priority_column is None
    if hashed:
        t = "__smx_p"
        x = F.col("__v")
        work = work.withColumn(t, _wrap_add_const(x.bitwiseXOR(_slit(seed)),
                                                  0x9E3779B97F4A7C15))
        c = F.col(t)
        work = work.withColumn(t, _wrap_mul_const(
            c.bitwiseXOR(F.shiftrightunsigned(c, 30)), 0xBF58476D1CE4E5B9))
        work = work.withColumn(t, _wrap_mul_const(
            c.bitwiseXOR(F.shiftrightunsigned(c, 27)), 0x94D049BB133111EB))
        work = work.withColumn("__prio", c.bitwiseXOR(F.shiftrightunsigned(c, 31))).drop(t)
        # unsigned order on a signed long = order after flipping the sign bit
        ordc = F.col("__prio").bitwiseXOR(_slit(1 << 63))
    else:
        ordc = F.col("__prio")

    def topk_and_counts(frame, keys):
        w = Window.partitionBy(*keys).orderBy(ordc.asc(), F.col("__v").asc())
        top = (frame.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= k).drop("__rn"))
        cnt = frame.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        return top, cnt

    if isinstance(win, Sliding):
        slide, size, sl = win.slide_us, win.size_us, win.slice_us
        wins = _member_windows(win)
        # slice-level top-k first (bounds the expansion), then re-rank per window
        top_s, cnt_s = topk_and_counts(work, ["__slice", "__st"])
        expanded = top_s.withColumn("__w", F.explode(wins))
        w2 = Window.partitionBy("__w", "__st").orderBy(ordc.asc(), F.col("__v").asc())
        top = (expanded.withColumn("__rn", F.row_number().over(w2))
               .where(F.col("__rn") <= k).drop("__rn"))
        cnt = (cnt_s.withColumn("__w", F.explode(wins))
               .groupBy("__w", "__st").agg(F.sum("__n").alias("__n")))
    else:
        top, cnt = topk_and_counts(work, ["__slice", "__st"])
        top = top.withColumnRenamed("__slice", "__w")
        cnt = cnt.withColumnRenamed("__slice", "__w")

    joined = top.join(F.broadcast(cnt), ["__w", "__st"])

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        spec.ensure_registered()
        syn = spec.make_synopsis()
        prio = pdf["__prio"].to_numpy()
        if hashed:
            prio = prio.astype(np.uint64)  # two's-complement reinterpret
        syn.update_batch(pdf["__v"].to_numpy(), priorities=prio)
        syn.n_processed = int(pdf["__n"].iloc[0])
        w = int(key[0])
        return pd.DataFrame({
            "window_start": [pd.Timestamp(w, unit="us")],
            "window_end": [pd.Timestamp(w + size_us, unit="us") if size_us else
                           pd.Timestamp(w, unit="us")],
            "stratum": [key[1]],
            "state": [syn.to_bytes()],
            "n": [syn.n_processed],
        })

    return joined.groupBy("__w", "__st").applyInPandas(assemble, schema=_FINAL_SCHEMA)


def build_kmv_sql(df: DataFrame, spec: SynopsisSpec) -> DataFrame:
    """KMV distinct sketch as a rank-limited window query over JVM hashes.

    The sketch state IS "the k smallest DISTINCT splitmix64 hash values per
    (window, stratum)" — a purely relational expression: staged limb hash
    (the same Column stages as ``with_hll_registers`` — one composed
    expression would blow up codegen's subexpression elimination), then
    DISTINCT, then ``row_number() over (order by hash unsigned) <= k``.
    Spark >= 3.5 plans the rank filter as **WindowGroupLimit**: each map
    task keeps only its local k before the shuffle, so shuffle volume is
    O(partitions × k) — the same communication bound as the kernel path's
    partial blobs, with zero Python before assembly. Assembly writes the
    kernel's canonical state DIRECTLY (sorted uint64 mins + the group's
    pre-distinct row count): blob bytes identical to ``build_batch``
    (asserted in ``tests/test_sqlbuild.py``).

    Sliding windows: slice-level distinct top-k first (bounds the
    expansion), explode into member windows, per-window DISTINCT again
    (the same hash can survive from two slices of one window), re-rank.
    """
    from pyspark.sql import Window
    from .builder import _normalize

    if spec.kind != "kmv":
        raise ValueError(f"build_kmv_sql needs kind='kmv', not {spec.kind}")
    if not _key_is_integer(df, spec.column):
        raise ValueError("SQL kmv build needs an integer key column")
    win = spec.window or GlobalWindow()
    if isinstance(win, GlobalWindow):
        slice_us, size_us = None, 0
    elif isinstance(win, (Tumbling, Sliding)):
        slice_us, size_us = win.slice_us, win.size_us
    else:
        raise ValueError(f"unsupported window {win} for the SQL path")

    proto = spec.make_synopsis()
    k, seed = proto.k, proto.seed
    work = _rescale_degenerate(_normalize(df, spec, slice_us))
    t = "__smx_kmv"
    x = F.col("__v")
    work = work.withColumn(t, _wrap_add_const(x.bitwiseXOR(_slit(seed)),
                                              0x9E3779B97F4A7C15))
    c = F.col(t)
    work = work.withColumn(t, _wrap_mul_const(
        c.bitwiseXOR(F.shiftrightunsigned(c, 30)), 0xBF58476D1CE4E5B9))
    work = work.withColumn(t, _wrap_mul_const(
        c.bitwiseXOR(F.shiftrightunsigned(c, 27)), 0x94D049BB133111EB))
    work = work.withColumn("__h", c.bitwiseXOR(F.shiftrightunsigned(c, 31))).drop(t)
    # unsigned order on a signed long = order after flipping the sign bit
    ordc = F.col("__h").bitwiseXOR(_slit(1 << 63))

    def topk_and_counts(frame, keys):
        w = Window.partitionBy(*keys).orderBy(ordc.asc())
        top = (frame.select(*keys, "__h").distinct()
               .withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= k).drop("__rn"))
        cnt = frame.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        return top, cnt

    if isinstance(win, Sliding):
        slide, size, sl = win.slide_us, win.size_us, win.slice_us
        wins = _member_windows(win)
        top_s, cnt_s = topk_and_counts(work, ["__slice", "__st"])
        expanded = (top_s.withColumn("__w", F.explode(wins))
                    .select("__w", "__st", "__h").distinct())
        w2 = Window.partitionBy("__w", "__st").orderBy(ordc.asc())
        top = (expanded.withColumn("__rn", F.row_number().over(w2))
               .where(F.col("__rn") <= k).drop("__rn"))
        cnt = (cnt_s.withColumn("__w", F.explode(wins))
               .groupBy("__w", "__st").agg(F.sum("__n").alias("__n")))
    else:
        top, cnt = topk_and_counts(work, ["__slice", "__st"])
        top = top.withColumnRenamed("__slice", "__w")
        cnt = cnt.withColumnRenamed("__slice", "__w")

    joined = top.join(F.broadcast(cnt), ["__w", "__st"])

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        spec.ensure_registered()
        syn = spec.make_synopsis()
        h = pdf["__h"].to_numpy().astype(np.int64).astype(np.uint64)
        syn.mins = np.sort(h)
        syn.n_processed = int(pdf["__n"].iloc[0])
        w = int(key[0])
        return pd.DataFrame({
            "window_start": [pd.Timestamp(w, unit="us")],
            "window_end": [pd.Timestamp(w + size_us, unit="us") if size_us else
                           pd.Timestamp(w, unit="us")],
            "stratum": [key[1]],
            "state": [syn.to_bytes()],
            "n": [syn.n_processed],
        })

    return joined.groupBy("__w", "__st").applyInPandas(assemble, schema=_FINAL_SCHEMA)


def build_fifo_sql(df: DataFrame, spec: SynopsisSpec) -> DataFrame:
    """FiFo sampler ("newest k by event time") as a rank-limited window
    query: ``row_number() over (order by ts DESC, tiebreak DESC) <= k`` —
    the same WindowGroupLimit pushdown as ``build_bottomk_sql``.

    Requires ``tiebreak_column`` (the kernel's arrival-order default has no
    SQL equivalent — arrival order is not a distributed concept). Assembly
    passes the k survivors to the kernel ascending by (ts, tiebreak), which
    is exactly the kernel's trimmed state order, so blobs are
    byte-identical whenever the window actually trims (> k rows); for
    windows with ≤ k rows the kernel keeps arrival order and only the row
    MULTISET is guaranteed equal."""
    from pyspark.sql import Window
    from .builder import _normalize

    if spec.kind != "fifo":
        raise ValueError(f"build_fifo_sql needs kind='fifo', not {spec.kind}")
    if not spec.ts_column or not spec.tiebreak_column:
        raise ValueError("SQL fifo build needs ts_column and tiebreak_column")
    win = spec.window or GlobalWindow()
    if isinstance(win, GlobalWindow):
        slice_us, size_us = None, 0
    elif isinstance(win, (Tumbling, Sliding)):
        slice_us, size_us = win.slice_us, win.size_us
    else:
        raise ValueError(f"unsupported window {win} for the SQL path")

    k = spec.make_synopsis().sample_size
    work = _rescale_degenerate(_normalize(df, spec, slice_us))
    order = [F.col("__ts").desc(), F.col("__tb").desc()]

    def topk_and_counts(frame, keys):
        w = Window.partitionBy(*keys).orderBy(*order)
        top = (frame.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= k).drop("__rn"))
        cnt = frame.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        return top, cnt

    if isinstance(win, Sliding):
        slide, size, sl = win.slide_us, win.size_us, win.slice_us
        wins = _member_windows(win)
        top_s, cnt_s = topk_and_counts(work, ["__slice", "__st"])
        expanded = top_s.withColumn("__w", F.explode(wins))
        w2 = Window.partitionBy("__w", "__st").orderBy(*order)
        top = (expanded.withColumn("__rn", F.row_number().over(w2))
               .where(F.col("__rn") <= k).drop("__rn"))
        cnt = (cnt_s.withColumn("__w", F.explode(wins))
               .groupBy("__w", "__st").agg(F.sum("__n").alias("__n")))
    else:
        top, cnt = topk_and_counts(work, ["__slice", "__st"])
        top = top.withColumnRenamed("__slice", "__w")
        cnt = cnt.withColumnRenamed("__slice", "__w")

    joined = top.join(F.broadcast(cnt), ["__w", "__st"])

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        spec.ensure_registered()
        syn = spec.make_synopsis()
        pdf = pdf.sort_values(["__ts", "__tb"], kind="stable")
        syn.update_batch(pdf["__v"].to_numpy(),
                         ts=pdf["__ts"].to_numpy(),
                         tiebreak=pdf["__tb"].to_numpy())
        syn.n_processed = int(pdf["__n"].iloc[0])
        w = int(key[0])
        return pd.DataFrame({
            "window_start": [pd.Timestamp(w, unit="us")],
            "window_end": [pd.Timestamp(w + size_us, unit="us") if size_us else
                           pd.Timestamp(w, unit="us")],
            "stratum": [key[1]],
            "state": [syn.to_bytes()],
            "n": [syn.n_processed],
        })

    return joined.groupBy("__w", "__st").applyInPandas(assemble, schema=_FINAL_SCHEMA)


class StreamingSketchSQLJob:
    """Synopsis maintenance as NATIVE Structured Streaming aggregation state.

    The batch SQL path's insight — a hash sketch is a count over packed cell
    ids — makes the sketch *incrementally maintainable by Spark's own
    streaming aggregation*: ``withWatermark → project cells → explode →
    groupBy(window, cell).count()`` in append mode. The streaming state
    store (HDFS/RocksDB-backed, checkpointed, bounded at
    O(open windows × strata × cells)) IS the sketch state — the closest
    Spark-native analogue of the reference's Flink operator state
    (``flinkScottyConnector/.../SynopsisAggregator.java``), with event-time
    watermark correctness, late-row handling, and exactly-once emission
    handled by the engine rather than hand-written keyed-state code
    (contrast ``stateful.StatefulSynopsisStream``, the applyInPandasWithState
    formulation of the same build).

    When the watermark closes a window, all its cells emit in one
    micro-batch; ``foreachBatch`` assembles them into canonical blobs
    (byte-identical to ``build_batch`` on the same closed rows — asserted in
    ``tests/test_sqlbuild.py``) and writes an idempotent ``batch=<id>``
    parquet dir, so replays after a crash rewrite rather than duplicate.

    Tumbling and sliding windows map onto ``F.window(ts, size[, slide])``,
    whose window algebra matches the batch slice expansion exactly.
    """

    def __init__(self, specs: list[SynopsisSpec] | SynopsisSpec,
                 watermark_delay: str = "1 hour"):
        self.specs = [specs] if isinstance(specs, SynopsisSpec) else list(specs)
        self.watermark_delay = watermark_delay
        s0 = self.specs[0]
        win = s0.window
        if not isinstance(win, (Tumbling, Sliding)):
            raise ValueError("streaming SQL build needs a Tumbling/Sliding window")
        if not s0.ts_column:
            raise ValueError("streaming SQL build needs ts_column")
        for s in self.specs:
            if s.kind not in _SQL_KINDS:
                raise ValueError(f"SQL build supports {'/'.join(_SQL_KINDS)}, "
                                 f"not {s.kind}")
            if (s.window != win or s.ts_column != s0.ts_column
                    or s.stratify_by != s0.stratify_by):
                raise ValueError("streaming SQL specs must share window/ts/strata")
        self.size_us = win.size_us
        self.slide_us = win.slide_us if isinstance(win, Sliding) else None

    def transform(self, reader: DataFrame) -> DataFrame:
        specs = self.specs
        s0 = specs[0]
        for spec in specs:
            _validate_spec(reader, spec)
        protos = [spec.make_synopsis() for spec in specs]
        offsets = np.concatenate([[0],
                                  np.cumsum([_cell_space(p) for p in protos])])
        cols = [F.col(spec.column).alias(f"__v{i}")
                for i, spec in enumerate(specs)]
        cols.append(F.col(s0.ts_column).cast("timestamp").alias("__t"))
        if s0.stratify_by:
            cols.append(F.col(s0.stratify_by).cast("string").alias("__st"))
        grp = ["__st"] if s0.stratify_by else []
        work = reader.select(*cols).withWatermark("__t", self.watermark_delay)
        work, ncells = _attach_cells(work, specs, protos, offsets,
                                     keep=["__t"] + grp)
        win = (F.window("__t", f"{self.size_us} microseconds")
               if self.slide_us is None else
               F.window("__t", f"{self.size_us} microseconds",
                        f"{self.slide_us} microseconds"))
        return (work.select("__t", *grp, _explode_cells(ncells))
                .groupBy(win.alias("__win"), *grp, "cell")
                .agg(F.count(F.lit(1)).alias("m")))

    def _sink(self, out_dir: str):
        specs = self.specs
        protos = [spec.make_synopsis() for spec in specs]
        offsets = np.concatenate([[0],
                                  np.cumsum([_cell_space(p) for p in protos])])
        bounds = offsets[1:-1]
        stratified = bool(specs[0].stratify_by)

        def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            out = [(i, key[0], key[1], key[2] if stratified else "", blob, n)
                   for i, blob, n in
                   _assemble_sketches(specs, offsets, bounds, pdf)]
            return pd.DataFrame(out, columns=["spec_id", "window_start",
                                              "window_end", "stratum",
                                              "state", "n"])

        def process(bdf: DataFrame, batch_id: int) -> None:
            rows = bdf.select(F.col("__win.start").alias("__ws"),
                              F.col("__win.end").alias("__we"),
                              *(["__st"] if stratified else []),
                              "cell", "m")
            keys = ["__ws", "__we"] + (["__st"] if stratified else [])
            out = rows.groupBy(*keys).applyInPandas(
                assemble, schema="spec_id int, " + _FINAL_SCHEMA)
            out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

        return process

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True, transform=None):
        if schema is None:
            schema = spark.read.parquet(source_dir).schema
        reader = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files_per_trigger)
                  .parquet(source_dir))
        if transform is not None:
            reader = transform(reader)
        writer = (self.transform(reader).writeStream
                  .foreachBatch(self._sink(out_dir))
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("append"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    @staticmethod
    def read_output(spark, out_dir: str) -> DataFrame:
        """Assembled synopsis rows across all batch dirs (build_batch_many
        schema: spec_id + window/stratum/state/n)."""
        return (spark.read.parquet(out_dir)
                .select("spec_id", "window_start", "window_end", "stratum",
                        "state", "n"))


def build_mg_sql(df: DataFrame, spec: SynopsisSpec) -> DataFrame:
    """Misra-Gries (exact regime) as a relational count table.

    In the oversized-capacity regime — the only one whose state is
    partition-order-independent (synopsis/mg.py) — the MG summary IS
    "count(*) per (window, stratum, key)": a plain partially-aggregated
    GROUP BY, zero Python before the O(windows)-row blob assembly, which
    writes the kernel's canonical sorted-key state directly (blob bytes
    identical to ``build_batch``, asserted in tests/test_sqlbuild.py).
    A window whose distinct-key count exceeds ``capacity`` CANNOT be
    represented this way (the kernel would have decremented); assembly
    fails loudly rather than fabricating a trimmed state whose counter
    values depend on an order the relational form does not have.

    Sliding windows: per-slice counts explode into member windows and
    sum — counter addition is exactly the kernel's no-trim merge.
    """
    from .builder import _normalize

    if spec.kind != "mg":
        raise ValueError(f"build_mg_sql needs kind='mg', not {spec.kind}")
    win = spec.window or GlobalWindow()
    if isinstance(win, GlobalWindow):
        slice_us, size_us = None, 0
    elif isinstance(win, (Tumbling, Sliding)):
        slice_us, size_us = win.slice_us, win.size_us
    else:
        raise ValueError(f"unsupported window {win} for the SQL path")

    proto = spec.make_synopsis()
    cap = proto.capacity
    int_key = _key_is_numeric(df, spec.column)
    work = _rescale_degenerate(_normalize(df, spec, slice_us))
    if int_key and not _key_is_integer(df, spec.column):
        # kernel rule (mg.py update_batch): Number -> intValue(), i.e.
        # truncation toward zero — Spark's double->long cast matches
        work = work.withColumn("__v", F.col("__v").cast("long"))
    per_slice = (work.groupBy("__slice", "__st", "__v")
                 .agg(F.count(F.lit(1)).alias("__c")))

    if isinstance(win, Sliding):
        wins = _member_windows(win)
        counts = (per_slice.withColumn("__w", F.explode(wins))
                  .groupBy("__w", "__st", "__v")
                  .agg(F.sum("__c").alias("__c")))
    else:
        counts = per_slice.withColumnRenamed("__slice", "__w")

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        spec.ensure_registered()
        if len(pdf) > cap:
            raise ValueError(
                f"build_mg_sql: window {key} has {len(pdf)} distinct keys > "
                f"capacity {cap} — the relational form only exists in the "
                "exact regime; raise capacity or use build_batch")
        syn = spec.make_synopsis()
        if int_key:
            keys = pdf["__v"].to_numpy().astype(np.int64)
        else:
            keys = pdf["__v"].to_numpy().astype(str)
        order = np.argsort(keys, kind="stable")
        syn.keys = keys[order]
        syn.cnts = pdf["__c"].to_numpy().astype(np.int64)[order]
        syn.deficit = 0
        syn.n_processed = int(syn.cnts.sum())
        w = int(key[0])
        return pd.DataFrame({
            "window_start": [pd.Timestamp(w, unit="us")],
            "window_end": [pd.Timestamp(w + size_us, unit="us") if size_us
                           else pd.Timestamp(w, unit="us")],
            "stratum": [key[1]],
            "state": [syn.to_bytes()],
            "n": [syn.n_processed],
        })

    return counts.groupBy("__w", "__st").applyInPandas(
        assemble, schema=_FINAL_SCHEMA)
