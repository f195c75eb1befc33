"""Pure-JVM SQL build path for linear hash sketches (Count-Min, Fast-AGMS).

The update pipeline of ``CountMinSketch.java:57-71`` / ``FastAGMS.java:93-117``
is *linear* over counter cells: hash the key, pick a bucket per row, add ±1.
That whole pipeline — hashing, scatter, slice→window expansion, merge — is
expressible as Spark SQL aggregation, so it runs entirely inside
whole-stage codegen with zero Python in the hot path:

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
— both are single ``bit_count(...) & 1`` expressions. Constants come from the
same seeded families as the numpy kernels, so the resulting blobs are
**byte-identical** to ``build_batch`` output (asserted in
``tests/test_sqlbuild.py``), and every downstream evaluator works unchanged.

Shuffle volume is O(cells touched) = O(partitions × slices × strata × height
× min(width, distinct keys)) after map-side combine — independent of row
count, the same scale property as the blob path, but the per-row update cost
is a handful of codegen'd long ops instead of Arrow decode + numpy dispatch.

Scope: integer-typed key columns (string keys go through pandas' keyed
siphash in ``strings_to_ints``, which has no JVM equivalent — use the kernel
path); tumbling / sliding / global windows; unit weights. ``build_batch``
remains the general surface; this is the throughput fast path for the two
sketches that dominate the reference's scalability benchmarks
(``benchmark/.../scalability/jobs/CountMinSlicing.java``).
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


def _key_is_integer(df: DataFrame, column: str) -> bool:
    for f in df.schema.fields:
        if f.name == column:
            return f.dataType.simpleString() in _INT_TYPES
    return False


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


def _validate_spec(df: DataFrame, spec: SynopsisSpec) -> None:
    if spec.kind not in ("countmin", "ams"):
        raise ValueError(f"SQL build supports countmin/ams, not {spec.kind}")
    if not _key_is_integer(df, spec.column):
        raise ValueError(
            f"column {spec.column!r} is not integer-typed; string keys hash "
            "through pandas siphash (no JVM equivalent) — use build_batch")


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
    dims = [(p.width, p.height, p.seed) for p in protos]
    offsets = np.concatenate([[0], np.cumsum([w * h for w, h, _ in dims])])

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

    cells = []
    for i, (spec, (w, h, sd)) in enumerate(zip(specs, dims)):
        cells.extend(_cell_exprs(F.col(f"__v{i}"), spec, w, h, sd, int(offsets[i])))
    # Evaluate the hash expressions in a standalone Project, then explode
    # plain attribute refs. Inlining them into the Generate fuses every
    # element_at chain into ONE codegen method that blows past HotSpot's
    # 8000-byte JIT threshold (DontCompileHugeMethods) → the whole hot loop
    # runs bytecode-interpreted. A Project splits its consume path at
    # spark.sql.codegen.methodSplitThreshold, so each method stays JIT-able
    # (measured 13x on the AMS shape).
    # the constant stratum is NOT carried through the hot aggregation when
    # unstratified — hashing an extra (empty-string) key per probe is pure
    # overhead; it is re-attached after the heavy aggs
    grp = ["__slice", "__st"] if s0.stratify_by else ["__slice"]
    pre = work.select(*grp, *[c.alias(f"__c{j}") for j, c in enumerate(cells)])
    # one shuffle: partial agg collapses each task to ≤ slices×strata×Σ(h×w)
    # cells — independent of row count, the blob path's scale property
    agg = (pre.select(*grp,
                      F.explode(F.array(*[F.col(f"__c{j}")
                                          for j in range(len(cells))])).alias("cell"))
           .groupBy(*grp, "cell")
           .agg(F.count(F.lit(1)).alias("m")))

    if isinstance(win, Sliding):
        slide, size, sl = win.slide_us, win.size_us, win.slice_us
        # identical window-expansion algebra to build_batch (builder.py:267-278)
        first_w = (-F.floor((F.lit(size) - F.lit(sl) - F.col("__slice")) / F.lit(slide))
                   * F.lit(slide)).cast("long")
        last_w = (F.floor(F.col("__slice") / F.lit(slide)) * F.lit(slide)).cast("long")
        wins = F.when(first_w <= last_w,
                      F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                      ).otherwise(F.array().cast("array<long>"))
        agg = (agg.withColumn("__w", F.explode(wins))
               .groupBy("__w", *grp[1:], "cell")
               .agg(F.sum("m").alias("m")))
    else:
        agg = agg.withColumnRenamed("__slice", "__w")
    if not s0.stratify_by:
        agg = agg.withColumn("__st", F.lit(""))

    bounds = offsets[1:-1]  # np.searchsorted bin edges between sketches

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = pdf["cell"].to_numpy()
        m = pdf["m"].to_numpy()
        idx = np.abs(cell) - 1
        which = np.searchsorted(bounds, idx, side="right")
        w = int(key[0])
        out = []
        for i, spec in enumerate(specs):
            sel = which == i
            if not sel.any():
                continue
            spec.ensure_registered()
            syn = spec.make_synopsis()
            width, height, _ = dims[i]
            flat = np.zeros(height * width, dtype=np.int64)
            np.add.at(flat, idx[sel] - int(offsets[i]), np.sign(cell[sel]) * m[sel])
            syn.counts = flat.reshape(height, width)
            syn.n_processed = int(m[sel].sum()) // height
            out.append((i, pd.Timestamp(w, unit="us"),
                        pd.Timestamp(w + size_us, unit="us") if size_us else
                        pd.Timestamp(w, unit="us"),
                        key[1], syn.to_bytes(), syn.n_processed))
        return pd.DataFrame(out, columns=["spec_id", "window_start", "window_end",
                                          "stratum", "state", "n"])

    return (agg.groupBy("__w", "__st")
            .applyInPandas(assemble, schema="spec_id int, " + _FINAL_SCHEMA))


def build_sketch_sql(df: DataFrame, spec: SynopsisSpec) -> DataFrame:
    """JVM-expression build for ``kind in {"countmin", "ams"}`` over an
    integer key column. Output rows and blob bytes are identical to
    ``build_batch(df, spec)`` (asserted in ``tests/test_sqlbuild.py``)."""
    return _build_sql(df, [spec]).drop("spec_id")


def build_sketch_sql_many(df: DataFrame, specs: list[SynopsisSpec]) -> DataFrame:
    """Shared-scan SQL multi-build: N countmin/ams sketches from ONE pass and
    ONE shuffle — ``build_batch_many``'s contract (leading ``spec_id``
    column), with the whole hash→scatter→merge pipeline in codegen."""
    return _build_sql(df, specs)
