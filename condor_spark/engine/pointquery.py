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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sqlbuild import h3_bucket_exprs

_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer",
              "short", "byte"}


def cm_cells(syn) -> list[int]:
    """Flatten a CountMinSketch's counter grid row-major (row r, bucket b →
    index r*width + b) for ``frequency_point_queries``."""
    return [int(v) for v in syn.counts.ravel()]


def bloom_bits(syn) -> list[bool]:
    """A BloomFilter's bit array for ``membership_point_queries``."""
    return [bool(v) for v in syn.bits]


def _attach(queries_df: DataFrame, cells: list, cells_type: str) -> DataFrame:
    spark = queries_df.sparkSession
    one = spark.createDataFrame([(cells,)], f"__cells array<{cells_type}>")
    return queries_df.crossJoin(F.broadcast(one))


def frequency_point_queries(queries_df: DataFrame, key_col: str,
                            cells: list[int], width: int, height: int,
                            seed: int,
                            out_col: str = "est_count") -> DataFrame:
    """CountMin point queries in pure codegen: min over rows of
    ``cells[r*width + H3_r(key) % width]`` — bit-identical to
    ``CountMinSketch.query`` for integer keys (``CountMinSketch.java:
    96-113``). ``cells`` comes from ``cm_cells`` of the snapshot window."""
    kt = dict(queries_df.dtypes).get(key_col)
    if kt not in _INT_TYPES:
        raise ValueError(
            f"frequency_point_queries needs an integer key column; {key_col} "
            f"is {kt!r} (string keys take the Python path — strings_to_ints "
            "is a pandas hash)")
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
    kt = dict(queries_df.dtypes).get(key_col)
    if kt not in _INT_TYPES:
        raise ValueError(f"membership_point_queries needs an integer key "
                         f"column; {key_col} is {kt!r}")
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
