"""Similarity search over embedding columns (array<float>).

Two paths, per the pipeline-ops requirement:
  * brute-force cosine top-k — pure JVM expressions (zip_with + aggregate,
    whole-stage codegen, no Python in the plan). Baseline and the
    correctness oracle.
  * LSH-bucketed ANN — random-hyperplane signatures (pandas UDF, one pass)
    + bucket join, so candidate generation shuffles short keys instead of
    all-pairs. The scale path: probes only same-bucket vectors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def brute_force_topk(emb_df: DataFrame, query_ids: list[int], k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors for each query id (JVM-side math).

    The query side is tiny → broadcast; the full table is scanned once.
    Ties broken by neighbor id for determinism.
    """
    q = (emb_df.filter(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec")))
    cand = emb_df.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("c_vec"))
    sims = (F.broadcast(q).join(cand, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    F.round(_cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "neighbor_id", "cosine"))


def _rademacher_planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    """±1 (Rademacher) hyperplanes with md5-derived signs — bit-stable on
    every platform AND regenerable in plain SQL (`substr(md5(...), 32, 1)`
    parity), which is what lets `ann_topk_lsh_exact` carry a full DuckDB
    oracle. Sign-random-projection with Rademacher entries is the standard
    cheap SRP variant (same cosine-LSH collision guarantee family)."""
    import hashlib

    signs = np.empty((dim, num_planes))
    for d in range(dim):
        for p in range(num_planes):
            h = hashlib.md5(f"srp:{seed}:{d}:{p}".encode()).digest()
            signs[d, p] = 1.0 if (h[-1] & 1) else -1.0
    return signs


def hyperplane_signatures(emb_df: DataFrame, num_planes: int = 16, seed: int = 7,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int | None = None,
                          plane_mode: str = "gaussian") -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign pattern of projections).

    ``plane_mode``: "gaussian" (default — PCG64 standard-normal planes) or
    "rademacher_md5" (±1 planes from md5 — SQL-replayable, see
    ``_rademacher_planes``)."""
    if plane_mode not in ("gaussian", "rademacher_md5"):
        raise ValueError(f"plane_mode {plane_mode!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                if plane_mode == "gaussian":
                    rng = np.random.default_rng(seed)
                    planes = rng.standard_normal((mat.shape[1], num_planes))
                else:
                    planes = _rademacher_planes(mat.shape[1], num_planes,
                                                seed)
            proj = mat @ planes
            bits = (proj > 0).astype(np.uint64)
            bucket = (bits << np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(),
                                "bucket": bucket.astype(np.int64)})

    return emb_df.select(id_col, vec_col).mapInPandas(
        fn, schema="vec_id long, bucket long")


def ann_topk_lsh(emb_df: DataFrame, query_ids: list[int], k: int = 5,
                 num_planes: int = 10, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 plane_mode: str = "gaussian") -> DataFrame:
    """Approximate top-k: rank only candidates sharing the query's LSH bucket.

    Recall < 1 by construction; the baseline/oracle is brute_force_topk —
    except under ``plane_mode="rademacher_md5"``, where the bucketing
    itself is SQL-replayable and the whole operator carries an exact
    oracle (`ann_topk_lsh_exact`).
    """
    sig = hyperplane_signatures(emb_df, num_planes, seed, id_col, vec_col,
                                plane_mode=plane_mode)
    # persist: read twice (query side + candidate side) below
    with_bucket = (emb_df.join(sig, emb_df[id_col] == sig["vec_id"])
                   .drop(sig["vec_id"]).persist())
    q = (with_bucket.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
                 F.col("bucket")))
    cand = with_bucket.select(F.col(id_col).alias("neighbor_id"),
                              F.col(vec_col).alias("c_vec"), F.col("bucket"))
    sims = (F.broadcast(q).join(cand, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    F.round(_cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    from .util import pin_result

    out = (sims.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= k)
               .select("query_id", "rank", "neighbor_id", "cosine"))
    return pin_result(out, with_bucket, key="ann_topk_lsh")


def ivf_index(emb_df: DataFrame, num_centroids: int = 16, iters: int = 2,
              seed: int = 7, id_col: str = "vec_id",
              vec_col: str = "embedding", init_mode: str = "xxhash64"):
    """Deterministic IVF index: spherical k-means centroids + per-vector
    cluster assignments.

    Lloyd iterations are fully distributed: each iteration is one
    ``mapInPandas`` pass that emits per-partition partial sums — one tiny
    (cluster, sum-vector, count) row per cluster per partition — so only
    O(partitions x C x dim) crosses to the driver, never the vectors
    themselves. Initial centroids are a deterministic hash-ordered sample
    (no RNG state shared across workers); ``init_mode="md5"`` orders by
    ``md5(id || ':' || seed)`` instead of xxhash64 so a SQL oracle can
    regenerate the identical sample (`ann_topk_ivf_exact`).

    Returns ``(centroids ndarray (C, dim) unit-norm, assignments DataFrame
    [vec_id, cluster])``.
    """
    if init_mode == "md5":
        order_col = F.md5(F.encode(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")),
            "utf-8"))
    elif init_mode == "xxhash64":
        order_col = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    else:
        raise ValueError(f"init_mode {init_mode!r}")
    init = (emb_df.select(id_col, vec_col)
            .orderBy(order_col)
            .limit(num_centroids).collect())
    cents = np.stack([np.asarray(r[1], dtype=np.float64) for r in init])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    def partials_fn(centroids):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = centroids
            sums = np.zeros_like(c)
            counts = np.zeros(c.shape[0], dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                unit = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                best = (unit @ c.T).argmax(axis=1)
                np.add.at(sums, best, unit)
                np.add.at(counts, best, 1)
            nz = np.nonzero(counts)[0]
            if not len(nz):
                # empty input partition (a file split without a row-group
                # start): yield NOTHING — an empty pd.DataFrame built from
                # {"s": []} types the list column float64, which Arrow
                # cannot convert to list<double> (surfaced by the sf1
                # stress, where the single-row-group parquet splits into
                # one loaded + several empty partitions)
                return
            yield pd.DataFrame({"cluster": nz,
                                "s": [sums[i].tolist() for i in nz],
                                "n": counts[nz]})
        return fn

    for _ in range(iters):
        rows = (emb_df.select(vec_col).mapInPandas(
                    partials_fn(cents), schema="cluster int, s array<double>, n long")
                .collect())
        sums = np.zeros_like(cents)
        counts = np.zeros(cents.shape[0], dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["s"])
            counts[r["cluster"]] += r["n"]
        moved = counts > 0
        cents[moved] = sums[moved] / counts[moved, None]
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    final = cents

    def assign_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            unit = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(),
                                "cluster": (unit @ final.T).argmax(axis=1)})

    assign = emb_df.select(id_col, vec_col).mapInPandas(
        assign_fn, schema="vec_id long, cluster int")
    return final, assign


def ann_topk_ivf(emb_df: DataFrame, query_ids: list[int], k: int = 5,
                 num_centroids: int = 16, nprobe: int = 4, iters: int = 2,
                 seed: int = 7, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 init_mode: str = "xxhash64") -> DataFrame:
    """IVF approximate top-k: rank only candidates in the ``nprobe`` clusters
    nearest each query (classic inverted-file ANN; the other scale path next
    to :func:`ann_topk_lsh`).

    The shuffle carries (vector, cluster) assignments once; per query only
    ~``nprobe/num_centroids`` of the table is scanned. Recall < 1 by
    construction; brute_force_topk is the oracle — except under
    ``init_mode="md5"``, where the whole index (init sample, unrolled Lloyd
    iterations, probes) is SQL-replayable and the operator carries its own
    exact oracle (`ann_topk_ivf_exact`).
    """
    cents, assign = ivf_index(emb_df, num_centroids, iters, seed, id_col,
                              vec_col, init_mode=init_mode)
    with_cluster = (emb_df.join(assign, emb_df[id_col] == assign["vec_id"])
                    .drop(assign["vec_id"]).persist())

    def probes_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            unit = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(unit @ cents.T), axis=1)[:, :nprobe]
            yield pd.DataFrame({
                "query_id": np.repeat(pdf[id_col].to_numpy(), nprobe),
                "q_vec": [v for v in pdf[vec_col] for _ in range(nprobe)],
                "cluster": order.reshape(-1)})

    q = (emb_df.filter(F.col(id_col).isin(query_ids))
         .select(id_col, vec_col)
         .mapInPandas(probes_fn,
                      schema="query_id long, q_vec array<float>, cluster int"))
    cand = with_cluster.select(F.col(id_col).alias("neighbor_id"),
                               F.col(vec_col).alias("c_vec"), F.col("cluster"))
    sims = (F.broadcast(q).join(cand, "cluster")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    F.round(_cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"))
            .groupBy("query_id", "neighbor_id").agg(F.max("cosine").alias("cosine")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    from .util import pin_result

    out = (sims.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= k)
               .select("query_id", "rank", "neighbor_id", "cosine"))
    return pin_result(out, with_cluster, key="ann_topk_ivf")


def cosine_near_dup_pairs(emb_df: DataFrame, threshold: float = 0.4,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    All-pairs is O(n^2) — this exact form is the small-table baseline and
    the correctness oracle. At 100 TB use :func:`cosine_near_dup_pairs_lsh`,
    which equi-joins on LSH band buckets so the shuffle carries short keys
    and only same-bucket vectors are compared.

    The cosine is computed JVM-side (zip_with + aggregate over pre-normalized
    vectors → whole-stage codegen); norms are computed once per row, not per
    pair.
    """
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") * v.cast("double")))
    unit = emb_df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col),
                    lambda v: v.cast("double") / F.greatest(norm, F.lit(1e-12))
                    ).alias("_unit"))
    a = unit.select(F.col("_id").alias("id_a"), F.col("_unit").alias("_ua"))
    b = unit.select(F.col("_id").alias("id_b"), F.col("_unit").alias("_ub"))
    dot = F.aggregate(F.zip_with(F.col("_ua"), F.col("_ub"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    return (a.join(b, F.col("id_a") < F.col("id_b"))
             .withColumn("cosine", F.round(dot, 6))
             .filter(F.col("cosine") >= threshold)
             .select("id_a", "id_b", "cosine"))


def cosine_near_dup_pairs_lsh(emb_df: DataFrame, threshold: float = 0.4,
                              bands: int = 8, rows_per_band: int = 2,
                              seed: int = 7, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              plane_mode: str = "gaussian") -> DataFrame:
    """Banded random-hyperplane LSH near-dup pairs: candidates share at least
    one band's full sign pattern; candidates are then verified with the exact
    cosine, so precision is 1.0 and only recall is approximate.

    bands=8 x rows_per_band=2 makes P(candidate) = 1-(1-p^2)^8 with
    p = 1 - theta/pi — steep around cosine ~0.4. The pair join is an
    equi-join on (band, bucket): shuffle cost ~ bands x n short rows, never
    all pairs. ``plane_mode="rademacher_md5"`` swaps the PCG64 Gaussian
    planes for SQL-regenerable ±1 planes (`_rademacher_planes`) — the
    `dedup_cosine_lsh_exact` driver oracle replays the full band pipeline.
    """
    num_planes = bands * rows_per_band
    if plane_mode not in ("gaussian", "rademacher_md5"):
        raise ValueError(f"plane_mode {plane_mode!r}")

    def sig_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                if plane_mode == "gaussian":
                    rng = np.random.default_rng(seed)
                    planes = rng.standard_normal((mat.shape[1], num_planes))
                else:
                    planes = _rademacher_planes(mat.shape[1], num_planes,
                                                seed)
            bits = (mat @ planes > 0).astype(np.int64)
            out = {"_sid": pdf[id_col].to_numpy()}
            for band in range(bands):
                chunk = bits[:, band * rows_per_band:(band + 1) * rows_per_band]
                out[f"b{band}"] = (
                    chunk * (1 << np.arange(rows_per_band, dtype=np.int64))
                ).sum(axis=1)
            yield pd.DataFrame(out)

    sig_schema = "_sid long, " + ", ".join(f"b{i} long" for i in range(bands))
    # persist: the band self-join reads the signature UDF output twice
    sig = emb_df.select(id_col, vec_col).mapInPandas(
        sig_fn, schema=sig_schema).persist()
    # long form: one row per (vector, band) → equi-join on (band, bucket)
    pairs_of = F.array(*[F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("bucket"))
                         for i in range(bands)])
    long = (sig.select("_sid", F.explode(pairs_of).alias("bb"))
               .select("_sid", F.col("bb.band").alias("band"),
                       F.col("bb.bucket").alias("bucket")))
    la = long.select(F.col("_sid").alias("id_a"), "band", "bucket")
    lb = long.select(F.col("_sid").alias("id_b"), "band", "bucket")
    cand = (la.join(lb, ["band", "bucket"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b").distinct())
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") * v.cast("double")))
    unit = emb_df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col),
                    lambda v: v.cast("double") / F.greatest(norm, F.lit(1e-12))
                    ).alias("_unit"))
    dot = F.aggregate(F.zip_with(F.col("_ua"), F.col("_ub"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    from .util import pin_result

    out = (cand
           .join(unit.select(F.col("_id").alias("id_a"), F.col("_unit").alias("_ua")), "id_a")
           .join(unit.select(F.col("_id").alias("id_b"), F.col("_unit").alias("_ub")), "id_b")
           .withColumn("cosine", F.round(dot, 6))
           .filter(F.col("cosine") >= threshold)
           .select("id_a", "id_b", "cosine"))
    return pin_result(out, sig, key="dedup_cosine_lsh")
