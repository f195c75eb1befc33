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


def hyperplane_signatures(emb_df: DataFrame, num_planes: int = 16, seed: int = 7,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int | None = None) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign pattern of projections)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((mat.shape[1], num_planes))
            proj = mat @ planes
            bits = (proj > 0).astype(np.uint64)
            bucket = (bits << np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(),
                                "bucket": bucket.astype(np.int64)})

    return emb_df.select(id_col, vec_col).mapInPandas(
        fn, schema="vec_id long, bucket long")


def ann_topk_lsh(emb_df: DataFrame, query_ids: list[int], k: int = 5,
                 num_planes: int = 10, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: rank only candidates sharing the query's LSH bucket.

    Recall < 1 by construction; the baseline/oracle is brute_force_topk.
    """
    sig = hyperplane_signatures(emb_df, num_planes, seed, id_col, vec_col)
    with_bucket = emb_df.join(sig, emb_df[id_col] == sig["vec_id"]).drop(sig["vec_id"])
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
    return (sims.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "neighbor_id", "cosine"))
