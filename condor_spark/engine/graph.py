"""Distributed connected components → dedup clustering.

The missing last step of every near-dup pipeline: pair finders
(minhash_dedup_pairs / simhash_near_pairs / ngram_jaccard_pairs /
cosine_near_dup_pairs in text.py + similarity.py) emit EDGES, but a
training-data dedup needs one canonical document per transitive
duplicate CLUSTER — i.e. connected components over the pair graph, then
keep = (doc == component min).

Spark-first algorithm: alternating large-star / small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
— the standard shuffle-based CC; GraphFrames implements the same idea).
Each round is two groupBy+join passes over the edge set:

  large-star(u): every neighbor v > u re-points to m = min(Γ(u) ∪ {u})
  small-star(u): every neighbor v ≤ u (edges oriented hi→lo) re-points
                 to m = min(Γ≤(u) ∪ {u})

The edge set never grows beyond the input edge count (each pass emits at
most one edge per input edge, deduped), converges in O(log² n) rounds to
a star forest (every node → its component's min id), and each pass is
one hash shuffle on the node id — no all-pairs, no driver-side graph.
A 10^12-edge graph costs ~log rounds × 2 shuffles of the (long, long)
edge table. Each round is eagerly localCheckpoint-ed: the star passes
reference their input several times, so an un-truncated logical plan
would grow exponentially with rounds — the checkpoint keeps the plan
O(1) deep and the round's edges cached, with prior rounds reclaimed by
the ContextCleaner.

Driver-side state is two scalars per round (count + hash signature for
the convergence test). The reference has no graph surface at all — this
is new pipeline-brief capability, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Γ over both directions; each strictly-larger neighbor re-points to
    min(Γ(u) ∪ {u})."""
    b = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (b.groupBy("src").agg(F.min("dst").alias("__mn"))
            .select("src", F.least("__mn", F.col("src")).alias("__m")))
    return (b.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Edges oriented hi→lo; u and each ≤-neighbor re-point to the min
    ≤-neighbor (which is < u, so m == min(Γ≤(u)))."""
    o = e.select(F.greatest("src", "dst").alias("src"),
                 F.least("src", "dst").alias("dst"))
    mins = o.groupBy("src").agg(F.min("dst").alias("__m"))
    children = (o.join(mins, "src")
                .select(F.col("dst").alias("src"), F.col("__m").alias("dst")))
    parents = mins.select("src", F.col("__m").alias("dst"))
    return (children.union(parents)
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id of its connected component.
    Undirected semantics; self-loops and duplicate/reversed edges are
    fine. Nodes with no edges don't appear (callers add singletons —
    see ``dedup_clusters``)."""
    # eager localCheckpoint EVERY round, not persist: each star pass
    # references its input several times (union + self-join), so the
    # LOGICAL plan would quadruple per round — exponential analyzer blowup
    # long before any data moves. Checkpointing truncates the plan to a
    # LogicalRDD over the round's cached blocks; prior rounds' blocks are
    # reclaimed by the ContextCleaner once their DataFrames go out of
    # scope, so live storage stays O(2 rounds of edges)
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src") != F.col("dst"))
         .distinct()
         .localCheckpoint(eager=True))
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # fixpoint test: identical (count, xor-of-hashes) between
        # consecutive small-star outputs ⇒ identical edge sets (both are
        # exact sets post-distinct; xor instead of sum — order-independent
        # AND overflow-free under ANSI mode)
        row = e.agg(F.count("*").alias("n"),
                    F.expr("bit_xor(xxhash64(src, dst))").alias("h")).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(f"connected_components: no fixpoint in "
                           f"{max_iter} rounds")
    # star forest: every edge is (child, root); roots name themselves
    roots = e.select(F.col("dst").alias("id"), F.col("dst").alias("component"))
    return (e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
            .union(roots).distinct())


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", src: str = "doc_a",
                   dst: str = "doc_b", max_iter: int = 50) -> DataFrame:
    """Cluster near-duplicate pairs into transitive components and pick
    one canonical doc per cluster: (id_col, component, keep) where
    ``component`` is the cluster's min doc id and ``keep=1`` marks the
    canonical row. Docs with no duplicate partner are their own
    singleton component (keep=1). The membership join keys on the doc id;
    near-dup pairs are typically a tiny fraction of the corpus, so AQE
    plans it as a broadcast of the component map — don't force it, the
    map CAN be corpus-sized in a pathological all-dup input."""
    cc = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    ids = docs.select(F.col(id_col).cast("long").alias(id_col))
    out = (ids.join(cc.withColumnRenamed("id", id_col), id_col, "left")
           .select(id_col,
                   F.coalesce("component", F.col(id_col)).alias("component"))
           .withColumn("keep",
                       (F.col(id_col) == F.col("component")).cast("long")))
    return out
