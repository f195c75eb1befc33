"""Connected components (large-star/small-star) + dedup clustering."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from condor_spark.engine.graph import connected_components, dedup_clusters


def _union_find(n_ids, edges):
    """Ground truth: driver-side union-find over the collected edge list."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for x in list(parent):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def _check(spark, edge_list):
    nodes = sorted({x for e in edge_list for x in e})
    expect = _union_find(nodes, edge_list)
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == expect


def test_cc_random_graph(spark):
    rng = np.random.default_rng(7)
    edge_list = [(int(a), int(b))
                 for a, b in rng.integers(0, 200, size=(300, 2))
                 if a != b]
    _check(spark, edge_list)


def test_cc_path_graph_worst_diameter(spark):
    # a 64-node chain is the adversarial case for plain min-propagation
    # (diameter 63); star contraction must still converge in O(log²) rounds
    _check(spark, [(i, i + 1) for i in range(63)])


def test_cc_duplicate_reversed_and_self_edges(spark):
    _check(spark, [(1, 2), (2, 1), (2, 3), (3, 3), (5, 4), (1, 2)])


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_cc_two_vs_eight_partitions_identical(spark):
    # north rule: parallelism must be invisible in the answer
    rng = np.random.default_rng(11)
    edge_list = [(int(a), int(b))
                 for a, b in rng.integers(0, 100, size=(150, 2)) if a != b]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    a = sorted(map(tuple, connected_components(
        edges.repartition(2)).collect()))
    b = sorted(map(tuple, connected_components(
        edges.repartition(8)).collect()))
    assert a == b


def test_dedup_clusters_singletons_and_keep(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (7, 8)], "doc_a long, doc_b long")
    got = {r["doc_id"]: (r["component"], r["keep"])
           for r in dedup_clusters(docs, pairs).collect()}
    assert got == {0: (0, 1), 1: (1, 1), 2: (2, 1), 3: (1, 0), 4: (4, 1),
                   5: (1, 0), 6: (6, 1), 7: (7, 1), 8: (7, 0), 9: (9, 1)}


def test_cc_no_fixpoint_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(20)],
                                  "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=1)


def test_cc_plan_has_no_python(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = connected_components(edges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
