"""Connected-components duplicate clustering (operators/graph.py)."""

import random

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import operators as ops


@pytest.fixture(scope="module")
def pairs(spark):
    # chain 1-2-3-4-5 (transitive, NOT one-hop resolvable), triangle
    # 10-11-12, pair 20-21, out-of-order + duplicate edges 33-30 / 30-33
    return spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11), (11, 12), (10, 12),
         (20, 21), (33, 30), (30, 33), (1, 2)],
        "id_a long, id_b long")


def test_cc_labels_min_of_component(pairs):
    got = {r.id: r.comp for r in ops.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 33: 30}


def test_cc_adversarial_chain(spark):
    """Descending 100-node path: worst case for naive propagation, the
    star rounds collapse it in O(log n)."""
    chain = spark.createDataFrame([(i + 1, i) for i in range(99)],
                                  "id_a long, id_b long")
    cc = ops.connected_components(chain)
    assert cc.count() == 100
    assert cc.filter("comp != 0").count() == 0


def test_cc_random_graph_vs_union_find(spark):
    random.seed(7)
    edges = [(random.randrange(400), random.randrange(400))
             for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(400))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in {x for e in edges for x in e}}
    got = {r.id: r.comp for r in ops.connected_components(
        spark.createDataFrame(edges, "id_a long, id_b long")).collect()}
    assert got == want


def test_dup_clusters_summary(pairs):
    cl = {r.comp: (r.n_members, r.min_id, r.max_id)
          for r in ops.dup_clusters(pairs).collect()}
    assert cl == {1: (5, 1, 5), 10: (3, 10, 12),
                  20: (2, 20, 21), 30: (2, 30, 33)}


def test_dedup_by_components_beats_one_hop(spark, pairs):
    """On the 1-2-3-4-5 chain one-hop removal keeps 3 (its only smaller
    neighbor 2 is not the min); transitive closure keeps exactly the min."""
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 4, 5, 10, 11, 12, 40]],
        "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  ops.dedup_by_components(docs, pairs).collect())
    assert kept == [1, 10, 40]          # 40 = singleton, untouched
