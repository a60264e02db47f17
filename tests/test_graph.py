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


# 0 forces the distributed star rounds; the default takes the driver
# union-find fast path — both must produce identical labelings
THRESHOLDS = [0, 500_000]


@pytest.mark.parametrize("thr", THRESHOLDS)
def test_cc_labels_min_of_component(pairs, thr):
    got = {r.id: r.comp for r in ops.connected_components(
        pairs, small_graph_threshold=thr).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 33: 30}


@pytest.mark.parametrize("thr", THRESHOLDS)
def test_cc_adversarial_chain(spark, thr):
    """Descending 100-node path: worst case for naive propagation, the
    star rounds collapse it in O(log n)."""
    chain = spark.createDataFrame([(i + 1, i) for i in range(99)],
                                  "id_a long, id_b long")
    cc = ops.connected_components(chain, small_graph_threshold=thr)
    assert cc.count() == 100
    assert cc.filter("comp != 0").count() == 0


@pytest.mark.parametrize("thr", THRESHOLDS)
def test_cc_random_graph_vs_union_find(spark, thr):
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
        spark.createDataFrame(edges, "id_a long, id_b long"),
        small_graph_threshold=thr).collect()}
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


def test_select_cluster_representatives_keeps_best(spark, pairs):
    """Best-quality member survives each cluster (ties -> smallest id);
    singletons always survive."""
    docs = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.2), (5, 0.8),   # comp 1 -> 2
         (10, 0.3), (11, 0.3), (12, 0.3),                    # tie -> 10
         (20, 0.0), (21, 1.0),                               # -> 21
         (30, 0.4), (33, 0.6),                               # -> 33
         (40, 0.0)],                                         # singleton
        "doc_id long, quality_score double")
    kept = sorted(r.doc_id for r in ops.select_cluster_representatives(
        docs, pairs).collect())
    assert kept == [2, 10, 21, 33, 40]


def test_cluster_representatives_audit_view(spark, pairs):
    docs = spark.createDataFrame(
        [(i, float(i % 7) / 10) for i in [1, 2, 3, 4, 5, 10, 11, 12,
                                          20, 21, 30, 33]],
        "doc_id long, quality_score double")
    reps = {r.comp: (r.rep_id, r.n_members)
            for r in ops.cluster_representatives(docs, pairs).collect()}
    # comp 1: scores .1 .2 .3 .4 .5 -> id 5; comp 10: .3 .4 .5 -> 12;
    # comp 20: .6 .0 -> 20; comp 30: .2 .5 -> 33
    assert reps == {1: (5, 5), 10: (12, 3), 20: (20, 2), 30: (33, 2)}
