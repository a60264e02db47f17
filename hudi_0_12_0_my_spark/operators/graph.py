"""Connected components for duplicate-cluster resolution.

`minhash_lsh_dedup`'s default one-hop loser removal is the cheap scalable
choice, but it under-merges chains (a~b, b~c with ids c<b<a drops b and a
only if they neighbor the minimum directly). This module adds EXACT
transitive duplicate clusters via the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — the standard O(log n)-round formulation for commodity
shared-nothing engines:

- large-star: every node connects its LARGER neighbors to the minimum of
  its closed neighborhood;
- small-star: every node connects its smaller-or-equal neighbors (and
  itself) to that minimum.

Each half-round is ONE shuffle (groupBy(u).min + co-partitioned join back —
the join reuses the groupBy's hash exchange, no second shuffle of the edge
list) and never materializes an adjacency list in a single row, so degree
skew (a viral duplicate cluster) cannot blow a task's memory the way a
collect_set/GraphX-style grouping would. Rounds are lineage-truncated with
localCheckpoint: iterative DataFrame algorithms otherwise stack every
iteration into one plan and die in the optimizer long before 100 TB.

Convergence is by edge-set fingerprint (count + xor of per-edge hashes) —
two scalar aggregates per round, no driver-side edge materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list: (u < v), distinct, no self-loops."""
    return (edges.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"),
                    F.greatest("u", "v").alias("v"))
            .distinct())


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (v > u attach to min) or small-star (v <= u) round."""
    bid = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not large:
        # small-star only looks at the smaller-or-equal side of each node
        bid = bid.filter(F.col("v") < F.col("u"))
    mins = bid.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("u"), F.col("_mn"))
    att = bid.join(mins, "u")          # co-partitioned: reuses groupBy exchange
    if large:
        att = att.filter(F.col("v") > F.col("u"))
        out = att.select(F.col("v").alias("u"), m.alias("v"))
    else:
        out = att.select(F.col("v").alias("u"), m.alias("v")) \
                 .union(mins.select("u", m.alias("v")))
    return _canon(out)


def _driver_cc(edges: DataFrame) -> DataFrame:
    """Union-find over a collected edge list (small-graph fast path).

    O(E α(E)) with path compression; component label = min member id, same
    contract as the distributed fixpoint."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:          # path compression
            parent[x], x = r, parent[x]
        return r

    for row in edges.collect():
        u, v = row[0], row[1]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {x: find(x) for x in parent}
    # roots are already each component's minimum: unions always attach the
    # larger root under the smaller one
    dt = edges.schema["u"].dataType
    schema = T.StructType([T.StructField("id", dt, False),
                           T.StructField("comp", dt, False)])
    return edges.sparkSession.createDataFrame(
        sorted(comp.items()), schema)


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 50,
                         small_graph_threshold: int = 500_000) -> DataFrame:
    """(id, comp) for every node in `pairs`; comp = min id of its component.

    Alternating large-star/small-star until the canonical edge set's
    fingerprint is stable — at that fixpoint the edges form stars rooted at
    each component's minimum, so the labeling is one final groupBy.
    Singleton ids (no edges) are the caller's concern: anything absent from
    `pairs` is its own component.

    Small-graph fast path: each distributed round costs 2 shuffles +
    checkpoint + fingerprint jobs — ~2s of fixed overhead per round
    regardless of edge count. Near-dup candidate graphs are usually tiny
    relative to the corpus (LSH already collapsed 100 TB to the colliding
    pairs), so when the canonical edge count is at or below
    `small_graph_threshold` the edges are collected and union-found on the
    driver in one pass (the same count-gated hybrid AQE applies to
    broadcast joins). Set it to 0 to force the distributed path.
    """
    edges = _canon(pairs.select(F.col(id_a).alias("u"),
                                F.col(id_b).alias("v")))
    edges = edges.localCheckpoint(eager=True)
    if small_graph_threshold and edges.count() <= small_graph_threshold:
        return _driver_cc(edges)

    def _fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold: order-independent and cannot overflow under ANSI mode
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    fp = _fingerprint(edges)
    for _ in range(max_iter):
        edges = _star(_star(edges, large=True), large=False)
        edges = edges.localCheckpoint(eager=True)
        nfp = _fingerprint(edges)
        if nfp == fp:
            break
        fp = nfp
    # star fixpoint: canonical edges are (root=u < member=v) since the root
    # is the component minimum; roots label themselves
    members = edges.select(F.col("v").alias("id"), F.col("u").alias("comp"))
    roots = edges.select(F.col("u").alias("id"), F.col("u").alias("comp"))
    return (members.union(roots)
            .groupBy("id").agg(F.min("comp").alias("comp")))


def dup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                 max_iter: int = 50,
                 small_graph_threshold: int = 500_000) -> DataFrame:
    """Cluster summary over near-dup pairs: one row per duplicate cluster.

    (comp, n_members, min_id, max_id) — comp == min_id by construction;
    kept as separate columns so callers can assert the invariant cheaply.
    """
    cc = connected_components(pairs, id_a, id_b, max_iter,
                              small_graph_threshold)
    return (cc.groupBy("comp")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"),
                 F.min("id").alias("min_id"),
                 F.max("id").alias("max_id")))


def dedup_by_components(df: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id",
                        id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Transitive-closure dedup: keep exactly one row (the min id) per
    duplicate component — the exact counterpart of minhash_lsh_dedup's
    one-hop approximation."""
    cc = connected_components(pairs, id_a, id_b)
    losers = cc.filter(F.col("id") != F.col("comp")) \
               .select(F.col("id").alias(id_col))
    return df.join(losers, on=id_col, how="left_anti")


def select_cluster_representatives(df: DataFrame, pairs: DataFrame,
                                   id_col: str = "doc_id",
                                   score_col: str = "quality_score",
                                   id_a: str = "id_a",
                                   id_b: str = "id_b") -> DataFrame:
    """Quality-aware dedup: keep the BEST-scoring member of each duplicate
    cluster instead of the smallest id.

    The standard curation refinement over `dedup_by_components`: near-dup
    pairs (LSH / n-gram Jaccard) -> transitive clusters -> the member with
    the highest `score_col` survives (ties: smallest id), all other members
    drop. Rows absent from `pairs` are singleton clusters and always
    survive.

    Scale shape: connected_components sees only paired ids (LSH already
    collapsed the corpus to colliding candidates); the score lookup joins
    |paired ids| rows; the only full-corpus pass is the final anti-join,
    and the loser side of that join is small enough for a broadcast hash
    join in practice.
    """
    cc = connected_components(pairs, id_a, id_b)
    scored = df.select(F.col(id_col).alias("id"), F.col(score_col).alias("_s"))
    members = cc.join(scored, "id")
    w = Window.partitionBy("comp").orderBy(F.desc("_s"), F.asc("id"))
    losers = (members.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") > 1)
              .select(F.col("id").alias(id_col)))
    return df.join(losers, on=id_col, how="left_anti")


def cluster_representatives(df: DataFrame, pairs: DataFrame,
                            id_col: str = "doc_id",
                            score_col: str = "quality_score",
                            id_a: str = "id_a",
                            id_b: str = "id_b") -> DataFrame:
    """Per-cluster pick summary: (comp, rep_id, rep_score, n_members) for
    every MULTI-member duplicate cluster — the audit view of
    `select_cluster_representatives` (which of each cluster survived and
    why)."""
    cc = connected_components(pairs, id_a, id_b)
    scored = df.select(F.col(id_col).alias("id"), F.col(score_col).alias("_s"))
    members = cc.join(scored, "id")
    w = Window.partitionBy("comp").orderBy(F.desc("_s"), F.asc("id"))
    return (members.withColumn("_rn", F.row_number().over(w))
            .groupBy("comp")
            .agg(F.max(F.when(F.col("_rn") == 1, F.col("id"))).alias("rep_id"),
                 F.max(F.when(F.col("_rn") == 1, F.col("_s")))
                 .alias("rep_score"),
                 F.count(F.lit(1)).cast("bigint").alias("n_members")))


# device-node id offset: keeps the bipartite namespaces disjoint while the
# component label (min node id) stays a USER id — users sit below 2^40
DEVICE_NODE_OFFSET = 1 << 40


def identity_clusters(df: DataFrame, device_expr: Column | str,
                      user_col: str = "user_id",
                      min_occurrences: int = 2,
                      max_iter: int = 50,
                      small_graph_threshold: int = 500_000) -> DataFrame:
    """Cross-device identity resolution: users sharing a RECURRING device
    (>= min_occurrences events on the same (user, device) pair — one-off
    contacts are noise, recurrence is the identity signal) collapse into
    one identity via connected components over the bipartite
    user<->device graph.

    Returns one row per user that belongs to a (shared-device) identity:
    (user, identity_id, n_users, n_devices) with identity_id = the
    component's minimum user id. Users with no recurring device are
    singleton identities and are omitted (anything absent is its own
    identity — same contract as connected_components).

    Shape for 100 TB: ONE partial-aggregated shuffle to recurring
    (user, device) edges — the graph is orders of magnitude smaller than
    the event stream; the components run on edges only
    (alternating-star rounds, or the count-gated driver union-find for
    model-sized graphs); per-identity sizes are one groupBy of the
    node-sized labeling.
    """
    if min_occurrences < 1:
        raise ValueError("identity_clusters: min_occurrences must be >= 1")
    dev = F.expr(device_expr) if isinstance(device_expr, str) else device_expr
    recurring = (df.groupBy(F.col(user_col).alias("_u"),
                            dev.cast("bigint").alias("_d"))
                 .agg(F.count(F.lit(1)).alias("_c"))
                 .filter(F.col("_c") >= min_occurrences)
                 .persist())   # edge table: reused by the guard below + CC
    # the namespace offset is only sound for user ids below the offset and
    # device ids in [0, offset) — a hashed device id (often negative) or a
    # >= 2^40 user would silently cross namespaces and corrupt clusters,
    # so refuse loudly and tell the caller to remap
    # NULLs must be in the bad-row filter explicitly: a NULL device id
    # (failed bigint cast / JSON extract from a misconfigured device_expr)
    # fails all three range comparisons, and connected_components would
    # then silently drop the NULL edges — partial clusters instead of the
    # loud refusal this guard promises.
    bad = recurring.filter(F.col("_u").isNull() | F.col("_d").isNull()
                           | (F.col("_u") >= DEVICE_NODE_OFFSET)
                           | (F.col("_d") < 0)
                           | (F.col("_d") >= DEVICE_NODE_OFFSET)) \
                   .limit(1).collect()
    if bad:
        recurring.unpersist()
        raise ValueError(
            "identity_clusters: user ids must be non-NULL and < 2^40, "
            "device ids non-NULL in [0, 2^40); got "
            f"(user={bad[0]['_u']}, device={bad[0]['_d']}). "
            "A NULL device usually means device_expr's cast/JSON extract "
            "failed. Remap hashed/negative device ids (e.g. "
            "pmod(hash, 2**39)) before clustering.")
    edges = recurring.select(
        F.col("_u").alias("id_a"),
        (F.col("_d") + DEVICE_NODE_OFFSET).alias("id_b"))
    cc = connected_components(edges, max_iter=max_iter,
                              small_graph_threshold=small_graph_threshold)
    sizes = (cc.groupBy("comp")
             .agg(F.sum(F.when(F.col("id") < DEVICE_NODE_OFFSET, 1)
                        .otherwise(0)).cast("bigint").alias("n_users"),
                  F.sum(F.when(F.col("id") >= DEVICE_NODE_OFFSET, 1)
                        .otherwise(0)).cast("bigint").alias("n_devices")))
    return (cc.filter(F.col("id") < DEVICE_NODE_OFFSET)
            .join(sizes, "comp")
            .select(F.col("id").alias("user"),
                    F.col("comp").alias("identity_id"),
                    "n_users", "n_devices"))


def triangle_counts(pairs: DataFrame, id_a: str = "id_a",
                    id_b: str = "id_b") -> DataFrame:
    """Per-node triangle participation over an undirected pair graph —
    the cluster-cohesion metric that separates true duplicate CLIQUES
    (every member pairs with every other: triangle-dense) from CHAINED
    false positives (A~B~C where A!~C: triangle-free), the standard
    post-check on LSH/near-dup candidate graphs before collapsing a
    component to one representative.

    Returns (id, n_triangles) for every node in at least one triangle.
    Exact: edges canonicalize to a < b, each triangle a < b < c is
    enumerated once and credited to all three corners.

    Shape for 100 TB: the pair graph is already Zipf-small relative to
    the corpus (LSH collapsed it); edges persist once and the triad
    enumeration is two self-equi-joins on edge endpoints + one membership
    join — never a cartesian. Heavy-degree hubs are the one skew hazard:
    orient by (degree, id) instead of raw id before joining if a hub
    dominates (the standard compact-forward refinement); id orientation
    keeps the oracle replayable and is right for near-dup graphs, whose
    components are small by construction.
    """
    a, b = F.col(id_a), F.col(id_b)
    e = (pairs.select(F.least(a, b).alias("a"),
                      F.greatest(a, b).alias("b"))
         .filter(F.col("a") < F.col("b"))
         .distinct().persist())
    tri = (e.alias("e1")
           .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
           .join(e.alias("e3"), (F.col("e3.a") == F.col("e1.a"))
                 & (F.col("e3.b") == F.col("e2.b")))
           .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
                   F.col("e2.b").alias("z")))
    return (tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles")))
