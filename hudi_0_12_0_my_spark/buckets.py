"""Consistent-hashing bucket index: dynamic bucket resizing without re-tagging.

Re-expression of HoodieSparkConsistentBucketIndex.java +
ConsistentBucketIdentifier.java / HoodieConsistentHashingMetadata
(hudi-client/.../index/bucket/): each partition owns a hash RING of nodes
``(value, file_id)`` sorted by value; a record with ``h = hash(key) %
RING_MAX`` belongs to the first node with ``value >= h`` (wrapping to the
first node).  Unlike the simple bucket index (fixed ``pmod`` count), node
ranges can be SPLIT when a bucket outgrows the target file size and MERGED
when adjacent buckets shrink — no existing data moves except the resized
buckets themselves.

Spark-first shape: the ring is tiny driver-side metadata
(``.hoodie/buckets/<partition>.json``); assignment is ONE broadcast join of
(partition -> ring array) followed by pure column expressions
(``element_at(filter(ring, n -> n.v >= h), 1)``) — map-only, no shuffle, no
index lookup.  At 100 TB this keeps the shuffle-free upsert property of
bucket tables while removing their fixed-bucket-count scaling wall.
"""

from __future__ import annotations

import os
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, functions as F

from . import meta
from .util import atomic_write_json, read_json
from .storage import get_storage

RING_MAX = 1 << 31


def ring_dir(base_path: str) -> str:
    return os.path.join(base_path, ".hoodie", "buckets")


def ring_path(base_path: str, partition: str) -> str:
    return os.path.join(ring_dir(base_path),
                        quote(partition or "__root__", safe="") + ".json")


def _new_fid(value: int) -> str:
    return f"ch{value:08x}{uuid.uuid4().hex[:8]}"


def init_nodes(num_buckets: int) -> list:
    """Uniformly spaced nodes; node i covers (v_{i-1}, v_i]."""
    return [[(i * RING_MAX) // num_buckets, _new_fid((i * RING_MAX) // num_buckets)]
            for i in range(1, num_buckets + 1)]


def load_ring(base_path: str, partition: str) -> dict | None:
    p = ring_path(base_path, partition)
    try:
        return read_json(p)
    except (OSError, ValueError):
        return None


def save_ring(base_path: str, partition: str, nodes: list, instant: str) -> None:
    atomic_write_json(ring_path(base_path, partition),
                      {"partition": partition, "instant": instant,
                       "nodes": sorted(nodes)})


def all_rings(base_path: str) -> dict:
    """-> {partition: ring dict} for every ring on disk."""
    d = ring_dir(base_path)
    st = get_storage(d)
    if not st.isdir(d):
        return {}
    out = {}
    for f in st.listdir(d):
        if f.endswith(".json"):
            name = unquote(f[:-5])
            out["" if name == "__root__" else name] = read_json(os.path.join(d, f))
    return out


def ensure_rings(base_path: str, partitions, num_buckets: int,
                 instant: str) -> dict:
    """Create missing partition rings; -> {partition: nodes}."""
    rings = {}
    for p in partitions:
        r = load_ring(base_path, p)
        if r is None:
            nodes = init_nodes(num_buckets)
            save_ring(base_path, p, nodes, instant)
            rings[p] = nodes
        else:
            rings[p] = r["nodes"]
    return rings


def tag_with_ring(incoming: DataFrame, base_path: str, num_buckets: int,
                  instant: str, dead_groups: set | None = None,
                  rotate_all: bool = False) -> DataFrame:
    """Add ``_hoodie_target_file_id`` from the consistent-hash ring.

    One driver-side distinct over partition paths (bounded by partition
    count), one broadcast join, then codegen-only expressions.

    ``dead_groups``: (partition, file_id) pairs whose file group was
    replaced (insert_overwrite / delete_partition) — their ring nodes are
    rotated to fresh file ids so the write cannot land inside a dead group.
    ``rotate_all`` rotates every node (used by insert_overwrite, which
    replaces all groups of the touched partitions in the same commit).
    """
    spark = incoming.sparkSession
    parts = [r[0] for r in
             incoming.select(meta.PARTITION_PATH).distinct().collect()]
    rings = ensure_rings(base_path, parts, num_buckets, instant)
    for p, nodes in rings.items():
        rotated = False
        for node in nodes:
            if rotate_all or (dead_groups and (p, node[1]) in dead_groups):
                node[1] = _new_fid(int(node[0]))
                rotated = True
        if rotated:
            save_ring(base_path, p, nodes, instant)
    ring_rows = [(p, [(int(v), fid) for v, fid in nodes])
                 for p, nodes in rings.items()]
    rdf = spark.createDataFrame(
        ring_rows, f"{meta.PARTITION_PATH} string, "
                   "__ring array<struct<v: long, fid: string>>")
    h = F.pmod(F.xxhash64(F.col(meta.RECORD_KEY)), F.lit(RING_MAX))
    tagged = incoming.join(F.broadcast(rdf), on=meta.PARTITION_PATH, how="left")
    ge = F.filter(F.col("__ring"), lambda nd: nd["v"] >= h)
    fid = F.coalesce(F.element_at(ge, 1)["fid"], F.col("__ring")[0]["fid"])
    return tagged.withColumn(meta.TARGET_FILE_ID, fid).drop("__ring")


# --------------------------------------------------------------- resize plan
def plan_resize(nodes: list, sizes: dict, split_above: int,
                merge_below: int | None) -> tuple[list, dict] | None:
    """Compute a new ring for one partition.

    ``sizes``: {file_id: live bytes}.  Oversized nodes split at the midpoint
    of their hash range (ConsistentBucketIdentifier#splitBucket); adjacent
    undersized nodes merge into one (mergeBucket).  Returns
    ``(new_nodes, {old_file_id: action})`` for the rewritten buckets, or None
    when nothing qualifies.
    """
    nodes = sorted([int(v), fid] for v, fid in nodes)
    rewritten: dict = {}
    out: list = []
    i = 0
    while i < len(nodes):
        v, fid = nodes[i]
        size = sizes.get(fid, 0)
        prev_v = nodes[i - 1][0] if i > 0 else 0
        if size > split_above and v - prev_v > 1:
            mid = (prev_v + v) // 2
            out.append([mid, _new_fid(mid)])
            out.append([v, _new_fid(v)])
            rewritten[fid] = "split"
            i += 1
            continue
        if (merge_below is not None and i + 1 < len(nodes)
                and size < merge_below
                and sizes.get(nodes[i + 1][1], 0) < merge_below
                and nodes[i + 1][1] not in rewritten):
            nv, nfid = nodes[i + 1]
            out.append([nv, _new_fid(nv)])
            rewritten[fid] = "merge"
            rewritten[nfid] = "merge"
            i += 2
            continue
        out.append([v, fid])
        i += 1
    return (out, rewritten) if rewritten else None
