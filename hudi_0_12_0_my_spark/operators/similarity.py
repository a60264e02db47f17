"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k. The query side is broadcast (it is
  small by construction); the corpus side is a narrow map + per-partition
  top-k via window. At 100 TB the scan parallelizes; no corpus shuffle except
  the final per-query k-row reduction.
- ivf_cosine_topk: IVF-style scale path — corpus pre-assigned to centroid
  cells; queries probe only `nprobe` nearest cells, cutting scanned rows by
  ~cells/nprobe. Centroid assignment is itself a broadcast join.
All math in double precision via zip_with/aggregate (JVM codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str | None = None,
                exclude_self: bool = True) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    Output: (query_id, neighbor_id, cosine, rank) — rank 1..k, deterministic
    tie-break on neighbor id.
    """
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
    scored = joined.withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "cosine", "rank"))


def assign_ivf_cells(corpus: DataFrame, num_cells: int = 16,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Pick `num_cells` deterministic sample rows as centroids and assign
    every corpus vector to its nearest centroid (one broadcast join).

    Returns (assigned_corpus with `cell`, centroids (cell, centroid)).
    A production build would run a few k-means refinement rounds — each round
    is the same broadcast-join + groupBy(avg) shape, so the plan scales the
    same way; one round is enough for the correctness surface.
    """
    cents = (corpus
             .withColumn("_r", F.xxhash64(F.col(id_col) + F.lit(seed)))
             .orderBy("_r").limit(num_cells)
             .select(F.row_number().over(Window.orderBy(F.asc("_r"), F.asc(id_col)))
                     .alias("cell"),
                     F.col(vec_col).alias("centroid")))
    c = corpus.crossJoin(F.broadcast(cents))
    sim = _dot(F.col(vec_col), F.col("centroid")) / \
        (_norm(F.col(vec_col)) * _norm(F.col("centroid")))
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
    assigned = (c.withColumn("sim", sim)
                 .withColumn("_rn", F.row_number().over(w))
                 .filter("_rn = 1")
                 .drop("_rn", "sim", "centroid"))
    return assigned, cents


def ivf_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                    num_cells: int = 16, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the `nprobe` nearest IVF cells per query."""
    assigned, cents = assign_ivf_cells(corpus, num_cells, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qc = q.crossJoin(F.broadcast(cents))
    sim = _dot(F.col("qvec"), F.col("centroid")) / \
        (_norm(F.col("qvec")) * _norm(F.col("centroid")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
    probes = (qc.withColumn("sim", sim)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= nprobe)
                .select("query_id", "qvec", "cell"))
    cand = assigned.join(F.broadcast(probes), on="cell") \
                   .filter(F.col(id_col) != F.col("query_id"))
    cos = _dot(F.col("qvec"), F.col(vec_col)) / \
        (_norm(F.col("qvec")) * _norm(F.col(vec_col)))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (cand.withColumn("cosine", cos)
                .withColumn("rank", F.row_number().over(w2))
                .filter(F.col("rank") <= k)
                .select("query_id", F.col(id_col).alias("neighbor_id"),
                        "cosine", "rank"))


def hyperplane_signatures(df: DataFrame, dim: int, num_bits: int = 16,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 42) -> DataFrame:
    """Signed-random-projection (SimHash-for-vectors) LSH signature.

    `num_bits` seeded hyperplanes are generated driver-side (Rademacher ±1
    components — the Achlioptas construction, same cosine-LSH guarantee as
    gaussian planes) and embedded as literal arrays, so the signature is ONE
    map-only projection per row: sign(dot(v, h_i)) folded into a bigint.
    No shuffle, no UDF; at 100 TB this runs at scan speed.

    Returns (id, sig) where bit i of `sig` = [dot(v, h_i) > 0].
    """
    import random
    rnd = random.Random(seed)
    planes = [[1.0 if rnd.random() < 0.5 else -1.0 for _ in range(dim)]
              for _ in range(num_bits)]
    v = F.col(vec_col)
    sig = F.lit(0).cast("long")
    for i, hp in enumerate(planes):
        lit = F.array(*[F.lit(x) for x in hp])
        bit = F.when(_dot(v, lit) > 0, F.lit(1).cast("long")).otherwise(F.lit(0))
        sig = sig + bit * F.lit(1 << i).cast("long")
    return df.select(F.col(id_col), sig.alias("sig"))


def lsh_cosine_topk(corpus: DataFrame, queries: DataFrame, dim: int,
                    k: int = 10, num_bits: int = 16, bands: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42) -> DataFrame:
    """Approximate top-k via hyperplane-LSH banding + exact cosine re-rank.

    Candidates = corpus rows sharing at least one of `bands` signature bands
    with the query (equi-join on (band, chunk) — bucketed, never all-pairs).
    The exact cosine then re-ranks only candidates. Recall rises with bands
    (more, smaller bands = more candidates); the scale knobs are the same as
    MinHash-LSH banding. Output: (query_id, neighbor_id, cosine, rank).
    """
    assert num_bits % bands == 0
    r = num_bits // bands
    mask = (1 << r) - 1

    def banded(sig_df, idc):
        return sig_df.select(
            F.col(idc), F.posexplode(F.array(*[
                F.shiftright("sig", r * b).bitwiseAND(mask)
                for b in range(bands)])).alias("band", "chunk"))

    csig = hyperplane_signatures(corpus, dim, num_bits, id_col, vec_col, seed)
    qsig = hyperplane_signatures(queries, dim, num_bits, id_col, vec_col, seed) \
        .withColumnRenamed(id_col, "query_id")
    cand = (banded(csig, id_col)
            .join(F.broadcast(banded(qsig, "query_id")), on=["band", "chunk"])
            .filter(F.col(id_col) != F.col("query_id"))
            .select("query_id", id_col).distinct())
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    scored = (cand.join(F.broadcast(q), on="query_id").join(c, on=id_col)
              .withColumn("cosine", _dot(F.col("qvec"), F.col("cvec"))
                          / (_norm(F.col("qvec")) * _norm(F.col("cvec")))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", F.col(id_col).alias("neighbor_id"),
                          "cosine", "rank"))


def semantic_dedup(corpus: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   num_cells: int = 16) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop semantic
    near-duplicates — documents whose embeddings are nearly identical even
    when their text is not — keeping one representative (min id) per
    duplicate group.

    Pipeline = the paper's recipe re-expressed in existing operators:
    k-means-style cells (`assign_ivf_cells`) bound the pair search, cosine
    >= threshold pairs within a cell (`embedding_near_dup_pairs`), and
    transitive closure over those pairs (`dedup_by_components`) so chains
    of pairwise-similar embeddings collapse to one survivor. Every stage is
    bucketed or map-only; nothing is all-pairs at any scale.
    """
    from .graph import dedup_by_components
    pairs = embedding_near_dup_pairs(corpus, threshold, id_col, vec_col,
                                     num_cells)
    return dedup_by_components(corpus, pairs, id_col=id_col)


def embedding_near_dup_pairs(corpus: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             num_cells: int = 16) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= thr).

    Blocked by IVF cell: only vectors in the same cell are compared — the
    scalable replacement for the quadratic all-pairs join (near-dups nearly
    always share the nearest centroid at high thresholds).
    """
    assigned, _ = assign_ivf_cells(corpus, num_cells, id_col, vec_col)
    a = assigned.select(F.col("cell"), F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"))
    b = assigned.select(F.col("cell"), F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("vb"))
    pairs = a.join(b, on="cell").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (pairs.withColumn("cosine", cos)
                 .filter(F.col("cosine") >= threshold)
                 .select("id_a", "id_b", "cosine"))
