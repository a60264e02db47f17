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

from ._arrlit import dbl_lit, dbl_mat_lit


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
    return assign_to_centroids(corpus, cents, id_col, vec_col), cents


def assign_to_centroids(df: DataFrame, cents: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Assign each row to its nearest centroid (broadcast argmin): adds a
    `cell` column. `cents` is (cell, centroid) — small enough to broadcast
    by construction. Deterministic tie-break on lowest cell id."""
    c = df.crossJoin(F.broadcast(cents))
    sim = _dot(F.col(vec_col), F.col("centroid")) / \
        (_norm(F.col(vec_col)) * _norm(F.col("centroid")))
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
    return (c.withColumn("sim", sim)
             .withColumn("_rn", F.row_number().over(w))
             .filter("_rn = 1")
             .drop("_rn", "sim", "centroid"))


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
        lit = dbl_lit(hp)
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


def kmeans_assign(corpus: DataFrame, k: int = 4, iters: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Lloyd k-means over an embedding column with DETERMINISTIC init (the
    k lowest-id rows are the starting centroids), returning the final
    hard assignment: (id, cluster, dist).

    Iterative distributed shape: per round, centroids are broadcast as
    literal arrays (model-sized driver state, k*dim doubles — never the
    corpus), assignment is a map-only argmin over squared-L2 distances
    (whole-stage codegen, no UDF), and the centroid recompute is ONE
    partially-aggregated shuffle keyed on (cluster, dim-position) — the
    combiner reduces it to k*dim rows per partition, so shuffle volume is
    independent of corpus size. At 100 TB each Lloyd round costs one scan
    plus a model-sized agg; rounds are a driver loop, exactly how MLlib
    schedules it. Empty clusters keep their previous centroid.

    Ties (equal distance to two centroids) break to the LOWEST cluster
    index via array_position-of-min — deterministic and replayable.
    """
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if not rows:
        raise ValueError("kmeans_assign: empty corpus")
    k = min(k, len(rows))   # mirror pq_train's ksub clamp: fewer rows than k
    cents = [[float(x) for x in r[1]] for r in rows]

    def _assigned():
        # one transform over a literal centroid MATRIX rather than k
        # separate aggregate() expressions: ~3x through the interpreted-HOF
        # evaluator, identical folds per element (see pq_train)
        cmat = dbl_mat_lit(cents)
        v = F.col(vec_col).cast("array<double>")
        darr = F.transform(cmat, lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))
        return corpus.select(
            F.col(id_col), F.col(vec_col),
            (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
            .alias("cluster"),
            F.sqrt(F.array_min(darr)).alias("dist"))

    dim = len(cents[0])
    for _ in range(iters):
        means = (_assigned()
                 .select("cluster", F.posexplode(F.col(vec_col)
                                                 .cast("array<double>"))
                         .alias("pos", "x"))
                 .groupBy("cluster", "pos").agg(F.avg("x").alias("m"))
                 .collect())
        by_cl: dict = {}
        for r in means:
            by_cl.setdefault(r.cluster, [0.0] * dim)[r.pos] = r.m
        cents = [by_cl.get(i, cents[i]) for i in range(k)]
    return _assigned().select(id_col, "cluster", "dist")


def prototype_prune(corpus: DataFrame, k: int = 4, iters: int = 2,
                    keep_frac: float = 0.7, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws"): cluster the embeddings with :func:`kmeans_assign`
    (deterministic Lloyd), rank each cluster's members by distance to
    their prototype (centroid), and KEEP only the hardest `keep_frac`
    fraction — the most prototypical (closest, most redundant) examples
    are dropped, which the paper shows beats random pruning when data is
    abundant. Ties on distance break by id — fully deterministic.

    Returns (id, cluster, dist, hardness_rank) for the survivors,
    hardness_rank = 1 is the farthest-from-centroid member.

    Shape for 100 TB: the k-means rounds are scan + model-sized agg (see
    kmeans_assign); the pruning adds ONE window shuffle keyed on cluster.
    Cluster cardinality is corpus/k — at real scale use k large enough
    (10^4-10^5, SemDeDup-style) that a cluster fits a task, which is also
    what the method itself wants.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("prototype_prune: keep_frac must be in (0, 1]")
    a = kmeans_assign(corpus, k=k, iters=iters,
                      id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("cluster").orderBy(F.col("dist").desc(),
                                              F.col(id_col).asc())
    return (a.withColumn("_r", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(
                Window.partitionBy("cluster")))
            .filter(F.col("_r") <= F.ceil(F.col("_n") * F.lit(keep_frac)))
            .select(id_col, "cluster", "dist",
                    F.col("_r").cast("int").alias("hardness_rank")))


def quantize_int8(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127/max|x|, element
    q_i = floor(x_i*scale + 0.5) (explicit half-up — engine-portable,
    unlike bankers' round). Map-only; the quantized corpus is ~4x smaller
    than float32 on disk and in shuffle, the standard memory-bound ANN
    trade. Output: (id, qvec array<int>, qscale double)."""
    v = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(v, F.abs))
    scale = F.lit(127.0) / F.nullif(mx, F.lit(0.0))
    q = F.when(scale.isNull(),
               F.transform(v, lambda x: F.lit(0).cast("int"))) \
         .otherwise(F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5))
                                .cast("int")))
    return df.select(F.col(id_col), q.alias("qvec"),
                     F.coalesce(scale, F.lit(0.0)).alias("qscale"))


def quantized_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          exclude_self: bool = True) -> DataFrame:
    """Approximate top-k cosine over int8-quantized vectors.

    Cosine is scale-invariant, so the per-vector quantization scale cancels
    and the score is computed purely on the integer codes: integer dot /
    (integer norms) — exact integer arithmetic until one final double
    division, which makes the result bit-reproducible across engines
    (unlike float dot products, whose sum association varies). Same
    broadcast-queries + per-partition window shape as cosine_topk; at scale
    the corpus scan moves 4x fewer bytes.

    Output: (query_id, neighbor_id, qcosine, rank).
    """
    cq = quantize_int8(corpus, id_col, vec_col) \
        .select(F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("cv"))
    qq = quantize_int8(queries, id_col, vec_col) \
        .select(F.col(id_col).alias("query_id"), F.col("qvec").alias("qv"))
    joined = cq.crossJoin(F.broadcast(qq))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))

    def _idot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
                           F.lit(0).cast("long"), lambda acc, x: acc + x)

    qcos = (_idot(F.col("qv"), F.col("cv")).cast("double")
            / (F.sqrt(_idot(F.col("qv"), F.col("qv")).cast("double"))
               * F.sqrt(_idot(F.col("cv"), F.col("cv")).cast("double"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"),
                                               F.asc("neighbor_id"))
    return (joined.withColumn("qcosine", qcos)
                  .withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "qcosine", "rank"))


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


def _md5_sign(tag: str) -> float:
    """Engine-portable Rademacher component: +1/-1 from the md5 parity of a
    tag string — Spark, DuckDB and Python derive the identical matrix, so
    oracles replay the projection exactly (the portable_md5 convention used
    by the MinHash/SimHash operators)."""
    import hashlib
    return 1.0 if int(hashlib.md5(tag.encode()).hexdigest()[:15], 16) % 2 == 0 \
        else -1.0


def random_projection(df: DataFrame, in_dim: int, out_dim: int,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      scale: bool = True) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a deterministic
    Rademacher (±1) matrix (Achlioptas'01 database-friendly construction —
    same distance-preservation guarantee as gaussian, integer-friendly).

    The out_dim x in_dim matrix is derived driver-side from md5 parities and
    embedded as literal arrays, so the projection is ONE map-only pass per
    row (out_dim folded dot products inside whole-stage codegen): no
    shuffle, no UDF, no broadcast — at 100 TB it runs at scan speed and cuts
    every downstream ANN/cluster scan by in_dim/out_dim.

    Output: (id, projected array<double>); scale=True multiplies by
    1/sqrt(out_dim) so expected norms are preserved (the JL scaling).
    """
    planes = [[_md5_sign(f"rp-{i}-{j}") for j in range(in_dim)]
              for i in range(out_dim)]
    s = 1.0 / (out_dim ** 0.5) if scale else 1.0
    v = F.col(vec_col).cast("array<double>")
    comps = [(_dot(v, dbl_lit(p)) * F.lit(s))
             for p in planes]
    return df.select(F.col(id_col), F.array(*comps).alias("projected"))


def hard_negatives(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   lo: float = 0.3, hi: float = 0.8,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-k
    most-similar corpus rows whose cosine falls inside [lo, hi) — close
    enough to be informative negatives, below the near-duplicate band that
    would make them false negatives.

    Same plan shape as cosine_topk (broadcast query side, map-only scoring,
    one per-query k-row reduction); the band filter runs before the window
    so out-of-band rows never enter the rank exchange.

    Output: (query_id, neighbor_id, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
    cos = _dot(F.col("qvec"), F.col("cvec")) / \
        (_norm(F.col("qvec")) * _norm(F.col("cvec")))
    banded = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cosine", cos)
              .filter((F.col("cosine") >= lo) & (F.col("cosine") < hi)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (banded.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def rrf_fuse(rankings: list, k: int = 60, id_col: str = "doc_id",
             rank_col: str = "rank", query_col: str | None = None,
             top: int | None = None) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings:
    score(d) = sum over lists r of 1 / (k + rank_r(d)).

    The standard hybrid-retrieval combiner (Cormack/Clarke/Buettcher RRF,
    SIGIR'09; what lexical+dense "hybrid search" engines ship): fuses e.g.
    a BM25 top-k with a dense-cosine top-k without score calibration —
    only ranks enter the formula, so differently-scaled scores fuse
    sanely. Documents missing from a list simply contribute nothing.

    Each input must carry (query_col?, id_col, rank_col). Output:
    (query_col?, id_col, rrf, n_lists, rank) — rrf rounded to 6 decimals,
    final rank deterministic by (rrf desc, id asc).

    Shape for 100 TB: the inputs are already top-k rankings (k rows per
    query, per list) — the union is map-only and the fuse is ONE hash agg
    over at most lists*k rows per query; the final per-query rank windows
    over <= lists*k rows. Nothing corpus-sized enters this operator.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = [r.select(*keys, F.col(rank_col).cast("long").alias("_rk"))
             for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = (u.groupBy(*keys)
               .agg(F.round(F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("_rk"))), 6)
                    .alias("rrf"),
                    F.count(F.lit(1)).cast("int").alias("n_lists")))
    w = Window.partitionBy(*([query_col] if query_col else [])) \
              .orderBy(F.desc("rrf"), F.asc(id_col))
    out = scored.withColumn("rank", F.row_number().over(w))
    if top is not None:
        out = out.filter(F.col("rank") <= top)
    return out


def pq_train(corpus: DataFrame, m: int = 8, ksub: int = 16,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list:
    """Train product-quantization codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the vector into `m`
    subvectors and run one deterministic Lloyd round per subspace (init =
    the `ksub` lowest-id rows' subvectors; empty codes keep their init
    centroid; argmin ties break to the lowest code).

    Returns nested Python lists `cents[m][ksub][dsub]` — MODEL-sized
    driver state (m*ksub*dsub doubles), broadcast as literals by the
    encode/search steps. All m subspaces train in ONE corpus pass: the
    per-subspace code assignment is a map-only argmin and the centroid
    recompute is a single partially-aggregated shuffle of (subspace, code,
    pos) cells — shuffle volume m*ksub*dsub rows per task, independent of
    corpus size.
    """
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(ksub).collect()
    if not rows:
        raise ValueError("pq_train: empty corpus")
    # fewer rows than requested codes: train the codebook that exists
    # (ksub = |corpus|) instead of dying on an index error downstream
    ksub = min(ksub, len(rows))
    dim = len(rows[0][1])
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    dsub = dim // m
    cents = [[[float(x) for x in r[1][j * dsub:(j + 1) * dsub]]
              for r in rows] for j in range(m)]

    staged = corpus.select(F.col(vec_col).cast("array<double>").alias("_v"))
    v = F.col("_v")

    def code_expr(j, cj):
        # ONE transform over a literal centroid MATRIX instead of ksub
        # separate aggregates: 3x faster through the interpreted-HOF
        # evaluator (identical results — same folds per element)
        cmat = dbl_mat_lit(cj)
        sub = F.slice(v, j * dsub + 1, dsub)
        darr = F.transform(cmat, lambda c: F.aggregate(
            F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))
        return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")

    cells = staged.select(F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), code_expr(j, cents[j]).alias("code"),
                 F.slice(v, j * dsub + 1, dsub).alias("sub"))
        for j in range(m)])).alias("c")).select("c.*")
    means = (cells.select("j", "code", F.posexplode("sub").alias("pos", "x"))
             .groupBy("j", "code", "pos").agg(F.avg("x").alias("mean"))
             .collect())
    upd = {}
    for r in means:
        upd.setdefault((r.j, r.code), [0.0] * dsub)[r.pos] = r.mean
    return [[upd.get((j, c), cents[j][c]) for c in range(ksub)]
            for j in range(m)]


def pq_encode(corpus: DataFrame, cents: list, id_col: str = "vec_id",
              vec_col: str = "embedding",
              passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Encode vectors against trained PQ codebooks:
    (id, *passthrough, codes array<int>).

    Map-only argmin per subspace against literal centroids — at 100 TB the
    encoded table is dim*8/m/4 x smaller than float32 (e.g. 64-dim, m=8:
    8 bytes of codes vs 256 bytes), the scan-byte cut PQ exists for.
    `passthrough` carries extra columns (e.g. an IVF cell) through the
    encode so composed indexes stay one pass instead of joining back.
    """
    m, dsub = len(cents), len(cents[0][0])
    staged = corpus.select(F.col(id_col), *[F.col(c) for c in passthrough],
                           F.col(vec_col).cast("array<double>").alias("_v"))
    v = F.col("_v")

    def code_expr(j):
        # one transform over the literal centroid matrix (see pq_train)
        cmat = dbl_mat_lit(cents[j])
        sub = F.slice(v, j * dsub + 1, dsub)
        darr = F.transform(cmat, lambda c: F.aggregate(
            F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))
        return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")

    return staged.select(id_col, *passthrough,
                         F.array(*[code_expr(j) for j in range(m)])
                         .alias("codes"))


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
            m: int = 8, ksub: int = 16, cents: list | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            exclude_self: bool = True) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance: the corpus is scanned
    as codes only; each candidate's distance is ||q - recon(codes)||^2
    against the query's RAW vector (asymmetric = query side stays exact).

    The reconstruction concatenates the code-selected centroids (literal
    lookup, map-only) and the distance is ONE ordered 64-term fold — the
    identical left-to-right summation a SQL engine replays, so results are
    oracle-exact. Broadcast queries + per-partition TakeOrdered window,
    the cosine_topk shape. Output: (query_id, neighbor_id, adist, rank).
    """
    if cents is None:
        cents = pq_train(corpus, m=m, ksub=ksub,
                         id_col=id_col, vec_col=vec_col)
    m, dsub = len(cents), len(cents[0][0])
    codes = pq_encode(corpus, cents, id_col, vec_col) \
        .select(F.col(id_col).alias("neighbor_id"), "codes")
    qq = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("_q"))
    joined = codes.crossJoin(F.broadcast(qq))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    lits = [dbl_mat_lit(cents[j])
            for j in range(m)]
    recon = F.flatten(F.array(*[
        F.element_at(lits[j], F.col("codes")[j] + 1) for j in range(m)]))
    adist = F.aggregate(F.zip_with(F.col("_q"), recon,
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                               F.asc("neighbor_id"))
    return (joined.withColumn("adist", adist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("adist", 6).alias("adist"),
                    F.col("rank").cast("int")))


def mmr_rerank(corpus: DataFrame, queries: DataFrame, k: int = 10,
               fetch_k: int = 50, lambda_: float = 0.7,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick k of the top-`fetch_k` retrieved candidates maximizing
        lambda * rel(c) - (1 - lambda) * max_{s in selected} sim(c, s)
    — relevance traded against redundancy, the standard diversity pass a
    RAG/retrieval pipeline runs after ANN. Ties break to the lowest
    neighbor id; the first pick is the plain top-1.

    Shape for 100 TB: retrieval (cosine top-fetch_k) and the per-query
    candidate pairwise-sim matrix are DISTRIBUTED (the matrix is
    fetch_k^2 rows per query, bucketed by query — never corpus-pairwise);
    only the greedy selection itself runs on the driver, over MODEL-sized
    state (fetch_k rows + fetch_k^2/2 sims per query). Greedy MMR is
    inherently sequential in k — this split is how production retrieval
    stacks run it.

    Output: (query_id, neighbor_id, mmr_score, rank) with rank 1..k.
    """
    # persisted: the retrieval lineage (broadcast cross-join + per-query
    # window over the corpus) would otherwise re-run for the collect AND
    # once per side of the pairwise self-join; cand itself is model-sized
    # (fetch_k rows per query)
    cand = cosine_topk(corpus, queries, k=fetch_k,
                       id_col=id_col, vec_col=vec_col).persist()
    cv = corpus.select(F.col(id_col).alias("_nid"),
                       F.col(vec_col).alias("_v"))
    withv = cand.join(cv, cand["neighbor_id"] == cv["_nid"]) \
                .select("query_id", "neighbor_id", "cosine", "_v")
    a = withv.select(F.col("query_id"),
                     F.col("neighbor_id").alias("_ia"),
                     F.col("_v").alias("_va"))
    b = withv.select(F.col("query_id").alias("_qb"),
                     F.col("neighbor_id").alias("_ib"),
                     F.col("_v").alias("_vb"))
    pair_sim = (_dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb"))))
    sims = (a.join(b, (a["query_id"] == b["_qb"])
                   & (a["_ia"] < b["_ib"]))
            .select("query_id", "_ia", "_ib", pair_sim.alias("_s")))

    by_q: dict = {}
    for r in cand.collect():
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine))
    sim_map: dict = {}
    for r in sims.collect():
        sim_map[(r.query_id, r._ia, r._ib)] = r._s
    cand.unpersist()

    def s_of(q, x, y):
        return sim_map.get((q, x, y) if x < y else (q, y, x), 0.0)

    out = []
    for q, cands in by_q.items():
        # candidates in (rel desc, id asc) retrieval order
        cands = sorted(cands, key=lambda t: (-t[1], t[0]))
        selected: list = []
        remaining = dict(cands)
        for rank in range(1, min(k, len(cands)) + 1):
            best = None
            for nid, rel in cands:
                if nid not in remaining:
                    continue
                red = max((s_of(q, nid, s) for s in selected), default=0.0)
                score = lambda_ * rel - (1.0 - lambda_) * red
                if best is None or score > best[0] or \
                        (score == best[0] and nid < best[1]):
                    best = (score, nid)
            out.append((q, best[1], round(best[0], 6), rank))
            selected.append(best[1])
            del remaining[best[1]]
    spark = corpus.sparkSession
    # id columns take the corpus id type — the operator stays id-type
    # agnostic like cosine_topk/pq_topk
    from pyspark.sql import types as T
    id_type = corpus.schema[id_col].dataType
    schema = T.StructType([
        T.StructField("query_id", id_type),
        T.StructField("neighbor_id", id_type),
        T.StructField("mmr_score", T.DoubleType()),
        T.StructField("rank", T.IntegerType())])
    return spark.createDataFrame(out, schema)


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
               num_cells: int = 16, nprobe: int = 4,
               m: int = 8, ksub: int = 16, cents: list | None = None,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ (the FAISS IVFADC structure, Jegou'11 §IV): coarse IVF cells
    prune WHICH rows are scanned (partition pruning via nprobe) while PQ
    codes shrink WHAT is scanned (m bytes per row) — the two orthogonal
    levers a billion-vector index needs composed.

    Candidates come from each query's `nprobe` nearest cells (broadcast
    centroid argmin, the ivf_cosine_topk probe) and are ranked by PQ
    asymmetric distance against literal codebooks. With nprobe = num_cells
    the result equals plain pq_topk exactly (the correctness-gate
    configuration: cell partitioning must neither lose nor duplicate any
    vector). Output: (query_id, neighbor_id, adist, rank).
    """
    if cents is None:
        cents = pq_train(corpus, m=m, ksub=ksub,
                         id_col=id_col, vec_col=vec_col)
    m, dsub = len(cents), len(cents[0][0])
    assigned, cell_cents = assign_ivf_cells(corpus, num_cells,
                                            id_col, vec_col)
    # cell passes THROUGH the encode — one pass over the assigned corpus,
    # no corpus-sized join back and no second centroid-assignment run
    codes = (pq_encode(assigned, cents, id_col, vec_col,
                       passthrough=("cell",))
             .select(F.col(id_col).alias("neighbor_id"), "codes", "cell"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("_q"))
    qc = q.crossJoin(F.broadcast(cell_cents))
    sim = (_dot(F.col("_q"), F.col("centroid"))
           / (_norm(F.col("_q")) * _norm(F.col("centroid"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (qc.withColumn("_sim", sim)
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= nprobe)
              .select("query_id", "_q", "cell"))
    cand = (codes.join(F.broadcast(probes), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id")))
    lits = [dbl_mat_lit(cents[j])
            for j in range(m)]
    recon = F.flatten(F.array(*[
        F.element_at(lits[j], F.col("codes")[j] + 1) for j in range(m)]))
    adist = F.aggregate(F.zip_with(F.col("_q"), recon,
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, x: acc + x)
    w2 = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                                F.asc("neighbor_id"))
    return (cand.withColumn("adist", adist)
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("adist", 6).alias("adist"),
                    F.col("rank").cast("int")))
