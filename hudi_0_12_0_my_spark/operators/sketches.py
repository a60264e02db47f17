"""Mergeable-sketch operators: Count-Min heavy hitters, HyperLogLog distincts.

Why sketches at 100 TB: exact per-key state (a groupBy on the raw key) costs a
full-corpus shuffle whose reduce-side state is proportional to the number of
DISTINCT keys. A mergeable sketch replaces that with a MODEL-SIZED aggregate
(depth x width cells / m registers) built in one map-side-combined shuffle of
at most `cells x partitions` partial rows; the data itself never shuffles.

- Count-Min (Cormode & Muthukrishnan 2005): depth seeded hash rows x width
  buckets of counts; point estimate = min over rows of the hashed cell
  (one-sided error <= eps*N with prob 1-delta at width=e/eps, depth=ln(1/delta)).
- HyperLogLog (Flajolet 2007): m=2^p registers of max leading-zero runs;
  estimate = alpha_m * m^2 / sum(2^-reg). Registers here are derived with
  pure integer bit math (bucket = h mod m, rho from the bit length of the
  remaining hash bits, pattern = h >> p via an exact shift) so a SQL oracle
  replays them bit-for-bit — no float enters until the single final
  division, which is IEEE-exact on identical operands in any engine.

NULL keys are excluded before hashing, matching count_distinct semantics
(a NULL neither counts as a distinct key nor lands in any cell).

Both accept the repo-wide `hash_fn` convention (`operators/dedup.py
_seeded_hash`): "xxhash64" for production, "portable_md5" for cross-engine
exact oracles.

Reference parity note: the reference engine exposes no sketch operators —
these extend the LLM-pipeline surface (corpus frequency screens, cardinality
dashboards) per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._arrlit import int_lit

from .dedup import _seeded_hash

# bits of entropy per hash function (portable md5 keeps 15 hex chars = 60
# bits, always non-negative; xxhash64 is signed 64-bit — the sign bit is
# masked off below, leaving 63)
_HASH_BITS = {"portable_md5": 60, "xxhash64": 63}


def _rho_cap(p: int) -> int:
    """Register cap keeping the scaled-integer register sum
    sum(1 << (cap - reg)) + empties * (1 << cap) <= 2^p * 2^cap = 2^62
    inside int64 at any precision (the truncation probability per key is
    2^-cap — unobservable)."""
    return min(55, 62 - p)


def _check_p(p: int) -> None:
    if not 4 <= p <= 16:
        raise ValueError(f"HLL precision p must be in [4, 16], got {p}")


def _nonneg_hash(hash_fn: str):
    h = _seeded_hash(hash_fn)
    if hash_fn == "portable_md5":
        return h  # already a 60-bit non-negative value
    return lambda seed, c: h(seed, c).bitwiseAND(F.lit((1 << 63) - 1))


def cms_cells(df: DataFrame, key_col: str, depth: int = 4, width: int = 64,
              hash_fn: str = "xxhash64") -> DataFrame:
    """The Count-Min sketch itself: (d, bucket, cnt) — at most depth*width
    rows, built with ONE map-side-combined shuffle. Sketches of disjoint
    corpus slices merge by cell-wise addition (same groupBy), which is what
    makes the shape incremental at scale."""
    h = _nonneg_hash(hash_fn)
    key = F.col(key_col)
    rows = df.filter(key.isNotNull()).select(F.posexplode(F.array(*[
        F.pmod(h(d, key), F.lit(width)) for d in range(depth)]))
        .alias("d", "bucket"))
    return rows.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"))


def cms_probe(cells: dict, depth: int, width: int, hash_fn: str,
              key_col: str) -> Column:
    """Map-only Count-Min point-estimate column: `least()` of depth
    literal-array lookups (the collected cells ride into the plan as depth
    arrays of width ints — no join, no second pass over anything).
    `cells` maps (d, bucket) -> count; missing cells are 0."""
    h = _nonneg_hash(hash_fn)
    # ONE array literal per row via a numpy array (int_lit), not width
    # CreateArray children: a 4x256 sketch as per-element F.lit()s costs
    # ~1k py4j round-trips to construct and an expression tree the
    # analyzer walks per query (classic F.lit(list) expands per element —
    # ADVICE r7); a numpy-array literal is one call and one Literal leaf
    arrs = [int_lit(cells.get((d, b), 0) for b in range(width))
            for d in range(depth)]
    return F.least(*[
        F.element_at(arrs[d],
                     F.pmod(h(d, F.col(key_col)), F.lit(width))
                     .cast("int") + 1)
        for d in range(depth)]).cast("bigint")


def heavy_hitters(df: DataFrame, key_col: str, depth: int = 4,
                  width: int = 64, k: int = 20,
                  hash_fn: str = "xxhash64",
                  candidates: DataFrame | None = None) -> DataFrame:
    """Top-k keys by Count-Min estimated frequency: (rank, <key>, est).

    Two stages, both scale-flat:
    1. sketch build — `cms_cells` (model-sized result, collected and
       re-broadcast as literal arrays);
    2. probe — map-only `cms_probe` per candidate key, then TakeOrdered
       top-k (orderBy+limit: per-partition heads + a k-row merge, never a
       global sort of the candidate set).

    `candidates` bounds the probe set (e.g. yesterday's hitters + a sample);
    default is the distinct keys of `df` itself — one extra shuffle that a
    production caller at 100 TB replaces with a candidate feed, which is
    exactly the regime CMS exists for (the sketch never needs the keys).

    Estimates are integers (sums of counts), so ranking and values are
    engine-portable with hash_fn="portable_md5". Ties rank by key ascending.
    """
    mat: dict[tuple[int, int], int] = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_cells(df, key_col, depth, width, hash_fn).collect()}
    cand = (candidates if candidates is not None
            else df.select(key_col).distinct())
    cand = cand.filter(F.col(key_col).isNotNull())
    est = cms_probe(mat, depth, width, hash_fn, key_col)
    top = (cand.withColumn("est", est)
               .orderBy(F.desc("est"), F.asc(key_col)).limit(k))
    w = Window.orderBy(F.desc("est"), F.asc(key_col))
    return (top.withColumn("rank", F.row_number().over(w))  # k rows only
               .select(F.col("rank").cast("int").alias("rank"),
                       key_col, "est"))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, key_col: str,
                  group_cols: list[str] | None = None, p: int = 6,
                  hash_fn: str = "xxhash64", seed: int = 7) -> DataFrame:
    """(<groups>, bucket, reg) — the HLL register table itself, derived with
    pure integer bit math so a SQL oracle replays it exactly:
      h       = seeded hash, non-negative, HASH_BITS bits (NULL keys dropped)
      bucket  = h mod m            (m = 2^p registers)
      pattern = h >> p             (exact integer shift)
      rho     = (HASH_BITS - p) - bitlen(pattern) + 1   (bitlen via bin();
                pattern == 0 -> HASH_BITS - p + 1), capped at _rho_cap(p)
      reg     = max(rho) per (group, bucket)
    ONE map-side-combined shuffle on (groups, bucket) — raw keys never
    shuffle. This is the single source of the register math; hll_distinct
    and the maintained sketch (derived.py sync_hll_sketch) both fold it.
    """
    _check_p(p)
    gcols = list(group_cols or [])
    m = 1 << p
    pbits = _HASH_BITS[hash_fn] - p
    key = F.col(key_col)
    hv = _nonneg_hash(hash_fn)(seed, key)
    staged = df.filter(key.isNotNull()).select(
        *gcols, F.pmod(hv, F.lit(m)).alias("bucket"),
        F.shiftright(hv, p).alias("_pat"))
    pat = F.col("_pat")
    rho = F.when(pat == 0, F.lit(pbits + 1)) \
           .otherwise(F.lit(pbits) - F.length(F.bin(pat)) + 1)
    rho = F.least(rho, F.lit(_rho_cap(p)))
    return (staged.withColumn("_rho", rho.cast("int"))
            .groupBy(*gcols, "bucket").agg(F.max("_rho").alias("reg")))


def hll_estimate_col(s_col: Column, p: int) -> Column:
    """The transcendental-free HLL estimate from a SCALED-INTEGER register
    sum s = sum(1 << (cap - reg)) + empties * (1 << cap): one float multiply
    chain + one division on identical operands — IEEE round-to-nearest makes
    it bit-identical across engines. (The classic low-range linear-counting
    correction needs ln(); deliberately omitted to stay transcendental-free —
    callers wanting it can apply it on the register table.)"""
    m = 1 << p
    return F.round(F.lit(_alpha(m) * m * m) * F.lit(float(1 << _rho_cap(p)))
                   / s_col.cast("double"), 6)


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: list[str] | None = None, p: int = 6,
                 hash_fn: str = "xxhash64", seed: int = 7,
                 out_col: str = "est_distinct") -> DataFrame:
    """HyperLogLog distinct-count estimate per group: (<groups>, est).

    `hll_registers` does the bit-exact derivation; this folds the m rows
    per group into the scaled-integer sum (order-independent, overflow-free
    by _rho_cap) and applies `hll_estimate_col`. Shape: two shuffles, both
    on register-sized data — the raw keys never move.
    """
    _check_p(p)
    gcols = list(group_cols or [])
    m, cap = 1 << p, _rho_cap(p)
    regs = hll_registers(df, key_col, gcols, p, hash_fn, seed)
    # shiftleft's python wrapper wants a literal shift — the SQL form takes
    # a column exponent
    s_used = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {cap} - reg)"))
    n_used = F.count(F.lit(1))
    fold = regs.groupBy(*gcols).agg(
        (s_used + (F.lit(m) - n_used) * F.lit(1 << cap)).alias("_s"))
    return fold.select(*gcols, hll_estimate_col(F.col("_s"), p).alias(out_col))


# ------------------------------------------------------ histogram quantiles
def histogram_cells(df: DataFrame, value_col: str, lo: float, hi: float,
                    bins: int = 128,
                    group_cols: list[str] | None = None) -> DataFrame:
    """Fixed-width histogram sketch: (<groups>, bin, cnt) — the quantile
    member of the mergeable-sketch trio (CMS = frequency, HLL = cardinality,
    histogram = distribution). ONE map-side-combined shuffle of at most
    `bins` rows per group; sketches of disjoint slices merge by cell-wise
    addition. Values are clamped into [lo, hi) (outliers land in the edge
    bins — pick bounds from domain knowledge or a prior pass); NULLs are
    dropped (count semantics). Bin math is floor((v - lo) / width) with
    width = (hi - lo) / bins — one correctly-rounded division per row, so a
    SQL oracle replays the cells exactly when lo/hi/bins are exact decimals.
    """
    if bins < 1 or not hi > lo:
        raise ValueError(f"need hi > lo and bins >= 1, got [{lo}, {hi}) x {bins}")
    gcols = list(group_cols or [])
    width = (hi - lo) / bins
    v = F.col(value_col)
    b = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int")
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b))
    return (df.filter(v.isNotNull())
            .select(*gcols, b.alias("bin"))
            .groupBy(*gcols, "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def histogram_quantiles(df: DataFrame, value_col: str, qs: list[float],
                        lo: float, hi: float, bins: int = 128,
                        group_cols: list[str] | None = None) -> DataFrame:
    """Quantile estimates from the histogram sketch: (<groups>, q, est).

    For each quantile q: target rank = q * N; the containing bin is the
    first bin whose cumulative count reaches the target; the estimate
    interpolates linearly inside it —
        est = lo + (bin + (target - cum_before) / cnt_bin) * width.
    Error is bounded by one bin width — the classic fixed-width trade
    (vs exact percentile_disc's full sort): at 100 TB the sketch costs one
    model-sized shuffle while an exact quantile costs a global sort; and
    unlike t-digest/GK the cells replay exactly in any SQL engine (integer
    counts, then three IEEE-exact float ops), so the gate oracle checks the
    estimates bit-for-bit.

    Everything after the cells is tiny: a per-group cumulative window over
    <= bins rows, a literal-array explode of qs, a min-bin pick per (group,
    q). The raw values never shuffle.
    """
    if bins < 1 or not hi > lo:
        raise ValueError(f"need hi > lo and bins >= 1, got [{lo}, {hi}) x {bins}")
    bad = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad:
        raise ValueError(f"quantiles must be in [0, 1], got {bad}")
    gcols = list(group_cols or [])
    width = (hi - lo) / bins
    cells = histogram_cells(df, value_col, lo, hi, bins, gcols)
    wspec = Window.partitionBy(*[F.col(g) for g in gcols]).orderBy("bin") \
        if gcols else Window.orderBy("bin")
    cum = (cells.withColumn("cum", F.sum("cnt").over(wspec))
           .withColumn("n", F.sum("cnt").over(
               Window.partitionBy(*[F.col(g) for g in gcols])
               if gcols else Window.partitionBy())))
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    probe = (cum.withColumn("q", F.explode(qarr))
             .withColumn("target", F.col("q") * F.col("n").cast("double"))
             .filter(F.col("cum").cast("double") >= F.col("target")))
    first = (probe.groupBy(*gcols, "q")
             .agg(F.min("bin").alias("bin")))
    est = (F.lit(float(lo))
           + (F.col("bin").cast("double")
              + (F.col("target") - (F.col("cum") - F.col("cnt"))
                 .cast("double")) / F.col("cnt").cast("double"))
           * F.lit(width))
    return (first.join(probe, [*gcols, "q", "bin"])
            .select(*gcols, "q", F.round(est, 6).alias("est")))
