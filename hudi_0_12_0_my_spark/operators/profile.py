"""Column profiling: per-column counts / nulls / distincts / extremes.

The data-quality pass a pipeline runs before training on a new source. ONE
wide aggregate produces every column's stats in a single corpus pass (the
multi-count-distinct compiles to Spark's Expand + partial aggregation — one
shuffle total, no per-column jobs), then the 1-row result is exploded into
long format driver-side (bounded by #columns, not data)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    max_str): exact stats per profiled column — numeric extremes as doubles
    rounded to 6, string extremes verbatim, NULL for the non-applicable
    pair. Non-primitive columns (arrays/structs/maps/binary) profile counts
    and distincts only.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, c in enumerate(cols):
        dt = fields[c]
        col = F.col(c)
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            distinct_src = F.to_json(col)      # hashable proxy for distinct
        else:
            distinct_src = col
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("bigint")
             .alias(f"__null_{i}"),
            F.count_distinct(distinct_src).cast("bigint")
             .alias(f"__dist_{i}"),
        ]
        if isinstance(dt, _NUMERIC):
            aggs += [F.round(F.min(col).cast("double"), 6).alias(f"__min_{i}"),
                     F.round(F.max(col).cast("double"), 6).alias(f"__max_{i}")]
        elif isinstance(dt, T.StringType):
            aggs += [F.min(col).alias(f"__smin_{i}"),
                     F.max(col).alias(f"__smax_{i}")]
    row = df.agg(*aggs)
    entries = []
    for i, c in enumerate(cols):
        dt = fields[c]
        num = isinstance(dt, _NUMERIC)
        s = isinstance(dt, T.StringType)
        entries.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{i}").alias("n_null"),
            F.col(f"__dist_{i}").alias("n_distinct"),
            (F.col(f"__min_{i}") if num else F.lit(None).cast("double"))
            .alias("min_num"),
            (F.col(f"__max_{i}") if num else F.lit(None).cast("double"))
            .alias("max_num"),
            (F.col(f"__smin_{i}") if s else F.lit(None).cast("string"))
            .alias("min_str"),
            (F.col(f"__smax_{i}") if s else F.lit(None).cast("string"))
            .alias("max_str")))
    return (row.select(F.explode(F.array(*entries)).alias("p"))
            .select("p.*"))


def _basket_counts(df: DataFrame, order_col: str, item_col: str,
                   buckets: int | None):
    """Shared basket statistics: unordered pair counts c_ab, per-item
    basket counts c_i, and the 1-row basket total — the one order-keyed
    shuffle + one pair-keyed partial-agg shuffle both rule miners share."""
    item = F.col(item_col)
    if buckets is not None:
        item = item % buckets
    # ONE data-sized shuffle total: collect_set dedups within the basket,
    # so the order-keyed groupBy IS the dedup — the former separate
    # distinct() paid a second full (order, item) exchange for nothing.
    # Everything downstream (pair explosion, per-item counts, the basket
    # total) derives map-only from the persisted model-per-row basket sets.
    sets = (df.select(F.col(order_col).alias("o"),
                      item.cast("bigint").alias("i"))
            .groupBy("o").agg(F.sort_array(F.collect_set("i")).alias("its"))
            .persist())
    its = F.col("its")
    pairs = sets.select(F.explode(F.flatten(F.transform(
        its, lambda a, i: F.transform(
            F.slice(its, i + 2, F.size(its)),
            lambda b: F.struct(a.alias("item_a"), b.alias("item_b")))))
    ).alias("p")).select("p.item_a", "p.item_b")
    c_ab = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    # per-item basket counts: explode the (already deduped) sets — a
    # map-only expansion partial-aggregated down to the item vocabulary,
    # replacing the old data-sized groupBy over the distinct pairs
    c_i = (sets.select(F.explode(its).alias("i"))
           .groupBy("i").agg(F.count(F.lit(1)).cast("bigint").alias("n_i")))
    n_tot = sets.agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    return c_ab, c_i, n_tot


def basket_pairs(df: DataFrame, order_col: str = "l_orderkey",
                 item_col: str = "l_partkey", buckets: int | None = None,
                 k: int = 25, min_count: int = 1) -> DataFrame:
    """Market-basket pair mining: for every unordered item pair
    co-occurring in an order, the co-occurrence count and the lift
    n_ab * N / (n_a * n_b) (lift > 1 = the items attract). `buckets`
    optionally coarsens items to `item % buckets` classes — the standard
    trick when raw SKUs are too sparse for pair statistics.

    Returns the top `k` pairs by (count desc, item_a, item_b):
    (item_a, item_b, n_orders, lift). Counts are exact integers; lift is
    one float expression over them, rounded for display.

    Shape for 100 TB: distinct (order, item) + per-order collect_set are
    ONE shuffle on the order key; pair explosion is map-only and bounded
    by the per-order basket size SQUARED (baskets are small — cap upstream
    if a pathological order has thousands of items); pair counting is a
    partial-aggregated shuffle on the pair; per-item counts and the order
    total are model-sized broadcasts; the top-k is a TakeOrdered, never a
    global sort.
    """
    if k < 1 or min_count < 1:
        raise ValueError("basket_pairs: k and min_count must be >= 1")
    c_ab, c_i, n_tot = _basket_counts(df, order_col, item_col, buckets)
    scored = (c_ab
              .filter(F.col("n_orders") >= min_count)
              .join(F.broadcast(c_i.withColumnRenamed("i", "item_a")
                                .withColumnRenamed("n_i", "n_a")), "item_a")
              .join(F.broadcast(c_i.withColumnRenamed("i", "item_b")
                                .withColumnRenamed("n_i", "n_b")), "item_b")
              .crossJoin(F.broadcast(n_tot))
              .select("item_a", "item_b", "n_orders",
                      F.round((F.col("n_orders").cast("double")
                               * F.col("n_baskets"))
                              / (F.col("n_a").cast("double")
                                 * F.col("n_b")), 6).alias("lift")))
    return scored.orderBy(F.col("n_orders").desc(), "item_a",
                          "item_b").limit(k)


def basket_rules(df: DataFrame, order_col: str = "l_orderkey",
                 item_col: str = "l_partkey", buckets: int | None = None,
                 k: int = 25, min_count: int = 1,
                 min_confidence: float = 0.0) -> DataFrame:
    """Directed association rules antecedent -> consequent over the same
    basket statistics as `basket_pairs`: confidence = n_both/n_antecedent
    (one IEEE division over exact integers) plus the symmetric lift.
    Every unordered co-occurrence yields both directions — the two rules
    of a pair have the same lift but different confidence.

    Returns the top `k` rules by (n_both desc, antecedent, consequent):
    (antecedent, consequent, n_both, confidence, lift). Same 100 TB shape
    as basket_pairs (the directed expansion is map-only on the pair
    aggregate, which is item-vocabulary-sized, not data-sized).
    """
    if k < 1 or min_count < 1:
        raise ValueError("basket_rules: k and min_count must be >= 1")
    c_ab, c_i, n_tot = _basket_counts(df, order_col, item_col, buckets)
    pairs = c_ab.filter(F.col("n_orders") >= min_count)
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        F.col("n_orders").alias("n_both")) \
        .unionByName(pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            F.col("n_orders").alias("n_both")))
    scored = (directed
              .join(F.broadcast(c_i.withColumnRenamed("i", "antecedent")
                                .withColumnRenamed("n_i", "n_ante")),
                    "antecedent")
              .join(F.broadcast(c_i.withColumnRenamed("i", "consequent")
                                .withColumnRenamed("n_i", "n_cons")),
                    "consequent")
              .crossJoin(F.broadcast(n_tot))
              .select("antecedent", "consequent", "n_both",
                      F.round(F.col("n_both") / F.col("n_ante").cast("double"),
                              6).alias("confidence"),
                      F.round((F.col("n_both").cast("double")
                               * F.col("n_baskets"))
                              / (F.col("n_ante").cast("double")
                                 * F.col("n_cons")), 6).alias("lift")))
    if min_confidence > 0.0:
        scored = scored.filter(F.col("confidence") >= min_confidence)
    return scored.orderBy(F.col("n_both").desc(), "antecedent",
                          "consequent").limit(k)


def correlation_matrix(df: DataFrame, columns: list[str],
                       scale: str = "decimal(18,2)") -> DataFrame:
    """Pairwise Pearson correlations over numeric columns with EXACT
    accumulation: every sum (x, x^2, x*y) folds in decimal — associative,
    order-insensitive, so the statistics are identical on any engine and
    any partitioning — and only the final correlation is one fixed float
    expression over those exact sums. (Float-sum `corr()` is
    run-to-run nondeterministic under re-partitioning; this is the
    replayable profiling variant.)

    NULL handling is LISTWISE: rows with a NULL in ANY profiled column are
    excluded before accumulation, so n counts exactly the rows the sums
    saw — mixing a global count with NULL-skipping sums would silently
    corrupt r (even flip its sign). `scale` QUANTIZES: values round to the
    decimal's scale before accumulating, so pass a finer scale (e.g.
    ``decimal(28,12)``) for small-magnitude columns; the default suits
    money/quantity data.

    Returns (col_a, col_b, n, r) for each unordered pair, r rounded to 6,
    NULL when either marginal variance is zero. Shape for 100 TB: ONE
    wide partial-aggregated pass computes every sum (k + k + k(k-1)/2
    aggregates for k columns); the pair explosion happens on the 1-row
    result, bounded by k^2, never by data. Decimal width bounds the
    corpus: sums hold to 10^34 — at quantity-scale values that is ~10^30
    rows, not a practical limit. The aggregate row persists implicitly in
    the plan; nothing data-sized is cached.
    """
    if len(columns) < 2:
        raise ValueError("correlation_matrix: need at least 2 columns")
    if len(set(columns)) != len(columns):
        raise ValueError("correlation_matrix: duplicate columns")
    fields = {f.name: f.dataType for f in df.schema.fields}
    bad = [c for c in columns
           if not isinstance(fields.get(c), _NUMERIC)]
    if bad:
        raise ValueError(f"correlation_matrix: non-numeric or unknown "
                         f"columns {bad}")
    dec = lambda c: F.col(c).cast(scale)                      # noqa: E731
    complete = df
    for c in columns:
        complete = complete.filter(F.col(c).isNotNull())
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, c in enumerate(columns):
        aggs += [F.sum(dec(c)).alias(f"__s_{i}"),
                 F.sum(dec(c) * dec(c)).alias(f"__q_{i}")]
    pairs = [(i, j) for i in range(len(columns))
             for j in range(i + 1, len(columns))]
    for i, j in pairs:
        aggs.append(F.sum(dec(columns[i]) * dec(columns[j]))
                    .alias(f"__p_{i}_{j}"))
    row = complete.agg(*aggs)
    n = F.col("__n")
    entries = []
    for i, j in pairs:
        a, b = columns[i], columns[j]
        sx, sy = F.col(f"__s_{i}").cast("double"), \
            F.col(f"__s_{j}").cast("double")
        qx, qy = F.col(f"__q_{i}").cast("double"), \
            F.col(f"__q_{j}").cast("double")
        sxy = F.col(f"__p_{i}_{j}").cast("double")
        vx = n * qx - sx * sx
        vy = n * qy - sy * sy
        r = F.when((vx > 0) & (vy > 0),
                   F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6))
        entries.append(F.struct(F.lit(a).alias("col_a"),
                                F.lit(b).alias("col_b"),
                                n.alias("n"), r.alias("r")))
    return (row.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.*"))
