"""Sketch operators: Count-Min heavy hitters, HyperLogLog distincts,
plus the round-4 text additions (PMI pairs, containment near-dup)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from hudi_0_12_0_my_spark import operators as ops


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: key k appears ~ (50 - k) times, keys 0..49
    rows = [Row(key=k) for k in range(50) for _ in range(50 - k)]
    return spark.createDataFrame(rows)


def test_cms_never_underestimates_and_orders_hitters(skewed):
    exact = {r["key"]: r["n"] for r in
             skewed.groupBy("key").agg(F.count("*").alias("n")).collect()}
    got = ops.heavy_hitters(skewed, "key", depth=4, width=32, k=10).collect()
    assert len(got) == 10
    assert [r["rank"] for r in got] == list(range(1, 11))
    for r in got:
        # CMS is one-sided: estimate >= true count, always
        assert r["est"] >= exact[r["key"]]
    # the true #1 key (key=0, 50 occurrences) must be estimated at least 50
    assert got[0]["est"] >= 50


def test_cms_wide_sketch_is_exact(skewed):
    # width >> distinct keys -> no collisions -> estimates equal exact counts
    got = {r["key"]: r["est"]
           for r in ops.heavy_hitters(skewed, "key", depth=4, width=4096,
                                      k=50).collect()}
    exact = {r["key"]: r["n"] for r in
             skewed.groupBy("key").agg(F.count("*").alias("n")).collect()}
    assert got == exact


def test_cms_cells_merge_by_addition(spark):
    # sketch(A union B) == cellwise sum of sketch(A) and sketch(B):
    # the mergeability that makes the shape incremental at scale
    a = spark.createDataFrame([Row(key=i % 7) for i in range(100)])
    b = spark.createDataFrame([Row(key=i % 11) for i in range(80)])
    u = a.unionAll(b)
    whole = {(r["d"], r["bucket"]): r["cnt"]
             for r in ops.cms_cells(u, "key", 3, 16).collect()}
    parts: dict = {}
    for df in (a, b):
        for r in ops.cms_cells(df, "key", 3, 16).collect():
            parts[(r["d"], r["bucket"])] = \
                parts.get((r["d"], r["bucket"]), 0) + r["cnt"]
    assert whole == parts


def test_cms_candidate_feed_restricts_probe(skewed):
    cand = skewed.sparkSession.createDataFrame([Row(key=0), Row(key=49)])
    got = ops.heavy_hitters(skewed, "key", depth=4, width=4096, k=10,
                            candidates=cand).collect()
    assert {r["key"] for r in got} == {0, 49}
    assert got[0]["key"] == 0  # 50 occurrences vs 1


@pytest.mark.parametrize("hash_fn", ["xxhash64", "portable_md5"])
def test_hll_estimate_within_rel_error(spark, hash_fn):
    # m=256 registers -> typical rel. error ~1.04/sqrt(m) ~ 6.5%
    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    est = ops.hll_distinct(df, "k", p=8, hash_fn=hash_fn).collect()[0][0]
    assert abs(est - n) / n < 0.15


def test_hll_insensitive_to_duplication(spark):
    base = spark.range(1000).select(F.col("id").alias("k"))
    dup = base.unionAll(base).unionAll(base)
    e1 = ops.hll_distinct(base, "k", p=8).collect()[0][0]
    e3 = ops.hll_distinct(dup, "k", p=8).collect()[0][0]
    assert e1 == e3  # registers are max-folds: duplicates change nothing


def test_hll_grouped(spark):
    df = spark.createDataFrame(
        [Row(g="a", k=i) for i in range(100)]
        + [Row(g="b", k=i) for i in range(10)])
    got = {r["g"]: r["est_distinct"]
           for r in ops.hll_distinct(df, "k", group_cols=["g"], p=8).collect()}
    assert got["a"] > got["b"] > 0


def test_hll_no_raw_key_shuffle(spark):
    # the exchange key must be the register bucket, never the raw key:
    # grouping state is m rows per group, not |distinct keys|
    df = spark.range(1000).select(F.col("id").alias("k"))
    plan = ops.hll_distinct(df, "k", p=6)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "bucket" in plan
    # first aggregate's partial (map-side) fold happens before any exchange
    # of per-key rows: the only hashpartitioning key present is the bucket
    assert "hashpartitioning(k" not in plan


def test_pmi_ranks_true_collocation_first(spark):
    rows = [Row(text="san francisco is foggy today")] * 30 \
        + [Row(text="new york is busy today")] * 30 \
        + [Row(text="the weather report for today is out")] * 30
    got = ops.pmi_top_pairs(spark.createDataFrame(rows), window=2, k=15,
                            min_count=5).collect()
    # collocations exclusive to one sentence share the max score tier;
    # pairs of corpus-wide words (is/today appear in all 90 docs) sit below
    best = max(r["score"] for r in got)
    top_pairs = {(r["tok_a"], r["tok_b"]) for r in got if r["score"] == best}
    assert ("francisco", "san") in top_pairs
    assert ("new", "york") in top_pairs
    assert ("is", "today") not in top_pairs
    for r in got:
        assert r["score"] == pytest.approx(
            r["c_ab"] / (r["c_a"] * r["c_b"]))


def test_pmi_window_bounds_pairs(spark):
    df = spark.createDataFrame([Row(text="a b c d e")] * 10)
    got = ops.pmi_top_pairs(df, window=1, k=50, min_count=1).collect()
    # window=1 -> only adjacent pairs
    assert {(r["tok_a"], r["tok_b"]) for r in got} == \
        {("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")}


def test_containment_catches_doc_in_doc(spark):
    big = " ".join(f"w{i}" for i in range(200))
    small = " ".join(f"w{i}" for i in range(40, 60))  # embedded span
    df = spark.createDataFrame(
        [Row(doc_id=1, text=big), Row(doc_id=2, text=small),
         Row(doc_id=3, text="совершенно unrelated text about nothing")])
    cont = ops.ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] == 1.0
    # jaccard misses the same pair at any usable threshold
    jac = ops.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert jac == []


def test_hll_registers_merge_by_max(spark):
    # registers(A union B) == bucket-wise max of registers(A), registers(B):
    # the mergeability that lets per-slice register tables fold into a
    # corpus-wide one (and what sync_hll_sketch's monotone path relies on)
    from hudi_0_12_0_my_spark.operators.sketches import hll_registers
    a = spark.range(0, 400).select(F.col("id").alias("k"))
    b = spark.range(300, 700).select(F.col("id").alias("k"))
    whole = {r["bucket"]: r["reg"]
             for r in hll_registers(a.unionAll(b), "k", p=5).collect()}
    parts: dict = {}
    for df in (a, b):
        for r in hll_registers(df, "k", p=5).collect():
            parts[r["bucket"]] = max(parts.get(r["bucket"], 0), r["reg"])
    assert whole == parts


def test_sketches_ignore_null_keys(spark):
    # NULL keys: count_distinct semantics — no phantom cells or registers
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=None), Row(k=2)])
    clean = df.filter("k IS NOT NULL")
    got = {(r["d"], r["bucket"]): r["cnt"]
           for r in ops.cms_cells(df, "k", 3, 8).collect()}
    want = {(r["d"], r["bucket"]): r["cnt"]
            for r in ops.cms_cells(clean, "k", 3, 8).collect()}
    assert got == want
    assert ops.hll_distinct(df, "k", p=6).collect() \
        == ops.hll_distinct(clean, "k", p=6).collect()


def test_hll_precision_validation(spark):
    import pytest
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="precision"):
        ops.hll_distinct(df, "k", p=3)
    with pytest.raises(ValueError, match="precision"):
        ops.hll_distinct(df, "k", p=17)
    # p=12 (4096 registers) stays overflow-free under the scaled cap
    n = 20_000
    big = spark.range(n).select(F.col("id").alias("k"))
    est = ops.hll_distinct(big, "k", p=12).collect()[0][0]
    assert est > 0 and abs(est - n) / n < 0.10


def test_histogram_quantiles_within_bin_width_of_exact(spark):
    # estimate error is bounded by one bin width vs the exact quantile
    from hudi_0_12_0_my_spark.operators import histogram_quantiles
    df = spark.range(10_000).select((F.col("id") % 1000).cast("double")
                                    .alias("v"))
    got = {r["q"]: r["est"] for r in histogram_quantiles(
        df, "v", [0.5, 0.9, 0.99], lo=0.0, hi=1000.0, bins=200).collect()}
    exact = df.selectExpr(
        "percentile(v, array(0.5, 0.9, 0.99)) AS p").collect()[0]["p"]
    width = 1000.0 / 200
    for q, e in zip([0.5, 0.9, 0.99], exact):
        assert abs(got[q] - e) <= width + 1e-9


def test_histogram_cells_merge_clamp_and_validation(spark):
    import pytest
    from hudi_0_12_0_my_spark.operators import histogram_cells
    a = spark.range(100).select(F.col("id").cast("double").alias("v"))
    b = spark.range(50, 220).select(F.col("id").cast("double").alias("v"))
    whole = {r["bin"]: r["cnt"] for r in
             histogram_cells(a.unionAll(b), "v", 0.0, 100.0, 10).collect()}
    parts: dict = {}
    for df in (a, b):
        for r in histogram_cells(df, "v", 0.0, 100.0, 10).collect():
            parts[r["bin"]] = parts.get(r["bin"], 0) + r["cnt"]
    assert whole == parts                      # cell-wise addition merge
    # out-of-range values clamp into the edge bin (b reaches 219 > hi=100)
    assert whole[9] == sum(1 for v in list(range(90, 100)) * 2
                           + list(range(100, 220)) if v >= 90)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_cells(a, "v", 5.0, 5.0, 10)


def test_histogram_quantiles_grouped_monotone(spark):
    from pyspark.sql import Row
    from hudi_0_12_0_my_spark.operators import histogram_quantiles
    df = spark.createDataFrame(
        [Row(g="lo", v=float(i % 10)) for i in range(500)]
        + [Row(g="hi", v=float(80 + i % 10)) for i in range(500)])
    got = {(r["g"], r["q"]): r["est"] for r in histogram_quantiles(
        df, "v", [0.1, 0.5, 0.9], lo=0.0, hi=100.0, bins=100,
        group_cols=["g"]).collect()}
    assert got[("hi", 0.5)] > got[("lo", 0.5)] + 70
    for g in ("lo", "hi"):                     # monotone in q
        assert got[(g, 0.1)] <= got[(g, 0.5)] <= got[(g, 0.9)]


def test_containment_lsh_equals_brute_on_near_dups(spark):
    """The LSH-candidates-first composition returns exactly the brute
    pairs when recall is total (near-identical duplicates), and always a
    value-faithful SUBSET otherwise — the verify stage is shared, so an
    emitted row can never disagree with brute."""
    base = [" ".join(f"t{i}_{d}" for i in range(30)) for d in range(8)]
    dups = [t + " extra tail" for t in base[:4]]          # 4 near-dup pairs
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(base + dups)])
    brute = {(r.id_a, r.id_b, r.na, r.nb, round(r.containment, 9))
             for r in ops.ngram_containment_pairs(
                 df, n=3, threshold=0.5).collect()}
    lsh = {(r.id_a, r.id_b, r.na, r.nb, round(r.containment, 9))
           for r in ops.ngram_containment_pairs_lsh(
               df, n=3, threshold=0.5).collect()}
    assert len(brute) >= 4
    assert lsh == brute


def test_containment_lsh_recall_caveat_is_real(spark):
    """Document the trade the docstring states: a high-containment /
    low-jaccard doc-IN-doc pair is exactly what jaccard-driven banding can
    miss at few bands — while the exact paths always find it."""
    big = " ".join(f"w{i}" for i in range(400))
    small = " ".join(f"w{i}" for i in range(40, 60))
    df = spark.createDataFrame([Row(doc_id=1, text=big),
                                Row(doc_id=2, text=small)])
    exact = ops.ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    assert len(exact) == 1 and exact[0]["containment"] == 1.0
    lsh = ops.ngram_containment_pairs_lsh(
        df, n=3, threshold=0.9, num_hashes=4, bands=2).collect()
    brute_set = {(r.id_a, r.id_b) for r in exact}
    assert {(r.id_a, r.id_b) for r in lsh} <= brute_set   # never extra rows
