"""Corpus-trained n-gram language-model scoring.

The classic pretraining-corpus quality signal (CCNet / Gopher-style): score
each document by its average log-probability under an n-gram model trained on
the corpus itself; low scores flag gibberish / boilerplate outliers,
`exp(-score)` is the per-token pseudo-perplexity.  Unlike KenLM-backed
pipelines there is no external model artifact — the model IS a DataFrame of
gram counts, so the whole thing stays inside Spark and is exactly replayable
in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(text_col: str):
    # same tokenizer as every other text operator (textstats._ws_tokens),
    # lowercased — one definition so the shared SQL oracles stay in lockstep
    from .textstats import _ws_tokens
    return _ws_tokens(F.lower(F.col(text_col)))


def lm_log_prob(df: DataFrame, order: int = 1, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, lm_logprob): average log-probability of the document's tokens
    under the corpus MLE n-gram model, rounded to 6 decimals.

    order=1: P(w) = c(w) / T.
    order=2: P(w2|w1) = c(w1,w2) / c(w1,·), with the context totals derived
    from the pair counts — no second corpus pass.  Documents with fewer than
    `order` tokens have no scorable grams and are omitted.

    Shape for 100 TB: gram explode -> ONE count shuffle building the model
    (map-side partial aggregation folds the stop-word mass before the
    exchange), then the scoring join grams⋈counts shuffles on the gram key —
    AQE's skew-join splits the stop-gram hot keys — and the per-document avg
    is the final shuffle on id.  A small vocabulary broadcasts automatically
    under AQE's threshold; nothing is ever collected to the driver.
    """
    if order not in (1, 2):
        raise ValueError("lm_log_prob: order must be 1 or 2")
    toks = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("_t"))
    if order == 1:
        grams = toks.select("id", F.explode("_t").alias("w"))
        counts = grams.groupBy("w").agg(
            F.count(F.lit(1)).cast("double").alias("_c"))
        total = counts.agg(F.sum("_c").alias("_tot"))
        scored = (grams.join(counts, "w")
                  .crossJoin(F.broadcast(total))
                  .groupBy("id")
                  .agg(F.round(F.avg(F.log(F.col("_c") / F.col("_tot"))), 6)
                       .alias("lm_logprob")))
    else:
        pairs = (toks.withColumn("_m", F.size("_t") - 1)
                 .filter(F.col("_m") >= 1)
                 .select("id", F.explode(F.transform(
                     F.sequence(F.lit(0), F.col("_m") - 1),
                     lambda i: F.struct(F.element_at("_t", i + 1).alias("w1"),
                                        F.element_at("_t", i + 2).alias("w2"))))
                     .alias("p"))
                 .select("id", "p.w1", "p.w2"))
        pc = pairs.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("double").alias("_c"))
        cc = pc.groupBy("w1").agg(F.sum("_c").alias("_s"))
        scored = (pairs.join(pc, ["w1", "w2"]).join(cc, "w1")
                  .groupBy("id")
                  .agg(F.round(F.avg(F.log(F.col("_c") / F.col("_s"))), 6)
                       .alias("lm_logprob")))
    return scored.select(F.col("id").alias(id_col), "lm_logprob")


def tfidf_keywords(df: DataFrame, k: int = 5, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, rank, term, tfidf): each document's top-k terms by
    tf-idf = (tf / doc_len) * ln(N / df), rounded to 6 decimals, ties broken
    by term — deterministic keyword extraction for corpus labeling.

    Shape for 100 TB: explode -> ONE (doc, term) count shuffle (map-side
    combine collapses within-doc repeats before the exchange), term document
    frequencies derived from that same counted set (groupBy term — second
    small shuffle over distinct (doc, term) pairs, not raw tokens), N as a
    broadcast 1-row agg, then the per-doc top-k window shuffles on id once.
    """
    toks = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("_t"))
    terms = (toks.filter(F.size("_t") > 0)
             .select("id", F.size("_t").alias("_dl"),
                     F.explode("_t").alias("term")))
    tc = terms.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("_tf"),
        F.first("_dl").alias("_dl"))
    dfreq = tc.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df"))
    n = toks.filter(F.size("_t") > 0).agg(
        F.count(F.lit(1)).cast("double").alias("_n"))
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (tc.join(dfreq, "term").crossJoin(F.broadcast(n))
            .withColumn("tfidf", F.round(
                (F.col("_tf") / F.col("_dl"))
                * F.log(F.col("_n") / F.col("_df")), 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("id").alias(id_col),
                    F.col("rank").cast("int").alias("rank"),
                    "term", "tfidf"))


def linear_text_score(df: DataFrame, weights, bias: float = 0.0,
                      id_col: str = "doc_id", text_col: str = "text",
                      normalize: bool = True) -> DataFrame:
    """fastText-style linear text classifier scoring: (id, score) with
    score = sigmoid(bias + sum_t w[t] (/ n_tokens if normalize)) rounded to
    6 decimals — the learned-quality-filter shape (CCNet / LLaMA-style
    "wikipedia-like" filters), with the model as data instead of an external
    binary.

    `weights` is a token->float dict OR a (token, weight) DataFrame. Dict
    weights become a broadcast join side; a DataFrame side joins however its
    size dictates (broadcast under the AQE threshold, shuffle otherwise —
    at 100 TB a 10M-token model still broadcasts at ~100 MB, so scoring
    stays a map-only pass over the corpus). Tokens without a weight
    contribute 0; empty documents score sigmoid(bias).
    """
    spark = df.sparkSession
    if isinstance(weights, dict):
        # literal model: always tiny, force the broadcast
        wdf = F.broadcast(spark.createDataFrame(
            list(weights.items()), "tok string, w double"))
    else:
        # DataFrame model: let AQE pick broadcast vs shuffle by actual size
        wdf = weights.toDF("tok", "w")
    toks = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("_t"))
    ex = toks.select("id", F.size("_t").alias("_n"),
                     F.explode_outer("_t").alias("tok"))
    summed = (ex.join(wdf, "tok", "left")
              .groupBy("id")
              .agg(F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("_s"),
                   F.first("_n").alias("_n")))
    raw = F.col("_s") / F.when(F.lit(normalize) & (F.col("_n") > 0),
                               F.col("_n")).otherwise(F.lit(1.0))
    logit = F.lit(float(bias)) + raw
    return summed.select(
        F.col("id").alias(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"))


def lm_outliers(df: DataFrame, order: int = 1, keep_fraction: float = 0.99,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents BELOW the keep_fraction quantile of lm_logprob — the
    gibberish tail a quality pipeline would drop.  One extra 1-row aggregate
    (approx quantile) broadcast back over the scored set."""
    scored = lm_log_prob(df, order=order, id_col=id_col, text_col=text_col)
    cut = scored.agg(F.expr(
        f"percentile_approx(lm_logprob, {1.0 - keep_fraction})")
        .alias("_cut"))
    return (scored.crossJoin(F.broadcast(cut))
            .filter(F.col("lm_logprob") < F.col("_cut"))
            .select(id_col, "lm_logprob"))


def cluster_topics(docs: DataFrame, assignments: DataFrame, k: int = 5,
                   text_col: str = "text", id_col: str = "doc_id",
                   cluster_col: str = "cluster") -> DataFrame:
    """Interpretable topic labels for document clusters (corpus
    organization: k-means the embeddings, label the clusters): per cluster,
    the top-k terms by CLUSTER-level tf-idf — the cluster plays the
    document role (tf = term share of the cluster's tokens, idf over the
    handful of clusters), so vocabulary every cluster shares washes out and
    each cluster's distinctive terms surface. Output:
    (cluster, rank, term, tfidf), rank 1..k, tie-break on term.

    Shape for 100 TB: token explode joins the (id -> cluster) map, then ONE
    (cluster, term) count shuffle (map-side combine collapses repeats
    before the exchange); everything after operates on |clusters| x |vocab|
    counted rows, and the final window partitions by the few clusters.
    """
    toks = docs.select(F.col(id_col).alias("id"),
                       _tokens(text_col).alias("_t"))
    a = assignments.select(F.col(id_col).alias("id"),
                           F.col(cluster_col).alias("cluster"))
    terms = (toks.filter(F.size("_t") > 0).join(a, "id")
             .select("cluster", F.explode("_t").alias("term")))
    tc = terms.groupBy("cluster", "term").agg(
        F.count(F.lit(1)).cast("double").alias("_tf"))
    cl = tc.groupBy("cluster").agg(F.sum("_tf").alias("_cl"))
    dfreq = tc.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df"))
    n = cl.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    from pyspark.sql import Window
    w = Window.partitionBy("cluster").orderBy(F.desc("tfidf"), F.asc("term"))
    return (tc.join(F.broadcast(cl), "cluster").join(dfreq, "term")
            .crossJoin(F.broadcast(n))
            .withColumn("tfidf", F.round(
                (F.col("_tf") / F.col("_cl"))
                * F.log(F.col("_n") / F.col("_df")), 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("cluster", F.col("rank").cast("int").alias("rank"),
                    "term", "tfidf"))
