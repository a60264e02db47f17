"""Property-based tests (hypothesis): random tiny corpora checked against
pure-Python reference models of the curation operators.

A 3-letter alphabet over short docs makes duplicate windows, shared
segments and budget straddles DENSE, so a dozen examples walk edge paths a
hand-written fixture never lists (empty docs, all-duplicate docs, windows
longer than the doc, packs cut mid-document). Spark roundtrips cost ~1s per
example, so each property caps examples and disables hypothesis deadlines —
the point is model equivalence, not fuzz volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

import hudi_0_12_0_my_spark.operators as ops

WORD = st.sampled_from(["a", "b", "c"])
DOC = st.lists(WORD, min_size=0, max_size=12).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=6)

PROP = settings(max_examples=12, deadline=None,
                suppress_health_check=list(HealthCheck))


def _df(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


# ------------------------------------------------------- reference models
def _model_substring_dedup(texts, k):
    toks = {i: t.split() for i, t in enumerate(texts) if t.strip()}
    occ: dict = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p:p + k]), []).append((i, p))
    out = {}
    covered = {i: set() for i in toks}
    for lst in occ.values():
        if len(lst) > 1:
            for i, p in sorted(lst)[1:]:
                covered[i].update(range(p, p + k))
    for i, ts in toks.items():
        kept = [t for j, t in enumerate(ts) if j not in covered[i]]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def _model_segment_dedup(texts, window):
    segs: dict = {}
    first: dict = {}
    for i in sorted(range(len(texts)), key=int):
        ts = texts[i].split()
        if not ts:
            continue
        segs[i] = [" ".join(ts[p:p + window])
                   for p in range(0, len(ts), window)]
        for j, s in enumerate(segs[i]):
            first.setdefault(s, (i, j))
    out = {}
    for i, ss in segs.items():
        kept = [s for j, s in enumerate(ss) if first[s] == (i, j)]
        out[i] = (" ".join(kept), len(ss), len(kept))
    return out


def _model_pack(texts, budget):
    out, cum = {}, 0
    for i in sorted(range(len(texts))):
        n = len(texts[i].split())
        out[i] = (n, cum // budget, cum % budget)
        cum += n
    return out


# ------------------------------------------------------------- properties
@PROP
@given(texts=CORPUS, k=st.integers(2, 3))
def test_substring_dedup_matches_model(spark, texts, k):
    got = {r.doc_id: (r.text_dedup, r.n_tokens, r.n_removed)
           for r in ops.exact_substring_dedup(_df(spark, texts),
                                              k=k).collect()}
    assert got == _model_substring_dedup(texts, k)


@PROP
@given(texts=CORPUS, window=st.integers(2, 3))
def test_segment_dedup_matches_model(spark, texts, window):
    got = {r.doc_id: (r.text_dedup, r.n_segments, r.n_kept)
           for r in ops.segment_dedup(_df(spark, texts),
                                      window=window).collect()}
    assert got == _model_segment_dedup(texts, window)


@PROP
@given(texts=CORPUS, budget=st.integers(3, 7))
def test_pack_sequences_matches_model(spark, texts, budget):
    got = {r.doc_id: (r.n_tokens, r.seq_id, r.start_offset)
           for r in ops.pack_sequences(_df(spark, texts),
                                       token_budget=budget).collect()}
    assert got == _model_pack(texts, budget)


@PROP
@given(texts=CORPUS)
def test_exact_dedup_winner_and_counts(spark, texts):
    """Winners are the min id per normalized content; dup_counts cover the
    corpus exactly."""
    rows = ops.exact_dedup(_df(spark, texts)).collect()
    norm = [" ".join(t.lower().split()) for t in texts]
    expect_winner = {}
    for i, t in enumerate(norm):
        expect_winner.setdefault(t, i)
    assert {r.doc_id for r in rows} == set(expect_winner.values())
    assert sum(r.dup_count for r in rows) == len(texts)


@PROP
@given(texts=CORPUS,
       w=st.tuples(st.integers(1, 5), st.integers(1, 5), st.integers(1, 5)))
def test_split_dataset_is_a_partition(spark, texts, w):
    """Every row lands in exactly one split, and re-running produces the
    identical assignment (retry stability)."""
    weights = {"train": w[0], "val": w[1], "test": w[2]}
    a = {r.doc_id: r.split
         for r in ops.split_dataset(_df(spark, texts), weights).collect()}
    b = {r.doc_id: r.split
         for r in ops.split_dataset(_df(spark, texts), weights).collect()}
    assert a == b
    assert set(a) == set(range(len(texts)))
    assert set(a.values()) <= set(weights)


@PROP
@given(data=st.data(), direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, data, direction):
    """asof_join vs pandas.merge_asof (independent reference), including
    genuinely-NULL right payload values (must propagate, not be filled
    from an older row) and equal-timestamp inclusive matches."""
    import pandas as pd

    key = st.integers(0, 2)
    ts = st.integers(0, 20)
    lrows = data.draw(st.lists(st.tuples(key, ts), min_size=1, max_size=12))
    rrows = data.draw(st.lists(
        st.tuples(key, ts, st.one_of(st.none(), st.integers(0, 9))),
        min_size=0, max_size=12))
    # pandas merge_asof needs unique (key, ts) on the right for a defined
    # winner; dedupe keeping the draw's last occurrence
    rdict = {(k, t): v for k, t, v in rrows}
    rrows = [(k, t, v) for (k, t), v in rdict.items()]

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(i, k, t0 + dt.timedelta(minutes=t)) for i, (k, t) in
         enumerate(lrows)],
        "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, t0 + dt.timedelta(minutes=t), v) for k, t, v in rrows],
        "user_id long, ts timestamp, val long")
    got = {r.event_id: r.r_val for r in
           ops.asof_join(ldf, rdf, "user_id",
                         direction=direction).collect()}

    lp = pd.DataFrame([(i, k, t0 + dt.timedelta(minutes=t))
                       for i, (k, t) in enumerate(lrows)],
                      columns=["event_id", "user_id", "ts"]) \
        .sort_values(["ts", "event_id"], kind="stable")
    rp = pd.DataFrame([(k, t0 + dt.timedelta(minutes=t), v)
                       for k, t, v in rrows],
                      columns=["user_id", "ts", "val"]) \
        .sort_values("ts", kind="stable")
    if rp.empty:
        exp = {i: None for i in lp.event_id}
    else:
        m = pd.merge_asof(lp, rp, on="ts", by="user_id",
                          direction=direction, suffixes=("", "_r"))
        exp = {row["event_id"]: (None if pd.isnull(row["val"])
                                 else int(row["val"]))
               for _, row in m.iterrows()}
    assert set(got) == set(exp)
    for eid in got:
        assert got[eid] == exp[eid], (eid, direction, lrows, rrows)
