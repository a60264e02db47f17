"""Tests for the LLM-pipeline operators (SURVEY.md §2.11)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import operators as ops


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
            (2, "the quick brown fox jumps over the lazy dog", "en", "a"),
            (3, "The  quick brown fox jumps over the lazy dog", "en", "b"),
            (4, "pack my box with five dozen liquor jugs", "en", "b"),
            (5, "der schnelle braune fuchs springt nicht", "de", "c"),
            (6, "", "en", "c"),
            (7, "the quick brown fox jumps over the lazy cat", "en", "a"),
        ],
        "doc_id long, text string, lang string, source string")


@pytest.fixture(scope="module")
def emb(spark):
    import math
    rows = []
    for i in range(40):
        v = [math.sin(i * 0.7 + j) for j in range(8)]
        rows.append((i, v, i % 3))
    # vec 100 = near-copy of vec 0 (tiny perturbation)
    rows.append((100, [x + 0.001 for x in rows[0][1]], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_exact_dedup_normalizes_whitespace_and_keeps_min_id(docs):
    kept = ops.exact_dedup(docs).orderBy("doc_id").collect()
    ids = [r.doc_id for r in kept]
    assert 1 in ids and 2 not in ids and 3 not in ids  # 1,2,3 same normalized
    by_id = {r.doc_id: r for r in kept}
    assert by_id[1].dup_count == 3
    assert by_id[4].dup_count == 1


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r.doc_id: r.sig for r in ops.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]           # byte-identical text
    assert sigs[1] != sigs[4]           # unrelated text
    assert len(sigs[1]) == 32


def test_minhash_lsh_finds_near_dups(docs):
    pairs = ops.minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                                  jaccard_threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got                # identical
    assert (1, 7) in got                # one word differs
    assert (1, 4) not in got            # unrelated


def test_minhash_lsh_dedup_removes_near_dups(docs):
    kept = ops.minhash_lsh_dedup(docs, num_hashes=32, bands=8,
                                 jaccard_threshold=0.5)
    ids = {r.doc_id for r in kept.collect()}
    assert 1 in ids and 2 not in ids and 7 not in ids
    assert 4 in ids and 5 in ids


def test_minhash_lsh_dedup_cc_method(docs):
    """method='cc' closes chains transitively; same fixture as one-hop
    (1,2,3,7 mutually similar) keeps only the minimum."""
    kept = ops.minhash_lsh_dedup(docs, method="cc", num_hashes=32, bands=8,
                                 jaccard_threshold=0.5)
    ids = {r.doc_id for r in kept.collect()}
    assert 1 in ids and 2 not in ids and 7 not in ids
    assert 4 in ids and 5 in ids


def test_lsh_max_bucket_size_drops_mega_buckets(spark):
    """A stop-bucket (many identical docs) exceeds the cap and produces no
    pairs — the 100 TB degenerate-bucket guard."""
    rows = [(i, "same exact text body") for i in range(20)] + \
           [(100, "completely different words here"),
            (101, "completely different words here")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ops.minhash_lsh_pairs(d, num_hashes=32, bands=8,
                                   jaccard_threshold=0.5, max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}           # 20-doc bucket dropped, pair kept


def test_simhash_near_dup(docs):
    pairs = ops.simhash_near_dup_pairs(docs, max_hamming=0)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    sh = {r.doc_id: r.simhash for r in ops.simhash(docs).collect()}
    assert sh[1] == sh[2]


def test_simhash_signatures_are_map_only(docs):
    """Signature computation must not shuffle tokens: per-row aggregate, not
    explode+groupBy (the minhash shuffle-shape rewrite, applied to simhash)."""
    plan = ops.simhash(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ngram_jaccard(docs):
    pairs = ops.ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert rows[(1, 2)] == 1.0
    assert (1, 4) not in rows


def test_token_stats(docs):
    got = {r.doc_id: r for r in ops.with_token_stats(docs).collect()}
    assert got[1].n_tokens == 9
    assert got[6].n_tokens == 0
    assert got[3].n_tokens == 9         # double space collapses
    assert got[1].n_bpe_tokens == 9


def test_quality_score_range_and_empty(docs):
    got = {r.doc_id: r for r in ops.with_quality_score(docs).collect()}
    for r in got.values():
        assert 0.0 <= r.quality_score <= 1.0
    assert got[6].quality_score < got[1].quality_score


def test_language_id(docs):
    got = {r.doc_id: r.lang_pred for r in ops.with_language_id(docs).collect()}
    assert got[1] == "en"
    assert got[5] == "de"
    assert got[6] == "und"


def test_repetition_stats(spark):
    rows = {r.doc_id: r.asDict() for r in ops.with_repetition_stats(
        spark.createDataFrame([
            (1, "a b\na b\nc d"),               # duplicate line "a b"
            (2, "- one\n- two\nplain\nwait...\n"),
            (3, "x y x y x y x y"),             # dominant bigram
            (4, ""),
        ], "doc_id long, text string")).collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert abs(r1["dup_line_frac"] - 1 / 3) < 1e-5
    assert abs(r1["dup_line_char_frac"] - 6 / 9) < 1e-5   # "a b" twice
    r2 = rows[2]
    assert abs(r2["bullet_line_frac"] - 0.5) < 1e-6
    assert abs(r2["ellipsis_line_frac"] - 0.25) < 1e-6
    assert abs(r2["mean_word_len"] - 20 / 6) < 1e-5       # no empty token
    assert abs(rows[3]["top_bigram_char_frac"] - 1.0) < 1e-6
    r4 = rows[4]
    assert r4["n_lines"] == 0 and r4["mean_word_len"] == 0.0


def test_fingerprint_whitespace_invariant(docs):
    got = {r.doc_id: r.fingerprint for r in ops.with_fingerprint(docs).collect()}
    assert got[1] == got[3]
    assert got[1] != got[4]


def test_cosine_topk_selfdup_is_top1(emb):
    res = ops.cosine_topk(emb, emb.filter("vec_id = 0"), k=3).collect()
    assert res[0].neighbor_id == 100 and res[0].rank == 1
    assert res[0].cosine > 0.999


def test_ivf_recall_vs_brute_force(emb):
    brute = {(r.query_id, r.neighbor_id)
             for r in ops.cosine_topk(emb, emb.filter("vec_id < 5"), k=3).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ops.ivf_cosine_topk(emb, emb.filter("vec_id < 5"), k=3,
                                           num_cells=4, nprobe=3).collect()}
    # probing 3/4 cells should recover most exact neighbors
    assert len(brute & approx) >= len(brute) * 0.6


def test_embedding_near_dup(emb):
    pairs = ops.embedding_near_dup_pairs(emb, threshold=0.999, num_cells=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 100) in got


def test_semantic_dedup_collapses_transitive_chain(spark):
    """Vectors 0~1 and 1~2 are each near-dup pairs but 0~2 is below the
    threshold: SemDeDup must still collapse all three (transitive), keeping
    the min id; the orthogonal vector survives."""
    import math
    base = [1.0, 0.0, 0.0, 0.0]
    tilt1 = [math.cos(0.25), math.sin(0.25), 0.0, 0.0]    # cos ~0.969 to base
    tilt2 = [math.cos(0.50), math.sin(0.50), 0.0, 0.0]    # cos ~0.969 to t1,
    ortho = [0.0, 0.0, 1.0, 0.0]                          # ~0.878 to base
    emb = spark.createDataFrame(
        [(0, base, 0), (1, tilt1, 0), (2, tilt2, 0), (9, ortho, 1)],
        "vec_id long, embedding array<float>, label int")
    kept = sorted(r.vec_id for r in ops.semantic_dedup(
        emb, threshold=0.95, num_cells=1).collect())
    assert kept == [0, 9]


def test_multimodal_plumbing(docs, spark):
    mm = ops.with_media_columns(
        docs.withColumn("payload", F.col("text").cast("binary")),
        "payload", "image", "image/png", width=8, height=8)
    assert mm.schema["media_meta"].dataType.fieldNames()[0] == "media_type"
    feats = ops.extract_features(mm, dim=4).collect()
    assert len(feats) == 7
    by_id = {r.doc_id: r.features for r in feats}
    assert by_id[1] == by_id[2]         # deterministic across identical payloads
    assert len(by_id[1]) == 4
    # real image decode needs pillow: absent here -> loud executor-side
    # ImportError (present -> these bytes aren't a real PNG -> decode error)
    with pytest.raises(Exception, match="pillow|decode|image"):
        ops.extract_features(mm, dim=4, fake=False).collect()


def test_multimodal_real_wav_decode(docs, spark):
    """mode='real' on audio decodes WAV bytes with the stdlib wave module —
    per-window RMS energy: a clip that is silent then loud must yield
    near-zero early features and large late ones, same Arrow plan as fake."""
    import io
    import struct
    import wave as wv

    def make_wav(samples):
        buf = io.BytesIO()
        with wv.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
        return buf.getvalue()

    quiet_then_loud = make_wav([0] * 4000 + [20000, -20000] * 2000)
    silent = make_wav([0] * 8000)
    df = spark.createDataFrame(
        [(1, bytearray(quiet_then_loud)), (2, bytearray(silent))],
        "doc_id long, payload binary")
    mm = ops.with_media_columns(df, "payload", "audio", "audio/wav",
                                sample_rate=8000, duration_ms=1000)
    feats = {r.doc_id: r.features
             for r in ops.extract_features(mm, dim=4, mode="real").collect()}
    q = feats[1]
    assert len(q) == 4
    assert q[0] < 0.01 and q[1] < 0.01          # silent first half
    assert q[2] > 0.3 and q[3] > 0.3            # loud second half
    assert feats[2] == [0.0, 0.0, 0.0, 0.0]

    # 8-bit WAV PCM is UNSIGNED (midpoint 128): a silent 8-bit clip must
    # decode to ~0 RMS, a full-swing one to ~1 (int8 would give ~1 / garbage)
    def make_wav8(samples):
        buf = io.BytesIO()
        with wv.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes(samples))
        return buf.getvalue()

    df8 = spark.createDataFrame(
        [(3, bytearray(make_wav8([128] * 4000))),
         (4, bytearray(make_wav8([255, 1] * 2000)))],
        "doc_id long, payload binary")
    mm8 = ops.with_media_columns(df8, "payload", "audio", "audio/wav",
                                 sample_rate=8000, duration_ms=500)
    f8 = {r.doc_id: r.features
          for r in ops.extract_features(mm8, dim=2, mode="real").collect()}
    assert all(v < 0.01 for v in f8[3])          # silence ~0, not ~1
    assert all(v > 0.9 for v in f8[4])           # full swing ~1


def test_multimodal_real_image_decode(docs, spark):
    """mode='real' on images decodes executor-side in every environment:
    pillow when present, the stdlib PNG codec otherwise — so this runs
    (not skips) in the pillow-less container. Fixtures are stdlib PNGs;
    a bright-left/dark-right image must discriminate in its strip
    features, and the real resize re-encodes at the JVM-computed dims."""
    import numpy as np

    from hudi_0_12_0_my_spark.operators.multimodal import _png_codec

    png_decode, png_encode, png_gray = _png_codec()
    flat = png_encode(np.full((16, 16), 128, dtype=np.uint8))
    half = np.zeros((16, 16), dtype=np.uint8)
    half[:, :8] = 255                      # bright left, dark right
    df = spark.createDataFrame(
        [(1, bytearray(flat)), (2, bytearray(png_encode(half)))],
        "doc_id long, payload binary")
    mm = ops.with_media_columns(df, "payload", "image", "image/png",
                                width=16, height=16)
    feats = {r.doc_id: r.features
             for r in ops.extract_features(mm, dim=4, mode="real").collect()}
    assert all(abs(x - 128 / 255) < 0.02 for x in feats[1])
    assert feats[2][0] > 0.9 and feats[2][3] < 0.1      # discriminates
    # and the real resize re-encodes at the JVM-computed target dims
    big = png_encode(np.full((256, 512, 3), 10, dtype=np.uint8))  # (h, w)
    df2 = spark.createDataFrame([(3, bytearray(big))],
                                "doc_id long, payload binary")
    mm2 = ops.with_media_columns(df2, "payload", "image", "image/png",
                                 width=512, height=256)
    out = ops.resize_plan(mm2, max_side=256, mode="real").collect()
    arr = png_decode(bytes(out[0].media))
    assert (out[0].out_width, out[0].out_height) == (256, 128)
    assert arr.shape[:2] == (128, 256)
    assert int(arr.mean()) == 10


def test_png_codec_roundtrip_and_filters():
    """The stdlib PNG codec: encode->decode round-trips exactly, and the
    decoder unfilters Sub/Up/Average/Paeth scanlines (the filters real
    encoders emit) — pinned with a hand-built filtered PNG."""
    import struct
    import zlib

    import numpy as np

    from hudi_0_12_0_my_spark.operators.multimodal import _png_codec

    png_decode, png_encode, png_gray = _png_codec()
    rng = np.random.default_rng(7)
    for shape in [(5, 9), (4, 3, 3), (6, 2, 4), (3, 3, 2)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = png_decode(png_encode(arr))
        want = arr[:, :, None] if arr.ndim == 2 else arr
        assert (got == want).all()
    # hand-built grayscale PNG exercising filters 1..4 (one per scanline)
    rows = rng.integers(0, 256, size=(5, 8), dtype=np.uint8)
    raw = bytearray(b"\x00" + rows[0].tobytes())          # row 0: None
    prev = rows[0].astype(int)
    for y, flt in zip(range(1, 5), (1, 2, 3, 4)):
        cur = rows[y].astype(int)
        line = bytearray([flt])
        for i in range(8):
            a = cur[i - 1] if i else 0
            b, c = prev[i], (prev[i - 1] if i else 0)
            if flt == 1:
                pred = a
            elif flt == 2:
                pred = b
            elif flt == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line.append((cur[i] - pred) & 0xFF)
        raw += line
        prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert (png_decode(png)[:, :, 0] == rows).all()
    # luma weights match PIL convert('L') (ITU-R 601)
    rgb = np.zeros((1, 1, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)
    assert abs(png_gray(rgb)[0, 0] - 0.299 * 255) < 1e-9


def test_frame_sample_plan(docs):
    mm = ops.with_media_columns(
        docs.withColumn("payload", F.col("text").cast("binary")),
        "payload", "video", "video/mp4", duration_ms=2000)
    frames = ops.frame_sample_plan(mm, every_ms=1000)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)  # 0ms, 1000ms, 2000ms


# --------------------------------------------- pipeline curation (pipeline.py)
def test_decontaminate_flags_shared_ngrams(docs, spark):
    bench = spark.createDataFrame(
        [(100, "jumps over the lazy dog tonight")],
        "doc_id long, text string")
    bad = ops.contaminated_ids(docs, bench, n=4)
    got = {r.doc_id for r in bad.collect()}
    # docs 1,2,3 share "jumps over the lazy dog"; 7 shares "jumps over the
    # lazy" (4-gram); 4,5,6 share nothing
    assert got == {1, 2, 3, 7}
    kept = ops.decontaminate(docs, bench, n=4)
    assert {r.doc_id for r in kept.collect()} == {4, 5, 6}
    marked = ops.decontaminate(docs, bench, n=4, mark_only=True)
    flags = {r.doc_id: r.contaminated for r in marked.collect()}
    assert flags[1] is True and flags[4] is False and len(flags) == 7


def test_segment_filter_rules_and_within_doc_dedup(spark):
    """Separator mode: short lines, digit-dominated lines, punct-dominated
    lines and within-doc repeated lines drop; the doc reassembles from the
    survivors in order."""
    text = "\n".join([
        "a good clean line here",        # kept
        "no",                            # < 3 tokens -> dropped
        "1234 5678 9012",                # digits dominate -> dropped
        "!!! ??? *** ###",               # punctuation -> dropped
        "a good clean line here",        # within-doc repeat -> dropped
        "another fine closing line",     # kept
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = ops.segment_filter(df, sep=r"\n", min_tokens=3,
                             joiner="\n").collect()[0]
    assert out.text_filtered == "a good clean line here\n" \
                                "another fine closing line"
    assert out.n_segments == 6 and out.n_kept == 2


def test_segment_filter_window_mode_map_only(spark):
    """Window mode drops the short tail segment; and the plan contains no
    exchange at all (pure map)."""
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7"),    # windows of 3: [3,3,1-token tail]
         (2, "")],
        "doc_id long, text string")
    res = ops.segment_filter(df, window=3, min_tokens=2)
    rows = {r.doc_id: r for r in res.collect()}
    assert rows[1].n_segments == 3 and rows[1].n_kept == 2
    assert rows[1].text_filtered == "w1 w2 w3 w4 w5 w6"
    assert 2 not in rows
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decontaminate_benchmark_needs_no_id_column(spark, docs):
    """The benchmark side is grams-only: a text-only eval set works (the
    pre-r3 contract; regression guard for the _doc_grams refactor)."""
    bench = spark.createDataFrame(
        [("jumps over the lazy dog tonight",)], "text string")
    got = {r.doc_id for r in ops.contaminated_ids(docs, bench, n=4).collect()}
    assert got == {1, 2, 3, 7}


def test_mixture_plan_missing_group_surfaces(spark):
    """A weighted group with no rows must appear with available_tokens=0
    and NULL epochs — infinite repetition is the signal, not a dropped
    row; and assigned_tokens uses the EXACT share, not the display one."""
    df = spark.createDataFrame([(1, "a b c", "en")],
                               "doc_id long, text string, lang string")
    out = {r.group: r for r in
           ops.mixture_plan(df, "lang", {"en": 1, "xx": 2},
                            target_tokens=3_000_000).collect()}
    assert out["xx"].available_tokens == 0 and out["xx"].epochs is None
    assert out["en"].assigned_tokens == 1_000_000   # exact 1/3, not 0.333333
    assert out["xx"].assigned_tokens == 2_000_000


def test_mixture_plan_epochs(spark):
    """Budget assignment: shares normalize, epochs = assigned/available."""
    df = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "e f", "en"), (3, "g h i", "de")],
        "doc_id long, text string, lang string")
    out = {r.group: r for r in
           ops.mixture_plan(df, "lang", {"en": 3, "de": 1},
                            target_tokens=12).collect()}
    assert out["en"].available_tokens == 6
    assert out["en"].share == 0.75 and out["en"].assigned_tokens == 9
    assert out["en"].epochs == 1.5
    assert out["de"].available_tokens == 3
    assert out["de"].assigned_tokens == 3 and out["de"].epochs == 1.0


def test_shard_plan_deterministic_and_dense(spark):
    """Shard assignment is stable across calls; positions are dense 0..m-1
    within each shard; token counts ride along when text_col is given."""
    df = spark.createDataFrame(
        [(i, "w " * (i + 1)) for i in range(50)], "doc_id long, text string")
    a = ops.shard_plan(df, n_shards=4, text_col="text").collect()
    b = ops.shard_plan(df, n_shards=4, text_col="text").collect()
    assert sorted((r.doc_id, r.shard_id, r.shard_pos) for r in a) == \
           sorted((r.doc_id, r.shard_id, r.shard_pos) for r in b)
    assert {r.shard_id for r in a} == {0, 1, 2, 3}
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard_id, []).append(r.shard_pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    toks = {r.doc_id: r.n_tokens for r in a}
    assert toks[0] == 1 and toks[49] == 50


def test_contamination_score_fractions(spark):
    """Graded overlap: doc 1 is a verbatim benchmark copy (score 1.0),
    doc 2 shares half its distinct 2-grams, doc 3 shares none, and a doc
    shorter than n tokens scores 0.0 with zero grams."""
    bench = spark.createDataFrame(
        [(100, "a b c")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c"),            # grams {a b, b c} — both hit
         (2, "a b x y"),          # grams {a b, b x, x y} — 1 of 3
         (3, "p q r"),            # no overlap
         (4, "z")],               # < n tokens
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           ops.contamination_score(docs, bench, n=2).collect()}
    assert (out[1].n_grams, out[1].n_contaminated,
            out[1].contamination) == (2, 2, 1.0)
    assert (out[2].n_grams, out[2].n_contaminated,
            out[2].contamination) == (3, 1, round(1 / 3, 6))
    assert out[3].contamination == 0.0 and out[3].n_grams == 2
    assert (out[4].n_grams, out[4].n_contaminated,
            out[4].contamination) == (0, 0, 0.0)


def test_scrub_pii_rules(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.co.uk now"),
         (2, "call 555-123-4567 or ssn 123-45-6789"),
         (3, "card 4111 1111 1111 1111 thanks"),
         (4, "clean text, nothing to scrub 12-34")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in ops.scrub_pii(df).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "call <PHONE> or ssn <SSN>"
    assert out[3] == "card <CARD> thanks"
    assert out[4] == "clean text, nothing to scrub 12-34"


def test_normalize_text(docs):
    out = {r.doc_id: r.text for r in ops.normalize_text(docs).collect()}
    assert out[3] == "the quick brown fox jumps over the lazy dog"


def test_deterministic_sample_reproducible(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in ops.deterministic_sample(df, 0.3).collect()}
    b = {r.doc_id for r in ops.deterministic_sample(df, 0.3).collect()}
    assert a == b                          # reproducible, unlike rand()
    assert 0.25 < len(a) / 10_000 < 0.35   # roughly the requested fraction
    sub = {r.doc_id for r in ops.deterministic_sample(df, 0.1).collect()}
    assert sub <= a                        # nested: smaller fraction ⊂ larger


def test_stratified_sample_quotas(docs):
    out = ops.stratified_sample(docs, "lang", {"en": 1.0}, id_col="doc_id")
    got = {r.doc_id for r in out.collect()}
    assert got == {1, 2, 3, 4, 6, 7}       # all en kept, de (5) dropped


def test_percentile_filter_exact_and_approx(spark):
    rows = [(i, "en" if i <= 10 else "de", float(i)) for i in range(1, 16)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    # exact: top 30% per lang -> ceil(.3*10)=3 en (scores 10,9,8),
    # ceil(.3*5)=2 de (15,14)
    out = ops.percentile_filter(df, 0.3, "score", group_col="lang")
    assert {r.doc_id for r in out.collect()} == {10, 9, 8, 15, 14}
    # ungrouped: top 20% of 15 -> ceil(3.0)=3 rows (15,14,13)
    out2 = ops.percentile_filter(df, 0.2, "score")
    assert {r.doc_id for r in out2.collect()} == {15, 14, 13}
    # approx path: corpus never shuffles; threshold semantics still hold on
    # this tiny frame (sketch is exact at this size)
    out3 = ops.percentile_filter(df, 0.3, "score", group_col="lang",
                                 exact=False)
    got = {r.doc_id for r in out3.collect()}
    assert {15, 14} <= got and got <= {10, 9, 8, 7, 15, 14}
    plan = out3._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan     # threshold join, not a shuffle join


def test_mixture_sample_target_shares(spark):
    rows = [(i, "en" if i % 4 else "de") for i in range(1, 401)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # counts: en 300, de 100. target 50/50 -> nprime=min(600,200)=200:
    # keep_en=100/300, keep_de=1.0 -> expected ~100 en + all 100 de
    out = ops.mixture_sample(df, "lang", {"en": 0.5, "de": 0.5})
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == 100                      # binding group intact
    assert abs(counts["en"] - 100) < 30             # hash-sample tolerance
    # groups outside the target mixture are dropped entirely
    df2 = df.union(spark.createDataFrame([(1000, "zh")], df.schema))
    out2 = ops.mixture_sample(df2, "lang", {"en": 0.5, "de": 0.5})
    assert out2.filter("lang = 'zh'").count() == 0


def test_chunk_documents_overlap_windows(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),
         (2, " ".join(f"t{i}" for i in range(25))),
         (3, ""),                               # no chunks
         (4, " ".join(f"t{i}" for i in range(13)))],
        "doc_id long, text string")
    out = ops.chunk_documents(docs, max_tokens=12, overlap=4)
    rows = sorted((r.doc_id, r.chunk_idx, r.n_chunk_tokens)
                  for r in out.collect())
    # step 8: doc 2 (25 toks) chunks at 1/9/17; doc 4 (13) at 1/9 (9+4<=13)
    assert rows == [(1, 0, 10), (2, 0, 12), (2, 1, 12), (2, 2, 9),
                    (4, 0, 12), (4, 1, 5)]
    txt = {(r.doc_id, r.chunk_idx): r.chunk_text for r in out.collect()}
    assert txt[(2, 1)].split(" ")[0] == "t8"    # overlap: restarts at tok 9


def test_pack_sequences_concat_and_cut(spark):
    """Packing = concatenate in id order, cut every budget tokens; the
    distributed prefix sum must be invariant to input partitioning."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f g"), (3, "a b c"),
         (4, " ".join(["x"] * 10)), (5, "y z")],
        "doc_id long, text string")
    want = {1: (5, 0, 0), 2: (7, 0, 5), 3: (3, 1, 4),
            4: (10, 1, 7), 5: (2, 3, 1)}
    for src in (docs, docs.repartition(3)):
        got = {r.doc_id: (r.n_tokens, r.seq_id, r.start_offset)
               for r in ops.pack_sequences(src, token_budget=8).collect()}
        assert got == want


def test_curate_pipeline_composition(spark):
    """scrub -> normalize -> quality -> dedup -> sample composes into one
    plan; PII scrubbed before dedup so scrub-equal docs collapse."""
    rows = [
        (1, "the quick brown fox is on the hill contact a@b.com ok"),
        (2, "the quick brown fox is on the hill contact x@y.org ok"),
        (3, "!!!"),                        # punctuation-only: low quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("lang", __import__("pyspark.sql.functions",
                                       fromlist=["lit"]).lit("en"))
    out = ops.curate(docs, min_quality=0.3, dedup="exact",
                     sample_fraction=1.0)
    kept = {r.doc_id for r in out.collect()}
    # 1 and 2 become identical after <EMAIL> scrubbing -> min id survives;
    # 3 fails the quality floor
    assert kept == {1}
    plan = out._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]            # AQE repeats the tree
    assert plan.count("Scan ExistingRDD") <= 1     # corpus read once
    assert "BatchEvalPython" not in plan


def test_sessionize_islands(spark):
    rows = [(i, u, f"2024-01-01 0{h}:{m:02d}:00")
            for i, (u, h, m) in enumerate([
                (1, 0, 0), (1, 0, 10), (1, 2, 0),   # user 1: 2 sessions
                (2, 0, 0), (2, 3, 0), (2, 3, 20),   # user 2: 2 sessions
            ])]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    sess = ops.sessionize(ev, gap_seconds=3600)
    got = {(r.user_id, r.event_id): r.session_id for r in sess.collect()}
    assert got[(1, 0)] == 1 and got[(1, 1)] == 1 and got[(1, 2)] == 2
    assert got[(2, 3)] == 1 and got[(2, 4)] == 2 and got[(2, 5)] == 2
    stats = ops.session_stats(ev, gap_seconds=3600)
    by_key = {(r.user_id, r.session_id): r.n_events for r in stats.collect()}
    assert by_key[(1, 1)] == 2 and by_key[(1, 2)] == 1 and by_key[(2, 2)] == 2


def test_funnel_ordered_cascade(spark):
    """Step k counts only users whose earliest step-k event is STRICTLY
    after their earliest step-(k-1) event — order matters, ties don't."""
    rows = [
        # u1: full ordered funnel
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:05:00"),
        (3, 1, "purchase", "2024-01-01 10:10:00"),
        # u2: click BEFORE view -> that click can't count; no later click
        (4, 2, "click", "2024-01-01 09:00:00"),
        (5, 2, "view", "2024-01-01 10:00:00"),
        # u3: click ties view's timestamp -> strict > rejects it
        (6, 3, "view", "2024-01-01 10:00:00"),
        (7, 3, "click", "2024-01-01 10:00:00"),
        # u4: view then click, purchase never
        (8, 4, "view", "2024-01-01 08:00:00"),
        (9, 4, "click", "2024-01-01 09:00:00"),
        # u5: irrelevant events only
        (10, 5, "error", "2024-01-01 08:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.step: (r.event_type, r.users) for r in
           ops.funnel_stats(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: ("view", 4), 2: ("click", 2), 3: ("purchase", 1)}


def test_lsh_topk_recall_vs_brute_force(emb):
    brute = {(r.query_id, r.neighbor_id)
             for r in ops.cosine_topk(emb, emb.filter("vec_id < 3"), k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ops.lsh_cosine_topk(emb, emb.filter("vec_id < 3"), dim=8,
                                           k=5, num_bits=16, bands=8).collect()}
    # banded LSH is approximate; 8 bands of 2 bits on 8-dim vectors gives
    # high candidate recall on this tiny corpus
    assert len(brute & approx) >= len(brute) * 0.6


def test_hyperplane_signatures_deterministic(emb):
    a = {r.vec_id: r.sig for r in ops.hyperplane_signatures(emb, dim=8).collect()}
    b = {r.vec_id: r.sig for r in ops.hyperplane_signatures(emb, dim=8).collect()}
    assert a == b
    # near-identical vectors agree on (almost) all sign bits
    assert bin(a[0] ^ a[100]).count("1") <= 2


def test_portable_hash_minhash_same_semantics(docs):
    """portable_md5 mode finds the same near-dup structure as xxhash64 (the
    hashes differ; the LSH guarantees don't)."""
    pairs = {(r.id_a, r.id_b)
             for r in ops.minhash_lsh_pairs(docs, jaccard_threshold=0.5,
                                            hash_fn="portable_md5").collect()}
    assert (1, 2) in pairs and (1, 3) in pairs   # identical/normalized dups
    sh = {r.doc_id: r.simhash
          for r in ops.simhash(docs, bits=48, hash_fn="portable_md5").collect()}
    assert sh[1] == sh[2] and 0 <= sh[1] < (1 << 48)


def test_resize_plan_prunes_noop_rows(docs, spark):
    mm = ops.with_media_columns(
        docs.withColumn("payload", F.col("text").cast("binary")),
        "payload", "image", "image/png", width=1024, height=512)
    out = ops.resize_plan(mm, max_side=256).collect()
    assert len(out) == 7
    assert all(r.out_width == 256 and r.out_height == 128 for r in out)
    small = ops.with_media_columns(
        docs.withColumn("payload", F.col("text").cast("binary")),
        "payload", "image", "image/png", width=100, height=50)
    # already within bounds: pruned JVM-side, nothing reaches Python
    assert ops.resize_plan(small, max_side=256).count() == 0


def test_bm25_topk_matches_reference_formula(docs):
    """Hand-computed BM25 on the 7-doc corpus: docs containing 'fox' rank by
    the Robertson formula with length normalization; the empty doc and the
    non-matching German doc never appear."""
    import math
    rows = {r.doc_id: r.bm25 for r in
            ops.bm25_topk(docs, "fox dozen", k=10).collect()}
    assert 6 not in rows and 5 not in rows
    # reference computation (same tokenizer: lowercase whitespace split)
    texts = {1: "the quick brown fox jumps over the lazy dog",
             2: "the quick brown fox jumps over the lazy dog",
             3: "the  quick brown fox jumps over the lazy dog",
             4: "pack my box with five dozen liquor jugs",
             5: "der schnelle braune fuchs springt nicht",
             6: "", 7: "the quick brown fox jumps over the lazy cat"}
    toks = {i: t.lower().split() for i, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    exp = {}
    for i, tk in toks.items():
        s = 0.0
        for w in ["fox", "dozen"]:
            tf = tk.count(w)
            dfreq = sum(1 for v in toks.values() if w in v)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        if s > 0:
            exp[i] = round(s, 6)
    assert rows == pytest.approx(exp)
    # rarer term dominates: 'dozen' (df=1) outweighs 'fox' (df=4)
    assert rows[4] > rows[1]


def test_bm25_rejects_empty_query(docs):
    with pytest.raises(ValueError):
        ops.bm25_topk(docs, "   ")


def test_audio_chunk_plan(docs):
    mm = ops.with_media_columns(
        docs.withColumn("payload", F.col("text").cast("binary")),
        "payload", "audio", "audio/wav", duration_ms=65_000)
    chunks = ops.audio_chunk_plan(mm, chunk_ms=30_000)
    per_doc = chunks.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)     # 0-30s, 30-60s, 60-65s
    ends = {r.chunk_end_ms for r in chunks.filter("chunk_start_ms = 60000").collect()}
    assert ends == {65_000}                          # tail chunk clamped


def test_lm_log_prob_unigram_matches_hand_computation(docs):
    """MLE unigram scores on the 7-doc corpus equal the hand-computed
    average log(c(w)/T); the empty doc has no tokens and is omitted."""
    import math
    from collections import Counter
    rows = {r.doc_id: r.lm_logprob for r in
            ops.lm_log_prob(docs, order=1).collect()}
    texts = {1: "the quick brown fox jumps over the lazy dog",
             2: "the quick brown fox jumps over the lazy dog",
             3: "the  quick brown fox jumps over the lazy dog",
             4: "pack my box with five dozen liquor jugs",
             5: "der schnelle braune fuchs springt nicht",
             7: "the quick brown fox jumps over the lazy cat"}
    toks = {i: t.split() for i, t in texts.items()}
    cnt = Counter(w for ws in toks.values() for w in ws)
    total = sum(cnt.values())
    assert 6 not in rows
    for i, ws in toks.items():
        exp = sum(math.log(cnt[w] / total) for w in ws) / len(ws)
        assert abs(rows[i] - round(exp, 6)) < 1e-9, (i, rows[i], exp)


def test_lm_log_prob_bigram_conditionals(docs):
    """Bigram conditionals: docs 1/2/3 are identical token streams so they
    tie; doc 7's final bigram 'lazy cat' is rarer than 'lazy dog' (1 of 4
    'lazy ·' contexts) so doc 7 scores strictly lower."""
    rows = {r.doc_id: r.lm_logprob for r in
            ops.lm_log_prob(docs, order=2).collect()}
    assert rows[1] == rows[2] == rows[3]
    assert rows[7] < rows[1]
    assert 6 not in rows


def test_lm_outliers_returns_low_tail(docs):
    """With keep_fraction tight enough, the German doc (all singleton
    unigrams) is the outlier tail."""
    out = {r.doc_id for r in
           ops.lm_outliers(docs, keep_fraction=0.5).collect()}
    assert 5 in out
    assert 1 not in out and 2 not in out


def test_segment_dedup_window_mode(spark):
    """Token-window segments: doc 2 repeats doc 1's first window, so it
    loses that segment and keeps its distinct tail; a within-doc repeat
    also dedupes (first occurrence wins)."""
    df = spark.createDataFrame(
        [(1, "a b c d e f"),
         (2, "a b c x y z"),          # first window duplicates doc 1's
         (3, "p q r p q r"),          # within-doc repeat
         (4, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           ops.segment_dedup(df, window=3).collect()}
    assert out[1].text_dedup == "a b c d e f" and out[1].n_kept == 2
    assert out[2].text_dedup == "x y z" and out[2].n_segments == 2
    assert out[3].text_dedup == "p q r" and out[3].n_kept == 1
    assert 4 not in out                # empty doc has no segments


def test_exact_substring_dedup_overlapping_windows(spark):
    """ExactSubstr (Lee et al.): doc 2 embeds doc 1's 3-token span at an
    UNALIGNED offset — overlapping windows catch it (segment_dedup would
    not); a within-doc repeat keeps only its first occurrence; short docs
    (< k tokens) pass through untouched."""
    df = spark.createDataFrame(
        [(1, "a b c d"),
         (2, "x a b c y"),        # "a b c" duplicated at offset 1
         (3, "p q r p q r"),      # within-doc repeat of "p q r"
         (4, "u v")],             # shorter than k -> no windows
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           ops.exact_substring_dedup(df, k=3).collect()}
    # doc 1 wins both duplicated spans (min id): untouched
    assert out[1].text_dedup == "a b c d" and out[1].n_removed == 0
    # doc 2 loses exactly the embedded span, keeps its own tokens
    assert out[2].text_dedup == "x y" and out[2].n_removed == 3
    # doc 3: windows (p q r)@0 and @3 duplicate; second occurrence cut.
    # windows (q r p)@1 and (r p q)@2 are singletons -> only tokens 3..5 go
    assert out[3].text_dedup == "p q r" and out[3].n_removed == 3
    assert out[4].text_dedup == "u v" and out[4].n_removed == 0
    assert out[4].n_tokens == 2


def test_exact_substring_dedup_union_of_overlaps(spark):
    """Two overlapping duplicated windows union their coverage instead of
    double-counting: doc 2 repeats doc 1's 4-token run, producing two
    overlapping duplicated 3-windows whose union is 4 tokens."""
    df = spark.createDataFrame(
        [(1, "a b c d"),
         (2, "a b c d e")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           ops.exact_substring_dedup(df, k=3).collect()}
    assert out[1].n_removed == 0
    assert out[2].text_dedup == "e" and out[2].n_removed == 4


def test_segment_dedup_separator_mode(spark):
    """Paragraph separator mode: shared paragraph kept only in the earliest
    doc, survivors rejoin with the separator."""
    df = spark.createDataFrame(
        [(1, "intro text\n\nshared boilerplate"),
         (2, "shared boilerplate\n\nunique ending")],
        "doc_id long, text string")
    out = {r.doc_id: r.text_dedup for r in
           ops.segment_dedup(df, sep=r"\n\n+").collect()}
    assert out[1] == "intro text\n\nshared boilerplate"
    assert out[2] == "unique ending"


def test_tfidf_keywords_ranks_discriminative_terms(docs):
    """'fox' appears in 4 of 6 non-empty docs, 'dozen' only in doc 4: for
    doc 4 the singleton German-free terms share idf=ln(6/1) and rank
    alphabetically; ubiquitous 'the' never makes doc 4's list."""
    import math
    rows = [(r.rank, r.term, r.tfidf) for r in
            ops.tfidf_keywords(docs, k=3).filter("doc_id = 4").collect()]
    assert [t for _, t, _ in rows] == ["box", "dozen", "five"]
    exp = round(1 / 8 * math.log(6 / 1), 6)
    assert all(abs(v - exp) < 1e-9 for _, _, v in rows)


def test_top_paths_first_n_and_ranking(spark):
    """Journey paths take each user's first n event types in (ts, id) order;
    shorter histories contribute their full path; ranking is count desc then
    path asc."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # users 1,2: view > click > buy ; user 3: view > click ; user 4: error
    for u, seq in ((1, ["view", "click", "buy"]),
                   (2, ["view", "click", "buy"]),
                   (3, ["view", "click"]),
                   (4, ["error"])):
        rows += [(u * 10 + i, t0 + dt.timedelta(minutes=i), u, e)
                 for i, e in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = [(r.path, r.n_users, r.path_len)
           for r in ops.top_paths(df, n_steps=3, k=10).collect()]
    assert out == [("view > click > buy", 2, 3),
                   ("error", 1, 1),
                   ("view > click", 1, 2)]


def test_top_paths_truncates_to_n_steps(spark):
    """A 5-event history with n_steps=2 keeps only the first two types."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=i), 1, e)
            for i, e in enumerate(["a", "b", "c", "d", "e"])]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = ops.top_paths(df, n_steps=2, k=5).collect()
    assert [(r.path, r.path_len) for r in out] == [("a > b", 2)]


def test_event_transitions_counts_and_probs(spark):
    """Per-user consecutive pairs only (no cross-user pair), probabilities
    row-normalized per source type."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(0, t0, 1, "a"), (1, t0 + dt.timedelta(1), 1, "b"),
            (2, t0 + dt.timedelta(2), 1, "a"), (3, t0 + dt.timedelta(3), 1, "c"),
            (4, t0, 2, "a"), (5, t0 + dt.timedelta(1), 2, "b")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {(r.src, r.dst): (r.n, r.p)
           for r in ops.event_transitions(df).collect()}
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("a", "c")] == (1, round(1 / 3, 6))
    assert out[("b", "a")] == (1, 1.0)
    assert ("b", "c") not in out and ("c", "a") not in out


def test_cohort_retention_weekly(spark):
    """Two weekly cohorts: u1/u2 start week0 (u2 churns after week0,
    u1 active week0+week1); u3 starts week1. Offsets and ratios follow."""
    import datetime as dt
    rows = [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2)),
            (1, dt.datetime(2024, 1, 8)), (3, dt.datetime(2024, 1, 9))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r.cohort), r.period_offset): (r.n_users, r.retention)
           for r in ops.cohort_retention(df, period="week").collect()}
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1.0)
    assert len(out) == 3


def test_linear_text_score_matches_hand_sigmoid(docs):
    """Hand-computed sigmoid of the normalized token-weight sum; empty doc
    scores sigmoid(bias); unknown tokens contribute zero."""
    import math
    w = {"fox": 1.0, "lazy": -0.5, "der": 2.0}
    rows = {r.doc_id: r.score for r in
            ops.linear_text_score(docs, w, bias=0.2).collect()}
    def sig(x): return 1 / (1 + math.exp(-x))
    # doc 1: 9 tokens, fox + lazy -> (1.0 - 0.5)/9
    assert abs(rows[1] - round(sig(0.2 + 0.5 / 9), 6)) < 1e-9
    # doc 5: der twice? no - once; 6 tokens
    assert abs(rows[5] - round(sig(0.2 + 2.0 / 6), 6)) < 1e-9
    # empty doc 6: sigmoid(bias)
    assert abs(rows[6] - round(sig(0.2), 6)) < 1e-9
    # weights as a DataFrame side behave identically
    wdf = docs.sparkSession.createDataFrame(list(w.items()),
                                            "tok string, w double")
    rows2 = {r.doc_id: r.score for r in
             ops.linear_text_score(docs, wdf, bias=0.2).collect()}
    assert rows == rows2


def test_profile_counts_nulls_distincts_extremes(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", None), (2, None, 7.25), (3, "x", 2.5)],
        "k long, s string, v double")
    rows = {r.column: r for r in ops.profile(df).collect()}
    assert rows["k"].n_rows == 4 and rows["k"].n_null == 0
    assert rows["k"].n_distinct == 3
    assert (rows["k"].min_num, rows["k"].max_num) == (1.0, 3.0)
    assert rows["k"].min_str is None
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert (rows["s"].min_str, rows["s"].max_str) == ("x", "y")
    assert rows["v"].n_null == 1 and rows["v"].n_distinct == 2
    assert (rows["v"].min_num, rows["v"].max_num) == (2.5, 7.25)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown columns"):
        ops.profile(df, ["nope"])


def test_asof_join_backward_and_forward(spark):
    """Backward: latest right row at-or-before; forward: earliest
    at-or-after. Equal timestamps match inclusively; keys without any
    eligible right row stay NULL."""
    import datetime as dt
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10), "e1"), (1, T(2024, 1, 1, 12), "e2"),
         (2, T(2024, 1, 1, 9), "e3")],
        "k long, ts timestamp, ev string")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10), "s10"), (1, T(2024, 1, 1, 11), "s11"),
         (2, T(2024, 1, 1, 11), "s2")],
        "k long, ts timestamp, status string")
    back = {r.ev: r.r_status for r in
            ops.asof_join(left, right, "k").collect()}
    assert back == {"e1": "s10", "e2": "s11", "e3": None}
    fwd = {r.ev: r.r_status for r in
           ops.asof_join(left, right, "k", direction="forward").collect()}
    assert fwd == {"e1": "s10", "e2": None, "e3": "s2"}


def test_resample_gap_fill_locf(spark):
    """Hourly grid spans date_trunc(min)..date_trunc(max) per key; each grid
    point carries the latest observation at-or-before it (LOCF); grid points
    before the first observation in the opening truncated hour stay the
    truncated-hour fill of that hour's later rows only when one exists at or
    before the point — i.e. the 10:00 point sits BEFORE a 10:30 first
    observation and stays NULL."""
    import datetime as dt
    T = dt.datetime
    df = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 30), 5.0),   # first obs mid-hour
         (1, T(2024, 1, 1, 13, 0), 7.0),    # gap: 11,12 forward-fill 5.0
         (2, T(2024, 1, 1, 9, 0), 1.0)],    # single-point series
        "k long, ts timestamp, v double")
    out = {(r.k, r.ts.hour): (r.r_v, r.r_ts) for r in
           ops.resample(df, "k", ts="ts", step="1 hour").collect()}
    assert out[(1, 10)] == (None, None)            # grid 10:00 < obs 10:30
    assert out[(1, 11)] == (5.0, T(2024, 1, 1, 10, 30))
    assert out[(1, 12)] == (5.0, T(2024, 1, 1, 10, 30))
    assert out[(1, 13)] == (7.0, T(2024, 1, 1, 13, 0))
    assert out[(2, 9)] == (1.0, T(2024, 1, 1, 9, 0))
    assert len(out) == 5                           # 10..13 for k=1, 9 for k=2


def test_interval_join_semantics(spark):
    """Half-open vs closed bounds, overlap multiplicity, intervals spanning
    many buckets, and empty matches — exact results regardless of
    bucket_width (correctness must not depend on the tuning knob)."""
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0), (4, 99.5), (5, 1000.0)],
        "pid long, p double")
    iv = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 5.0, 6.0), (12, 90.0, 100.0),
         (13, -50.0, 200.0)],
        "iid long, lo double, hi double")
    for w in (1.0, 7.0, 300.0):
        got = sorted((r.pid, r.iid) for r in ops.interval_join(
            pts, iv, left_point="p", right_start="lo", right_end="hi",
            bucket_width=w).collect())
        # p=10.0 excluded from [0,10) but inside [-50,200); 1000 matches none
        assert got == [(1, 10), (1, 13), (2, 10), (2, 11), (2, 13),
                       (3, 13), (4, 12), (4, 13)], f"width={w}"
    closed = sorted((r.pid, r.iid) for r in ops.interval_join(
        pts, iv, left_point="p", right_start="lo", right_end="hi",
        bucket_width=7.0, closed="both").collect())
    assert (3, 10) in closed                      # hi inclusive now
    with pytest.raises(ValueError, match="closed"):
        ops.interval_join(pts, iv, left_point="p", right_start="lo",
                          right_end="hi", bucket_width=1.0, closed="right")
    with pytest.raises(ValueError, match="collision"):
        ops.interval_join(pts, iv.withColumnRenamed("iid", "pid"),
                          left_point="p", right_start="lo", right_end="hi",
                          bucket_width=1.0)


def test_interval_join_timestamps_and_keys(spark):
    """Timestamp points against timestamp intervals with an extra equality
    key: only same-key containment matches."""
    import datetime as dt
    T = dt.datetime
    ev = spark.createDataFrame(
        [("a", 1, T(2024, 1, 1, 10, 30)), ("a", 2, T(2024, 1, 1, 13, 0)),
         ("b", 3, T(2024, 1, 1, 10, 30))],
        "k string, eid long, ts timestamp")
    win = spark.createDataFrame(
        [("a", 7, T(2024, 1, 1, 10), T(2024, 1, 1, 11)),
         ("b", 8, T(2024, 1, 1, 12), T(2024, 1, 1, 14))],
        "k string, wid long, s timestamp, e timestamp")
    got = sorted((r.eid, r.w_wid) for r in ops.interval_join(
        ev, win, left_point="ts", right_start="s", right_end="e",
        bucket_width=3600.0, on="k", right_prefix="w_").collect())
    assert got == [(1, 7)]                        # eid=2/3 wrong key or time


def test_salted_join_equals_plain_join(spark):
    """Salted inner and left joins return exactly the plain join's rows."""
    big = spark.createDataFrame(
        [(i, "k%d" % (i % 3), float(i)) for i in range(500)]
        + [(999, "orphan", 0.0)],
        "id long, k string, v double")
    dim = spark.createDataFrame(
        [("k0", 10), ("k1", 11), ("k2", 12), ("unused", 13)],
        "k string, attr int")
    for how in ("inner", "left"):
        want = sorted((r.id, r.attr) for r in
                      big.join(dim, "k", how).collect())
        got = sorted((r.id, r.attr) for r in
                     ops.salted_join(big, dim, "k", salts=7,
                                     how=how).collect())
        assert got == want, how
    with pytest.raises(ValueError, match="how"):
        ops.salted_join(big, dim, "k", how="outer")


def test_asof_join_null_payload_single_row_fill(spark):
    """A matched right row whose payload value is genuinely NULL propagates
    that NULL (merge_asof semantics) — an older row's value must not leak
    forward — and ALL filled right columns come from the same matched row."""
    import datetime as dt
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 12), "e1")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10), "s10", 100),
         (1, T(2024, 1, 1, 11), None, None)],   # latest match: NULL payload
        "k long, ts timestamp, status string, score int")
    row = ops.asof_join(left, right, "k").collect()[0]
    assert row.r_status is None and row.r_score is None
    assert row.r_ts == T(2024, 1, 1, 11)


def test_phash_bands_validation(spark):
    """bands=32 would make every hex band substring empty (one global
    bucket => all-pairs join); only widths that divide the 16 hex chars of
    the hash are legal."""
    from hudi_0_12_0_my_spark.operators import phash_near_dup
    df = spark.createDataFrame([(1, b"x")], "doc_id long, media binary")
    import pytest as _pytest
    for bad in (3, 32, 64):
        with _pytest.raises(ValueError, match="bands"):
            phash_near_dup(df, bands=bad)
    assert phash_near_dup(df, bands=8).count() == 0


def test_kmeans_assign_separated_clusters(spark):
    """Two well-separated blobs with k=2: every member of a blob lands in
    one cluster, the near-origin blob with the lowest-id seed is cluster 0
    (deterministic init), and dist shrinks after refinement iterations."""
    rows = [(i, [float(i % 5) * 0.01, 0.0], 0) for i in range(10)] + \
           [(100 + i, [10.0 + float(i % 5) * 0.01, 10.0], 1) for i in range(10)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r.cluster for r in ops.kmeans_assign(df, k=2, iters=2).collect()}
    assert {got[i] for i in range(10)} == {0}
    assert {got[100 + i] for i in range(10)} == {1}


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k=3 over 2 distinct points: one centroid never wins a point; its
    slot must carry the previous centroid instead of crashing or NaN-ing."""
    rows = [(1, [0.0, 0.0], 0), (2, [0.0, 0.0], 0), (3, [5.0, 5.0], 1)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>, label int")
    out = ops.kmeans_assign(df, k=3, iters=2).collect()
    assert len(out) == 3
    assert all(r.dist == r.dist for r in out)      # no NaN


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    """'ab' appears in 'abc' (x3 docs) and 'ab' (x1): count 4; ties break
    lexicographically; single-char words contribute nothing."""
    df = spark.createDataFrame(
        [(1, "abc abc x"), (2, "abc ab"), (3, "de de")],
        "doc_id long, text string")
    out = [(r.rank, r.pair, r.occurrences) for r in
           ops.bpe_pair_counts(df, k=3).collect()]
    assert out[0] == (1, "ab", 4)        # 3x 'abc' + 1x 'ab'
    assert out[1] == (2, "bc", 3)
    assert out[2] == (3, "de", 2)


def test_mmr_rerank_defers_redundant_neighbor(spark):
    """The query's two nearest neighbors are near-copies of each other;
    plain top-k ranks them 1-2, but MMR at lambda=0.5 picks the diverse
    third vector at rank 2 and defers the redundant twin."""
    rows = [(0, [1.0, 0.0, 0.0]),        # query
            (1, [0.99, 0.1, 0.0]),       # close to query
            (2, [0.98, 0.11, 0.0]),      # near-copy of 1 (redundant)
            (3, [0.7, 0.0, 0.7])]        # diverse, still relevant
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.rank: r.neighbor_id for r in
           ops.mmr_rerank(df, df.filter("vec_id = 0"), k=3, fetch_k=3,
                          lambda_=0.5).collect()}
    assert out[1] == 1          # first pick = plain top-1
    assert out[2] == 3          # diversity beats the redundant twin
    assert out[3] == 2


def test_pq_topk_recovers_near_duplicates(spark):
    """PQ asymmetric distance must rank a vector's near-copy first: two
    well-separated blobs, each with a query and its jittered twin. With
    m=2 subspaces x 4 codes the reconstruction error is far smaller than
    the blob separation."""
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(20):
        base = [0.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [9.0, 9.0, 9.0, 9.0]
        rows.append((i, [b + rnd.uniform(-0.3, 0.3) for b in base]))
    rows.append((100, [x + 0.01 for x in rows[0][1]]))   # twin of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ops.pq_train(df, m=2, ksub=4)
    assert len(cents) == 2 and len(cents[0]) == 4 and len(cents[0][0]) == 2
    out = ops.pq_topk(df, df.filter("vec_id = 0"), k=5, cents=cents).collect()
    by_rank = {r.rank: r.neighbor_id for r in out}
    # all top-5 neighbors are from vec 0's blob (even ids + the twin)
    assert all(n == 100 or n % 2 == 0 for n in by_rank.values())
    assert 100 in by_rank.values()


def test_pq_encode_codes_shape(spark):
    """Codes are m ints in [0, ksub); identical vectors encode identically."""
    rows = [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0]),
            (3, [8.0, 8.0, 8.0, 8.0]), (4, [0.0, 0.0, 1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ops.pq_train(df, m=2, ksub=2)
    enc = {r.vec_id: list(r.codes) for r in
           ops.pq_encode(df, cents).collect()}
    assert enc[1] == enc[2]
    assert all(len(c) == 2 and all(0 <= x < 2 for x in c)
               for c in enc.values())


def test_ivfpq_exhaustive_probe_equals_plain_pq(spark):
    """With nprobe = num_cells, IVF-PQ must equal pq_topk exactly — the
    cell partitioning is result-invisible."""
    import random
    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ops.pq_train(df, m=2, ksub=4)
    q = df.filter("vec_id < 2")
    plain = [(r.query_id, r.rank, r.neighbor_id, r.adist) for r in
             ops.pq_topk(df, q, k=5, cents=cents)
             .orderBy("query_id", "rank").collect()]
    ivf = [(r.query_id, r.rank, r.neighbor_id, r.adist) for r in
           ops.ivfpq_topk(df, q, k=5, num_cells=4, nprobe=4, cents=cents)
           .orderBy("query_id", "rank").collect()]
    assert plain == ivf


def test_ivfpq_partial_probe_prunes_cells(spark):
    """With nprobe=1 every returned neighbor lives in the query's own
    (nearest) cell — the scan really is partition-pruned."""
    rows = [(i, [float(i % 2) * 10 + 0.01 * i, 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ops.pq_train(df, m=1, ksub=4)
    res = ops.ivfpq_topk(df, df.filter("vec_id = 0"), k=5,
                         num_cells=2, nprobe=1, cents=cents).collect()
    assert len(res) == 5
    from hudi_0_12_0_my_spark.operators.similarity import assign_ivf_cells
    assigned, _ = assign_ivf_cells(df, 2)
    cell_of = {r.vec_id: r.cell for r in assigned.collect()}
    assert {cell_of[r.neighbor_id] for r in res} == {cell_of[0]}


def test_prototype_prune_keeps_hardest_per_cluster(spark):
    """Two 4-point blobs, keep_frac=0.5: each cluster keeps its 2 members
    farthest from the centroid (the blob outliers), drops the 2 most
    prototypical; hardness_rank 1 is the farthest survivor."""
    rows = [(1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.1, 0.1]),
            (4, [2.0, 0.0]),                       # cluster-0 outlier
            (101, [10.0, 10.0]), (102, [10.1, 10.0]), (103, [10.1, 10.1]),
            (104, [12.0, 10.0])]                   # cluster-1 outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ops.prototype_prune(df, k=2, iters=2, keep_frac=0.5).collect()
    kept = {r.vec_id: r for r in out}
    assert len(out) == 4
    assert 4 in kept and 104 in kept               # outliers always survive
    assert kept[4].hardness_rank == 1 and kept[104].hardness_rank == 1
    assert 2 not in kept and 102 not in kept       # prototypical ones go


def test_quantized_topk_matches_exact_ranking(emb):
    """int8 quantization preserves the neighbor ranking on well-separated
    vectors: top-1 for query 0 must be its near-copy vec 100, and the
    quantized cosine is within 2% of exact."""
    exact = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
             for r in ops.cosine_topk(emb, emb.filter("vec_id = 0"), k=3).collect()}
    quant = {(r.query_id, r.rank): (r.neighbor_id, r.qcosine)
             for r in ops.quantized_cosine_topk(emb, emb.filter("vec_id = 0"), k=3).collect()}
    assert quant[(0, 1)][0] == 100
    for key in exact:
        assert abs(exact[key][1] - quant[key][1]) < 0.02


def test_quantize_int8_range_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25], 0), (2, [0.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int")
    q = {r.vec_id: (r.qvec, r.qscale) for r in ops.quantize_int8(df).collect()}
    assert q[1][0] == [127, -63, 32]   # floor(x*127+0.5)
    assert q[2][0] == [0, 0, 0] and q[2][1] == 0.0
    assert all(-128 <= x <= 127 for x in q[1][0])


def test_edit_verified_pairs_kills_lsh_false_positives(spark):
    """Docs 1/2 are identical (edit_sim 1.0) and survive; docs 3/4 share
    enough shingles to become LSH candidates at a low threshold but differ
    in half their text, so the verify stage drops them."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base),
            (3, base + " tail one XXXXXXXX"),
            (4, base + " completely different ending YYYYYYYY ZZZZ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.edit_sim
           for r in ops.edit_verified_pairs(
               df, num_hashes=32, bands=16, jaccard_threshold=0.2,
               prefix_len=200, edit_sim_threshold=0.9).collect()}
    assert (1, 2) in out and out[(1, 2)] == 1.0
    assert all(k[0] in (1, 2) and k[1] in (1, 2) for k in out)


def test_random_projection_preserves_relative_distances(emb):
    """JL projection 8 -> 4: deterministic (same matrix every call), linear
    (proj(a) - proj(b) == proj(a-b)), and the near-duplicate pair (0, 100)
    stays far closer than a random pair after projection."""
    import math
    p1 = {r.vec_id: r.projected
          for r in ops.random_projection(emb, in_dim=8, out_dim=4).collect()}
    p2 = {r.vec_id: r.projected
          for r in ops.random_projection(emb, in_dim=8, out_dim=4).collect()}
    assert p1 == p2                                    # deterministic matrix
    assert all(len(v) == 4 for v in p1.values())

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert d(p1[0], p1[100]) < 0.01                    # near-dup stays near
    assert d(p1[0], p1[20]) > 10 * d(p1[0], p1[100])


def test_hard_negatives_band_and_rank(emb):
    got = ops.hard_negatives(emb, emb.filter("vec_id = 0"), k=5,
                             lo=0.2, hi=0.9).collect()
    assert 0 < len(got) <= 5
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    # the near-duplicate (cos ~ 1.0) sits ABOVE the band -> excluded
    assert all(r.neighbor_id != 100 for r in got)
    # every returned neighbor really is inside the band
    cos = {r.neighbor_id: r.cosine
           for r in ops.cosine_topk(emb, emb.filter("vec_id = 0"), k=50).collect()}
    assert all(0.2 <= cos[r.neighbor_id] < 0.9 for r in got)


def test_quota_cap_keeps_top_by_score_per_group(spark):
    rows = [(i, "big", float(i)) for i in range(10)] \
         + [(100 + i, "small", float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = ops.quota_cap(df, "source", cap=4, score_col="score").collect()
    big = sorted(r.doc_id for r in out if r.source == "big")
    small = sorted(r.doc_id for r in out if r.source == "small")
    assert big == [6, 7, 8, 9]          # top-4 by score desc
    assert small == [100, 101, 102]     # under quota: untouched
    # no score: lowest ids win
    out2 = ops.quota_cap(df, "source", cap=2).collect()
    assert sorted(r.doc_id for r in out2 if r.source == "big") == [0, 1]


def test_quota_cap_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        ops.quota_cap(df, "source", cap=0)


def test_rrf_fuse_ranks_and_membership(spark):
    lex = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                                "doc_id long, rank long")
    dense = spark.createDataFrame([(11, 1), (13, 2), (10, 3)],
                                  "doc_id long, rank long")
    out = {r.doc_id: r for r in ops.rrf_fuse([lex, dense], k=60).collect()}
    # doc 11: 1/62 + 1/61; doc 10: 1/61 + 1/63; both lists
    assert out[11].n_lists == 2 and out[10].n_lists == 2
    assert out[12].n_lists == 1 and out[13].n_lists == 1
    assert out[11].rrf > out[10].rrf > out[12].rrf
    assert out[11].rank == 1 and out[10].rank == 2
    assert round(out[11].rrf, 6) == round(1 / 62 + 1 / 61, 6)
    # per-query variant: ranks restart per query
    lex2 = lex.withColumn("query_id", F.lit(7))
    dense2 = dense.withColumn("query_id", F.lit(7))
    out2 = ops.rrf_fuse([lex2, dense2], k=60, query_col="query_id",
                        top=2).collect()
    assert sorted(r.doc_id for r in out2) == [10, 11]
    with pytest.raises(ValueError):
        ops.rrf_fuse([])


def test_decontaminate_spans_cuts_only_contaminated_segments(spark):
    docs2 = spark.createDataFrame(
        [(1, " ".join(["tok%d" % i for i in range(20)])
          + " secret eval answer four "
          + " ".join(["pad%d" % i for i in range(16)])),
         (2, " ".join(["clean%d" % i for i in range(25)]))],
        "doc_id long, text string")
    bench = spark.createDataFrame([(9, "the secret eval answer four leak")],
                                  "doc_id long, text string")
    out = {r.doc_id: r for r in
           ops.decontaminate_spans(docs2, bench, n=4, window=20).collect()}
    # doc 1: seg0 = tok0..tok19 clean; seg1 contains the 4-gram -> removed
    assert out[1].n_segments == 2 and out[1].n_removed == 1
    assert out[1].text_clean == " ".join(["tok%d" % i for i in range(20)])
    assert out[2].n_removed == 0
    assert out[2].text_clean == " ".join(["clean%d" % i for i in range(25)])


def test_split_dataset_disjoint_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = ops.split_dataset(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: re-running yields the identical assignment
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split
         for r in ops.split_dataset(df, {"train": 0.8, "val": 0.1,
                                         "test": 0.1}).collect()}
    assert a == b
    with pytest.raises(ValueError):
        ops.split_dataset(df, {"train": 0.0})


def test_cluster_topics_surfaces_distinctive_terms(spark):
    docs3 = spark.createDataFrame(
        [(1, "stocks bonds markets trading common"),
         (2, "markets trading stocks common common"),
         (3, "protein enzyme biology cells common"),
         (4, "cells biology protein common common")],
        "doc_id long, text string")
    asg = spark.createDataFrame([(1, 0), (2, 0), (3, 1), (4, 1)],
                                "doc_id long, cluster int")
    out = ops.cluster_topics(docs3, asg, k=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append((r.rank, r.term, r.tfidf))
    # 'common' appears in both clusters -> idf 0 -> never a top term
    for cl, rows in by_cluster.items():
        assert all(t != "common" for _, t, _ in rows)
        assert [r[0] for r in sorted(rows)] == [1, 2, 3]
    top0 = {t for _, t, _ in by_cluster[0]}
    top1 = {t for _, t, _ in by_cluster[1]}
    assert top0 & {"stocks", "markets", "trading", "bonds"}
    assert top1 & {"protein", "biology", "cells", "enzyme"}
    assert not top0 & top1


def test_dsir_logweights_favors_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outweigh off-distribution
    docs; empty docs weigh exactly 0; every raw id comes back."""
    from hudi_0_12_0_my_spark.operators import dsir_logweights
    raw = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "quantum flux capacitor array"),
         (3, "the dog sat on the rug"), (4, "")],
        "doc_id long, text string")
    target = spark.createDataFrame(
        [(10, "the cat sat"), (11, "the dog sat on a mat")],
        "doc_id long, text string")
    w = {r.doc_id: r.dsir_logw
         for r in dsir_logweights(raw, target, num_buckets=512).collect()}
    assert set(w) == {1, 2, 3, 4}
    assert w[4] == 0.0
    assert w[1] > w[2] and w[3] > w[2]


def test_dsir_sample_selects_high_weight_fraction(spark):
    from hudi_0_12_0_my_spark.operators import dsir_logweights, dsir_sample
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 == 0 else "zig zag zog")
         for i in range(40)], "doc_id long, text string")
    target = spark.createDataFrame([(100, "alpha beta gamma delta")],
                                   "doc_id long, text string")
    got = dsir_sample(raw, target, 0.4, num_buckets=512)
    ids = {r.doc_id for r in got.collect()}
    assert ids == {i for i in range(40) if i % 2 == 0}
    # sample is a filter of raw (schema + rows preserved)
    assert got.columns == raw.columns


def test_perplexity_buckets_tercile_labels(spark):
    from hudi_0_12_0_my_spark.operators import perplexity_buckets
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(9)],
        "doc_id long, lang string, score double")
    got = {r.doc_id: r.ppl_bucket
           for r in perplexity_buckets(df, "score", group_col="lang").collect()}
    assert [got[i] for i in range(9)] == \
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # descending flips which scores land in the head
    got_d = {r.doc_id: r.ppl_bucket for r in perplexity_buckets(
        df, "score", group_col="lang", ascending=False).collect()}
    assert [got_d[i] for i in range(9)] == \
        ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3


def test_curate_urls_normalize_blocklist_dedup(spark):
    from hudi_0_12_0_my_spark.operators import curate_urls
    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.News.Example.COM:443/a/b/?q=1#x"),
         (2, "http://news.example.com/a/b"),          # dup of 1 post-norm
         (3, "https://spam.bad.com/page"),            # blocklisted
         (4, "ftp://files.example.com/data//")],
        "doc_id long, url string")
    got = {r.doc_id: (r.url_norm, r.domain)
           for r in curate_urls(df, blocklist=["bad.com"]).collect()}
    assert 3 not in got                                # blocklist
    assert 2 not in got and 1 in got                   # first-crawled wins
    assert got[1] == ("news.example.com/a/b", "example.com")
    assert got[4] == ("files.example.com/data", "example.com")
    # DataFrame blocklist variant behaves identically
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    got2 = {r.doc_id for r in curate_urls(df, blocklist=bl).collect()}
    assert got2 == {1, 4}


def test_char_entropy_values(spark):
    import math
    from hudi_0_12_0_my_spark.operators import with_char_entropy
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, "abcd")],
        "doc_id long, text string")
    got = {r.doc_id: r.char_entropy
           for r in with_char_entropy(df).collect()}
    assert got[1] == 0.0 and got[3] == 0.0
    assert got[2] == round(math.log(2), 6)      # two chars, uniform
    assert got[4] == round(math.log(4), 6)      # four chars, uniform
    assert got[4] > got[2] > got[1]


def test_weighted_sample_proportional_and_deterministic(spark):
    """Heavy-weight rows must dominate the sample; zero/negative weights are
    excluded; two runs agree exactly (A-ES keys are hash-derived)."""
    from hudi_0_12_0_my_spark.operators import weighted_sample
    df = spark.createDataFrame(
        [(i, 1000.0 if i < 50 else 0.001) for i in range(100)]
        + [(100, 0.0), (101, -5.0)],
        "doc_id long, w double")
    s1 = sorted(r.doc_id for r in weighted_sample(df, 40, "w").collect())
    s2 = sorted(r.doc_id for r in weighted_sample(df, 40, "w").collect())
    assert s1 == s2
    assert 100 not in s1 and 101 not in s1
    assert sum(1 for i in s1 if i < 50) >= 38    # heavy rows dominate


def test_temperature_sample_flattens_mixture(spark):
    """tau=0 equalizes group sizes (up to hash granularity); tau=1 keeps
    everything (natural mixture is feasible at fraction 1.0); invalid tau
    raises."""
    from hudi_0_12_0_my_spark.operators import temperature_sample
    df = spark.createDataFrame(
        [(i, "big" if i < 400 else "small") for i in range(450)],
        "doc_id long, grp string")
    flat = temperature_sample(df, "grp", tau=0.0)
    sizes = {r.grp: r.c for r in
             flat.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert sizes["small"] == 50                       # binding group intact
    assert abs(sizes["big"] - 50) <= 15               # hash granularity
    natural = temperature_sample(df, "grp", tau=1.0)
    assert natural.count() == 450
    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_sample(df, "grp", tau=1.5)


# ---------------------------------------------------------------- round 4c


def test_boilerplate_filter_drops_all_copies(spark):
    # segment "nav bar" (sep mode) occurs in docs 1,2,3 -> removed from ALL;
    # unique paragraphs survive; doc 3 (boilerplate-only) empties
    df = spark.createDataFrame(
        [(1, "nav bar\n\nunique alpha content"),
         (2, "nav bar\n\nunique beta content"),
         (3, "nav bar"),
         (4, "standalone gamma text")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in ops.boilerplate_filter(
        df, min_docs=2, sep=r"\n\n+").collect()}
    assert out[1].text_filtered == "unique alpha content"
    assert out[2].text_filtered == "unique beta content"
    assert out[3].text_filtered == "" and out[3].n_kept == 0
    assert out[4].text_filtered == "standalone gamma text"
    assert out[1].n_segments == 2 and out[1].n_kept == 1


def test_boilerplate_filter_threshold_and_window_mode(spark):
    # with min_docs=3 a 2-doc repeat SURVIVES; window mode segments by tokens
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in ops.boilerplate_filter(
        df, min_docs=3, window=2).collect()}
    assert out[1].n_kept == 2 and out[2].n_kept == 2
    out2 = {r.doc_id: r for r in ops.boilerplate_filter(
        df, min_docs=2, window=2).collect()}
    assert out2[1].n_kept == 0 and out2[3].n_kept == 2
    with pytest.raises(ValueError):
        ops.boilerplate_filter(df, min_docs=1)


def test_gopher_quality_rules_fire_individually(spark):
    long_good = ("the good document " * 20).strip()          # 60 words
    short = "the tiny doc"                                    # word count
    low_mwl = ("a b c d " * 15).strip()                       # mean len 1
    symbols = (("#ref " * 30) + "the word with that of").strip()
    no_stop = ("zebra quagga okapi lemur " * 15).strip()      # 0 stop hits
    df = spark.createDataFrame(
        [(1, long_good), (2, short), (3, low_mwl), (4, symbols),
         (5, no_stop)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in ops.with_gopher_quality(
        df, min_words=50, min_mean_word_len=3.0,
        min_stop_hits=1).collect()}
    assert out[1].pass_gopher
    assert not out[2].pass_gopher and out[2].n_words == 3
    assert not out[3].pass_gopher and out[3].mean_word_len == 1.0
    assert not out[4].pass_gopher and out[4].symbol_ratio > 0.1
    assert not out[5].pass_gopher and out[5].stop_hits == 0


def test_gopher_quality_line_rules(spark):
    bullets = "\n".join(["- item one of the list"] * 9
                        + ["the closing prose line"])
    ellipses = "\n".join(["the line trails off..."] * 5
                         + ["the solid line stays here"] * 5)
    df = spark.createDataFrame([(1, bullets), (2, ellipses)],
                               "doc_id long, text string")
    # relax the word-level rules so only the LINE rules decide the verdict
    # (bullet dashes drag mean word length down; "..." feeds symbol ratio)
    relaxed = dict(min_words=5, min_stop_hits=1, min_mean_word_len=1.0,
                   max_symbol_ratio=1.0)
    out = {r.doc_id: r for r in ops.with_gopher_quality(
        df, **relaxed).collect()}
    assert out[1].bullet_line_frac == 0.9 and out[1].pass_gopher
    assert out[2].ellipsis_line_frac == 0.5 and not out[2].pass_gopher
    flipped = {r.doc_id: r for r in ops.with_gopher_quality(
        df, max_bullet_line_frac=0.8, max_ellipsis_line_frac=0.6,
        **relaxed).collect()}
    assert not flipped[1].pass_gopher and flipped[2].pass_gopher


def test_rfm_segments_tiles_and_exact_monetary(spark):
    rows = []
    for u in range(10):
        # user u: last event day u, u+1 events, value 0.1 each
        for k in range(u + 1):
            rows.append((u * 100 + k, f"2024-01-{u + 1:02d} 10:00:00",
                         u, "buy", 0.1))
    df = spark.createDataFrame(rows, "event_id long, ts string, "
                               "user_id long, event_type string, "
                               "value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {r.user: r for r in ops.rfm_segments(df, n_tiles=5).collect()}
    assert out[9].recency_days == 0 and out[0].recency_days == 9
    assert out[9].r_tile == 1 and out[9].f_tile == 1 and out[9].m_tile == 1
    assert out[0].segment == "555"
    # 0.1 * 10 sums exactly under decimal accumulation
    assert out[9].monetary == 1.0
    with pytest.raises(ValueError):
        ops.rfm_segments(df, n_tiles=0)
    with pytest.raises(ValueError):
        ops.rfm_segments(df, mode="bogus")


def test_rfm_segments_approx_agrees_with_exact(spark):
    import datetime as dt
    # tie-free fixture: distinct recency, frequency and monetary per user
    # -> the histogram-boundary tiles must agree with exact ntile on every
    # user (approx only diverges on tie GROUPS, which ntile splits)
    rows = []
    for u in range(60):
        for k in range(u + 1):
            rows.append((u * 1000 + k,
                         dt.datetime(2024, 6, 1) - dt.timedelta(days=u),
                         u, "e", 1.5 * u + 0.25))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                               "user_id long, event_type string, "
                               "value double")
    ex = {r.user: (r.r_tile, r.f_tile, r.m_tile, r.segment)
          for r in ops.rfm_segments(df, mode="exact").collect()}
    ap = {r.user: (r.r_tile, r.f_tile, r.m_tile, r.segment)
          for r in ops.rfm_segments(df, mode="approx").collect()}
    assert ex == ap
    # auto picks exact below the threshold, approx above it
    auto_small = {r.user: (r.r_tile, r.f_tile, r.m_tile)
                  for r in ops.rfm_segments(df, mode="auto").collect()}
    assert auto_small == {u: v[:3] for u, v in ex.items()}
    auto_big = {r.user: (r.r_tile, r.f_tile, r.m_tile)
                for r in ops.rfm_segments(df, mode="auto",
                                          exact_max_users=10).collect()}
    assert auto_big == {u: v[:3] for u, v in ap.items()}


def test_count_anomalies_matches_brute_force(spark):
    import datetime as dt
    import random
    rng = random.Random(7)
    rows, truth = [], {}
    eid = 0
    for u in range(20):
        days = rng.randint(3, 12)
        counts = [rng.randint(1, 5) for _ in range(days)]
        if u % 4 == 0:
            counts[rng.randrange(days)] += rng.randint(8, 20)  # burst
        truth[u] = counts
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, dt.datetime(2024, 1, 1 + d), u))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                               "user_id long")
    got = {(r.user, r.day.day): r for r in
           ops.count_anomalies(df, z=2.5, min_days=3).collect()}
    expected = set()
    for u, counts in truth.items():
        n = len(counts)
        s1, s2 = sum(counts), sum(c * c for c in counts)
        mean = s1 / n
        var = s2 / n - mean * mean
        for d, c in enumerate(counts):
            if n >= 3 and var > 0 and c > mean \
                    and (c - mean) ** 2 > 2.5 ** 2 * var:
                expected.add((u, d + 1))
    assert set(got) == expected and expected  # non-vacuous
    for (u, d), r in got.items():
        n = len(truth[u])
        s1 = sum(truth[u])
        s2 = sum(c * c for c in truth[u])
        c = truth[u][d - 1]
        z = (n * c - s1) / ((n * s2 - s1 * s1) ** 0.5)
        assert abs(r.zscore - z) < 1e-5


def test_basket_pairs_counts_and_lift(spark):
    # orders: {1,2} x3, {1,3} x1, {2,3} x1, {1} alone x1 -> 6 baskets
    rows = [(o, i) for o, items in enumerate(
        [[1, 2], [1, 2], [1, 2], [1, 3], [2, 3], [1]]) for i in items]
    # duplicate lineitems within an order must not double-count
    rows.append((0, 1))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.item_a, r.item_b): r for r in
           ops.basket_pairs(df, k=10).collect()}
    assert out[(1, 2)].n_orders == 3
    # lift(1,2) = 3*6/(5*4) = 0.9
    assert out[(1, 2)].lift == 0.9
    assert out[(1, 3)].n_orders == 1 and out[(2, 3)].n_orders == 1
    top = ops.basket_pairs(df, k=1).collect()
    assert len(top) == 1 and (top[0].item_a, top[0].item_b) == (1, 2)
    with pytest.raises(ValueError):
        ops.basket_pairs(df, k=0)


def test_ab_test_stats_detects_real_effect(spark):
    import json
    # arm of user u = portable hash parity; build a REAL metric lift in
    # arm 1 and verify the pooled t flags it while equal arms do not
    def arm(u):
        return ((u % 1000000007) * 2654435761 + 42) % 2
    rows = []
    eid = 0
    for u in range(40):
        for k in range(10):
            base = 50 + (u * 7 + k * 3) % 11          # shared noise
            m = base + (25 if arm(u) == 1 else 0)      # arm-1 lift
            rows.append((eid, u, "purchase", json.dumps({"k": m})))
            eid += 1
            rows.append((eid, u, "view", json.dumps({"k": 0})))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                               "event_type string, props string")
    out = {r.variant: r for r in ops.ab_test_stats(df).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_users + out[1].n_users == 40
    assert out[1].metric_mean - out[0].metric_mean > 20
    assert out[0].significant and out[1].significant
    assert abs(out[0].t_stat) > 1.96
    # conversions only: views with k=0 must not pollute the metric sums
    assert out[0].n_conversions * 2 == out[0].n_events
    # identical arms -> not significant
    flat = spark.createDataFrame(
        [(i, u, "purchase", json.dumps({"k": 50}))
         for i, u in enumerate(range(40))],
        "event_id long, user_id long, event_type string, props string")
    res = ops.ab_test_stats(flat).collect()
    assert all(not r.significant for r in res)
    with pytest.raises(ValueError):
        ops.ab_test_stats(df, variants=3)


def test_stickiness_ratio(spark):
    import datetime as dt
    rows = []
    # Jan: user 0 active all 4 tracked days, user 1 one day
    for d in (1, 2, 3, 4):
        rows.append((0, dt.datetime(2024, 1, d)))
    rows.append((1, dt.datetime(2024, 1, 2)))
    # Feb: both users, one day -> stickiness 1.0
    rows += [(0, dt.datetime(2024, 2, 5)), (1, dt.datetime(2024, 2, 5))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.month: r for r in ops.stickiness(df).collect()}
    jan = out["2024-01"]
    assert jan.n_days == 4 and jan.mau == 2 and jan.dau_sum == 5
    assert jan.stickiness == round(5 / (4 * 2), 6)
    assert out["2024-02"].stickiness == 1.0


def test_readability_counts(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, "unpunctuated stream of words"),
         (3, "xyz zzz")],                    # no vowels -> 1 syll per word
        "doc_id long, text string")
    out = {r.doc_id: r for r in ops.with_readability(df).collect()}
    assert out[1].n_sentences == 2 and out[1].n_words == 6
    assert out[2].n_sentences == 1            # floor
    assert out[3].n_syllables == 2             # no-vowel floor per word
    # flesch formula replay for doc 1: 6 words, 2 sentences, 6 syllables
    assert out[1].n_syllables == 6
    assert out[1].flesch == round(206.835 - 1.015 * 3 - 84.6 * 1.0, 6)


def test_identity_clusters_bipartite(spark):
    import json
    # users 1,2 share device 10 (recurring); user 3 on device 20; user 4's
    # single touch on device 10 is below the recurrence threshold
    rows = []
    eid = 0
    for u, d, times in [(1, 10, 3), (2, 10, 3), (3, 20, 3), (4, 10, 1),
                        (2, 30, 3)]:
        for _ in range(times):
            rows.append((eid, u, json.dumps({"k": d})))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                               "props string")
    out = {r.user: r for r in ops.identity_clusters(
        df, device_expr="CAST(get_json_object(props, '$.k') AS BIGINT)",
        min_occurrences=3).collect()}
    assert set(out) == {1, 2, 3}          # user 4: one-off, omitted
    assert out[1].identity_id == out[2].identity_id == 1
    assert out[1].n_users == 2 and out[1].n_devices == 2   # devices 10, 30
    assert out[3].identity_id == 3 and out[3].n_users == 1
    with pytest.raises(ValueError):
        ops.identity_clusters(df, device_expr="user_id", min_occurrences=0)


def test_basket_rules_directional_confidence(spark):
    rows = [(o, i) for o, items in enumerate(
        [[1, 2], [1, 2], [1, 2], [1, 3], [2, 3], [1]]) for i in items]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.antecedent, r.consequent): r
           for r in ops.basket_rules(df, k=10).collect()}
    # item 1 in 5 baskets, item 2 in 4, both in 3
    assert out[(1, 2)].confidence == 0.6       # 3/5
    assert out[(2, 1)].confidence == 0.75      # 3/4
    assert out[(1, 2)].lift == out[(2, 1)].lift == 0.9
    filtered = ops.basket_rules(df, k=10, min_confidence=0.7).collect()
    assert {(r.antecedent, r.consequent) for r in filtered} \
        >= {(2, 1)} and all(r.confidence >= 0.7 for r in filtered)


def test_ab_test_stats_empty_arm_is_defined(spark):
    import json
    # odd-user arm never converts: stats must come back DEFINED (zero
    # sums, NULL mean/t, significant=False), never NULL-poisoned
    rows = [(i, u, "purchase" if u % 2 == 0 else "view",
             json.dumps({"k": 50 + u}))
            for i, u in enumerate(list(range(20)) * 3)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                               "event_type string, props string")
    out = {r.variant: r for r in ops.ab_test_stats(df).collect()}
    empty = out[1] if out[1].n_conversions == 0 else out[0]
    full = out[0] if empty is out[1] else out[1]
    assert empty.metric_sum == 0 and empty.metric_mean is None
    assert full.metric_mean is not None
    assert out[0].significant is False and out[1].significant is False
    assert out[0].t_stat is None


def test_identity_clusters_rejects_namespace_collisions(spark):
    df = spark.createDataFrame([(i, 1, -5) for i in range(3)],
                               "event_id long, user_id long, device long")
    with pytest.raises(ValueError, match="Remap"):
        ops.identity_clusters(df, device_expr="device", min_occurrences=2)


def test_identity_clusters_rejects_null_devices(spark):
    # a misconfigured device_expr (failed cast / JSON extract) yields NULL
    # device ids; the guard must refuse loudly, not silently drop edges
    df = spark.createDataFrame([(i, 1, "not-a-number") for i in range(3)],
                               "event_id long, user_id long, device string")
    with pytest.raises(ValueError, match="NULL"):
        ops.identity_clusters(df, device_expr="try_cast(device AS bigint)",
                              min_occurrences=2)


def test_ab_test_stats_negative_user_ids_get_valid_arms(spark):
    import json
    # hashed (negative) user ids must land in variant {0,1} — the signed-%
    # regression put them in a phantom arm -1 excluded from the t stat
    rows = [(i, u, "purchase", json.dumps({"k": 10}))
            for i, u in enumerate(list(range(-20, 0)) * 2)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                               "event_type string, props string")
    out = {r.variant for r in ops.ab_test_stats(df).collect()}
    assert out <= {0, 1} and len(out) == 2


def test_triangle_counts_clique_vs_chain(spark):
    # clique {1,2,3,4} -> C(3,2)=3 triangles per corner; chain 10-11-12
    # (open wedge) -> none; duplicate + reversed edges must not double
    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = clique + [(10, 11), (11, 12)] + [(2, 1), (1, 2)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.id: r.n_triangles for r in ops.triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}   # chain nodes absent


def test_correlation_matrix_exact_and_bounded(spark):
    rows = [(float(i), float(2 * i + 3), float((-1) ** i), 5.0)
            for i in range(1, 41)]
    df = spark.createDataFrame(rows, "x double, y double, z double, "
                               "c double")
    out = {(r.col_a, r.col_b): r for r in ops.correlation_matrix(
        df, ["x", "y", "z", "c"]).collect()}
    assert out[("x", "y")].r == 1.0            # perfectly linear
    assert abs(out[("x", "z")].r) < 0.1        # alternating sign ~ 0
    # constant column: zero variance -> NULL, never a division error
    assert out[("x", "c")].r is None and out[("z", "c")].r is None
    assert all(r.n == 40 for r in out.values())
    with pytest.raises(ValueError):
        ops.correlation_matrix(df, ["x"])


def test_forecast_baseline_hand_computed(spark):
    import datetime as dt
    rows, eid = [], 0
    # type "a": counts 4,2 on days 1,2; 3,5 on days 8,9 -> AE = 1,3
    for day, c in [(1, 4), (2, 2), (8, 3), (9, 5)]:
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, day), "a"))
            eid += 1
    # type "b": only one week -> no scored days, absent from output
    rows.append((eid, dt.datetime(2024, 1, 1), "b"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                               "event_type string")
    out = {r.event_type: r for r in ops.forecast_baseline(
        df, season_days=7).collect()}
    assert set(out) == {"a"}
    a = out["a"]
    assert a.n_days == 2
    assert a.mae == 2.0                       # (1 + 3) / 2
    assert a.wape == 0.5                      # 4 / (3 + 5)
    with pytest.raises(ValueError):
        ops.forecast_baseline(df, season_days=0)


def test_correlation_matrix_listwise_nulls_and_validation(spark):
    # y is a perfect linear function of x on complete rows; a NULL x row
    # must drop ENTIRELY (listwise) or r would come out wrong/sign-flipped
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (None, 100.0)],
        "x double, y double")
    out = {(r.col_a, r.col_b): r for r in ops.correlation_matrix(
        df, ["x", "y"]).collect()}
    assert out[("x", "y")].r == 1.0 and out[("x", "y")].n == 3
    with pytest.raises(ValueError, match="duplicate"):
        ops.correlation_matrix(df, ["x", "x"])
    with pytest.raises(ValueError, match="non-numeric"):
        ops.correlation_matrix(df.withColumn("s", F.lit("a")), ["x", "s"])
    # underscore-bearing names must not collide in the aggregate aliases
    df2 = spark.createDataFrame([(1.0, 2.0, 3.0, 4.0), (2.0, 1.0, 5.0, 9.0)],
                                "a double, b_c double, a_b double, c double")
    rows = ops.correlation_matrix(df2, ["a", "b_c", "a_b", "c"]).collect()
    assert len(rows) == 6


def test_rfm_approx_all_null_metric_matches_descending_formula(spark):
    import datetime as dt
    # all-NULL monetary: no boundaries exist — descending metrics must
    # land on tile n_tiles (above=0), mirroring the oracle's correlated
    # count over zero edge rows, not a flat 1
    rows = [(u, dt.datetime(2024, 1, 1) + dt.timedelta(days=u), u, None)
            for u in range(12)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                               "user_id long, value double")
    out = {r.user: (r.r_tile, r.m_tile)
           for r in ops.rfm_segments(df, mode="approx").collect()}
    assert all(m == 5 for _r, m in out.values())
    assert {r for r, _m in out.values()} == {1, 2, 3, 4, 5}  # recency real
