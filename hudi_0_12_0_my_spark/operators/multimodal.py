"""Multimodal column conventions + (stubbed) decode/feature pipeline.

Convention (SURVEY.md §2.11): media rides in the table as an opaque
`binary` payload column plus a typed metadata struct:

    media: binary
    media_meta: struct<media_type:string, mime:string, width:int, height:int,
                       duration_ms:bigint, sample_rate:int, n_frames:int>

The Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shape — is real and tested. Byte decode has two modes: ``mode="fake"``
(default) produces deterministic hash-derived features so downstream
operators are testable with no media libraries at all, and ``mode="real"``
decodes the actual payloads inside the SAME plan — WAV audio via the stdlib
``wave`` module (zero dependencies, tested in-container), images via pillow
(optional; a clear ImportError inside the executor when absent). The plan
shape is identical in both modes, which is the 100 TB-relevant part.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_META_TYPE = StructType([
    StructField("media_type", StringType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def with_media_columns(df: DataFrame, payload_col, media_type: str,
                       mime: str, **meta) -> DataFrame:
    """Attach the standard (media, media_meta) columns from a binary column."""
    fields = []
    for f in MEDIA_META_TYPE.fields:
        if f.name == "media_type":
            fields.append(F.lit(media_type).alias("media_type"))
        elif f.name == "mime":
            fields.append(F.lit(mime).alias("mime"))
        else:
            v = meta.get(f.name)
            if isinstance(v, Column):
                # per-row metadata (e.g. duration from an upstream probe)
                fields.append(v.cast(f.dataType).alias(f.name))
            else:
                fields.append((F.lit(v) if v is not None else F.lit(None))
                              .cast(f.dataType).alias(f.name))
    return (df.withColumn("media", F.col(payload_col).cast(BinaryType()))
              .withColumn("media_meta", F.struct(*fields)))


def _png_codec():
    """Pure-stdlib PNG decode/encode (struct + zlib), returned as NESTED
    functions so cloudpickle ships them by value inside the mapInPandas
    closures — executors never need this package importable.

    Scope: 8-bit non-interlaced gray / gray+alpha / RGB / RGBA, all five
    scanline filters (the PNG spec's mandatory baseline minus palette and
    16-bit). It exists so ``mode="real"`` image paths WORK — and are CI-
    exercised — in environments without pillow; pillow, when present, is
    preferred (faster C loops, every format)."""

    def decode(payload):
        """PNG bytes -> uint8 ndarray (h, w, channels)."""
        import struct
        import zlib

        import numpy as np
        b = bytes(payload)
        if b[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("stdlib PNG decode: not a PNG payload")
        pos, idat = 8, []
        w = h = depth = ctype = interlace = None
        while pos + 8 <= len(b):
            ln, typ = struct.unpack(">I4s", b[pos:pos + 8])
            data = b[pos + 8:pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                    ">IIBBBBB", data)
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
        if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
            raise NotImplementedError(
                f"stdlib PNG decode handles 8-bit non-interlaced "
                f"gray/RGB(+alpha) only (depth={depth} color={ctype} "
                f"interlace={interlace}); install pillow for the rest")
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        stride, bpp = w * nch, nch
        raw = zlib.decompress(b"".join(idat))
        out = bytearray()
        prev = bytearray(stride)
        rpos = 0
        for _y in range(h):
            flt = raw[rpos]
            cur = bytearray(raw[rpos + 1:rpos + 1 + stride])
            rpos += 1 + stride
            if flt == 1:                                  # Sub
                for i in range(bpp, stride):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            elif flt == 2:                                # Up
                for i in range(stride):
                    cur[i] = (cur[i] + prev[i]) & 0xFF
            elif flt == 3:                                # Average
                for i in range(stride):
                    a = cur[i - bpp] if i >= bpp else 0
                    cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif flt == 4:                                # Paeth
                for i in range(stride):
                    a = cur[i - bpp] if i >= bpp else 0
                    up = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    cur[i] = (cur[i] + (
                        a if pa <= pb and pa <= pc
                        else (up if pb <= pc else c))) & 0xFF
            out += cur
            prev = cur
        return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, nch)

    def encode(arr):
        """uint8 ndarray (h, w[, channels]) -> PNG bytes (filter 0)."""
        import struct
        import zlib

        import numpy as np
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, nch = arr.shape
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype,
                                             0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    def gray(arr):
        """Decoded array -> float64 (h, w) luma in [0, 255] (ITU-R 601,
        the same weights PIL's convert('L') uses)."""
        import numpy as np
        a = arr.astype(np.float64)
        if a.shape[2] >= 3:
            return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                    + 0.114 * a[:, :, 2])
        return a[:, :, 0]

    return decode, encode, gray


def extract_features(df: DataFrame, dim: int = 16, fake: bool = True,
                     id_col: str = "doc_id",
                     mode: str | None = None) -> DataFrame:
    """media -> feature vector via mapInPandas (Arrow-batched, schema-typed).

    ``mode`` (overrides the legacy ``fake`` flag):
    - ``"fake"`` (default): deterministic hash-features, so joins/ANN over
      media features are testable with no media libraries at all. This is
      the mode the correctness gate's oracle pins.
    - ``"real"``: decode the actual bytes inside the same mapInPandas plan.
      Audio (``media_type == "audio"``, WAV payloads) decodes with the
      stdlib ``wave`` module — per-window RMS energy over ``dim`` equal
      windows, no external dependency. Images decode with pillow
      (grayscale thumbnail intensities) and raise ImportError inside the
      executor when pillow is absent — the Spark plan (schema,
      partitioning, Arrow batch shape) is identical either way, which is
      the part that matters at 100 TB.
    """
    if mode is None:
        mode = "fake" if fake else "real"
    if mode not in ("fake", "real"):
        raise ValueError(f"extract_features: unknown mode {mode!r}")
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("media_type", StringType()),
        StructField("features", ArrayType(FloatType())),
    ])
    png_decode, _png_encode, png_gray = _png_codec()

    # self-contained closure: no references to this module, so executors
    # never need the package importable (cloudpickle ships it by value;
    # the png codec functions are nested, so they ship by value too)
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_features(payload, d):
            out, h = [], payload or b""
            while len(out) < d:
                h = hashlib.sha256(h).digest()
                out.extend(x / 255.0 for x in h)
            return [float(x) for x in out[:d]]

        def wav_features(payload, d):
            # stdlib decode: mono-fold, split into d equal windows, RMS
            # energy per window normalized to the sample width
            import io
            import wave as wv

            import numpy as np
            with wv.open(io.BytesIO(payload)) as w:
                frames = w.readframes(w.getnframes())
                width, ch = w.getsampwidth(), w.getnchannels()
            if width == 1:
                # 8-bit WAV PCM is UNSIGNED (0-255, midpoint 128) per the
                # RIFF spec — int8 would decode silence as -128 (RMS ~1.0)
                x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
                x = (x - 128.0) / 127.0
            elif width in (2, 4):
                dt = np.int16 if width == 2 else np.int32
                x = np.frombuffer(frames, dtype=dt).astype(np.float64)
                x = x / float(np.iinfo(dt).max)
            else:
                raise NotImplementedError(
                    f"unsupported WAV sample width {width}")
            if ch > 1:
                x = x.reshape(-1, ch).mean(axis=1)
            if x.size == 0:
                return [0.0] * d
            return [float(np.sqrt(np.mean(s ** 2)))
                    if s.size else 0.0 for s in np.array_split(x, d)]

        def image_features(payload, d):
            import io
            try:
                from PIL import Image
            except ImportError:
                # stdlib fallback (PNG only): per-strip mean luma over d
                # vertical strips — same feature semantics as the pillow
                # (d, 1) thumbnail, zero dependencies
                import numpy as np
                cols = png_gray(png_decode(payload)).mean(axis=0)
                return [float(s.mean()) / 255.0
                        for s in np.array_split(cols, d)]
            img = Image.open(io.BytesIO(payload)).convert("L")
            return [p / 255.0 for p in img.resize((d, 1)).getdata()]

        def real_features(payload, mtype, d):
            if payload is None:
                return [0.0] * d
            if mtype == "audio":
                return wav_features(bytes(payload), d)
            if mtype == "image":
                return image_features(bytes(payload), d)
            raise NotImplementedError(
                f"extract_features(mode='real'): no decoder for "
                f"media_type {mtype!r} (audio=wav/stdlib, image=pillow)")

        for pdf in batches:
            mtypes = [m["media_type"] for m in pdf["media_meta"]]
            if mode == "real":
                feats = [real_features(p, mt, dim)
                         for p, mt in zip(pdf["media"], mtypes)]
            else:
                feats = [fake_features(p, dim) for p in pdf["media"]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "media_type": mtypes,
                "features": feats,
            })

    cols = df.select(id_col, "media", "media_meta")
    return cols.mapInPandas(run, schema=out_schema)


def phash_near_dup(df: DataFrame, id_col: str = "doc_id",
                   media_col: str = "media", bands: int = 4,
                   max_hamming: int = 8) -> DataFrame:
    """Perceptual-hash near-duplicate candidates over a binary media column.

    Classic image-dedup shape: a 64-bit perceptual hash per item, split into
    `bands` fixed-width bands; any pair sharing at least one identical band
    is a candidate (pigeonhole: guaranteed recall for Hamming distance <
    `bands`), then the exact Hamming distance filters candidates to
    `<= max_hamming`. The real pHash (DCT over decoded pixels) needs image
    libs not in this container, so the hash is the deterministic stand-in
    md5(media)[:16 hex] — the *blocking plan* is the production shape.

    Shape for 100 TB: hash + band split are map-only projections; ONE
    shuffle on (band, band_value) for the equi-join — never an all-pairs
    or Hamming-radius scan; the Hamming filter is a JVM bit_count over the
    carried band arrays, no second shuffle beyond the pair distinct.
    """
    # band width is measured in hex chars of the 16-char hash: bands must
    # divide 16 (bands=32/64 would yield width 0 — every band substring
    # empty, one giant bucket, an all-pairs cross join)
    if bands not in (1, 2, 4, 8, 16):
        raise ValueError("phash_near_dup: bands must be one of 1,2,4,8,16")
    width = 16 // bands                    # hex chars per band
    hx = F.substring(F.md5(F.col(media_col)), 1, 16)
    h = df.select(F.col(id_col), hx.alias("__hx"))
    h = h.withColumn("__bands", F.array(*[
        F.conv(F.substring("__hx", 1 + width * i, width), 16, 10)
         .cast("long") for i in range(bands)]))
    e = h.select(id_col, "__bands",
                 F.posexplode("__bands").alias("__band", "__bv"))
    a, b = e.alias("a"), e.alias("b")
    cand = (a.join(b, [F.col("a.__band") == F.col("b.__band"),
                       F.col("a.__bv") == F.col("b.__bv"),
                       F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.__bands").alias("__ba"),
                    F.col("b.__bands").alias("__bb"))
            .distinct())
    ham = sum(F.bit_count(F.col("__ba").getItem(i)
                          .bitwiseXOR(F.col("__bb").getItem(i)))
              for i in range(bands))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .drop("__ba", "__bb"))


def resize_plan(df: DataFrame, max_side: int = 256,
                id_col: str = "doc_id", fake: bool = True,
                mode: str | None = None) -> DataFrame:
    """Image resize via mapInPandas: emit (id, out_width, out_height, media).

    Target dimensions (aspect-preserving, longest side = max_side, never
    upscaled) are computed JVM-side from media_meta so Catalyst can prune
    no-op rows BEFORE bytes reach Python — at 100 TB most images are already
    small and the binary column for them is never shipped through Arrow.
    ``mode="fake"`` (default, = legacy fake=True) passes bytes through;
    ``mode="real"`` resamples with pillow and re-encodes PNG, raising
    ImportError inside the executor when pillow is absent.
    """
    if mode is None:
        mode = "fake" if fake else "real"
    w, h = F.col("media_meta.width"), F.col("media_meta.height")
    scale = F.lit(max_side) / F.greatest(w, h)
    need = F.greatest(w, h) > max_side
    tw = F.when(need, F.floor(w * scale)).otherwise(w).cast("int")
    th = F.when(need, F.floor(h * scale)).otherwise(h).cast("int")
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("media", BinaryType()),
    ])

    png_decode, png_encode, _png_gray = _png_codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resample(payload, tw_, th_):
            import io
            try:
                from PIL import Image
            except ImportError:
                # stdlib fallback (PNG only): nearest-neighbor index
                # sampling + filter-0 PNG re-encode
                import numpy as np
                arr = png_decode(bytes(payload))
                h0, w0 = arr.shape[:2]
                yi = np.minimum(np.arange(int(th_)) * h0 // int(th_), h0 - 1)
                xi = np.minimum(np.arange(int(tw_)) * w0 // int(tw_), w0 - 1)
                return png_encode(arr[yi][:, xi])
            img = Image.open(io.BytesIO(bytes(payload)))
            buf = io.BytesIO()
            img.resize((int(tw_), int(th_))).save(buf, format="PNG")
            return buf.getvalue()

        for pdf in batches:
            if mode == "real":
                pdf = pdf.copy()
                pdf["media"] = [
                    resample(p, tw_, th_) for p, tw_, th_ in
                    zip(pdf["media"], pdf["out_width"], pdf["out_height"])]
            yield pdf[[id_col, "out_width", "out_height", "media"]]

    todo = (df.filter(F.col("media_meta.media_type") == "image")
            .filter(need)        # no-op rows pruned before Python/Arrow
            .select(id_col, tw.alias("out_width"), th.alias("out_height"),
                    "media"))
    return todo.mapInPandas(run, schema=out_schema)


def audio_chunk_plan(df: DataFrame, chunk_ms: int = 30_000,
                     id_col: str = "doc_id") -> DataFrame:
    """Audio chunking plan: one row per chunk_ms window of each clip.

    Same shape as frame_sample_plan — the explode happens before decode so
    chunks of one long recording parallelize across tasks; a later
    mapInPandas consumes (media, chunk_start_ms, chunk_end_ms).
    """
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))
    starts = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)),
                        F.lit(chunk_ms))
    return (df.filter(F.col("media_meta.media_type") == "audio")
            .select(id_col, "media_meta",
                    F.explode(starts).alias("chunk_start_ms"))
            .withColumn("chunk_end_ms",
                        F.least(F.col("chunk_start_ms") + chunk_ms, dur)))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000,
                      id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame timestamp.

    Pure expressions (sequence + explode over duration_ms) — the actual frame
    decode would consume (media, frame_ts) in a later mapInPandas. This is
    the scalable shape: the explode happens before decode, so frames of one
    video parallelize across tasks.
    """
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))
    ts = F.sequence(F.lit(0), dur, F.lit(every_ms))
    return (df.select(id_col, "media_meta", F.explode(ts).alias("frame_ts"))
              .filter(F.col("media_meta.media_type").isin("video", "audio")))
