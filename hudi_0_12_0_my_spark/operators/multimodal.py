"""Multimodal column conventions + (stubbed) decode/feature pipeline.

Convention (SURVEY.md §2.11): media rides in the table as an opaque
`binary` payload column plus a typed metadata struct:

    media: binary
    media_meta: struct<media_type:string, mime:string, width:int, height:int,
                       duration_ms:bigint, sample_rate:int, n_frames:int>

The Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shape — is real and tested; the actual byte decode is stubbed because
image/audio libraries are not in this container: `decode_media` raises
NotImplementedError unless `fake=True`, which produces a deterministic
hash-derived feature vector (so downstream operators are testable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
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
            fields.append((F.lit(v) if v is not None else F.lit(None))
                          .cast(f.dataType).alias(f.name))
    return (df.withColumn("media", F.col(payload_col).cast(BinaryType()))
              .withColumn("media_meta", F.struct(*fields)))


def extract_features(df: DataFrame, dim: int = 16, fake: bool = True,
                     id_col: str = "doc_id") -> DataFrame:
    """media -> feature vector via mapInPandas (Arrow-batched, schema-typed).

    The real decode (PIL/torchaudio/av) is not available in this container:
    with fake=False this raises NotImplementedError *inside the executor* on
    first batch, proving the plumbing end-to-end. fake=True yields
    deterministic hash-features so joins/ANN over media features are testable.
    """
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("media_type", StringType()),
        StructField("features", ArrayType(FloatType())),
    ])

    # self-contained closure: no references to this module, so executors
    # never need the package importable (cloudpickle ships it by value)
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_features(payload, d):
            out, h = [], payload or b""
            while len(out) < d:
                h = hashlib.sha256(h).digest()
                out.extend(x / 255.0 for x in h)
            return [float(x) for x in out[:d]]

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; use fake=True for the deterministic "
                    "stand-in")
            feats = [fake_features(p, dim) for p in pdf["media"]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "media_type": [m["media_type"] for m in pdf["media_meta"]],
                "features": feats,
            })

    cols = df.select(id_col, "media", "media_meta")
    return cols.mapInPandas(run, schema=out_schema)


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
