"""Transformers — DeltaStreamer's transform/ dir re-expressed.

Reference: hudi-utilities/.../transform/SqlQueryBasedTransformer.java:37
(SQL over the incoming batch via a temp view), SqlFileBasedTransformer,
FlatteningTransformer.java:37 (recursive struct flatten), ChainedTransformer.
Each transformer is fn(DataFrame) -> DataFrame so they compose with
df.transform(...) and with the streaming sink's ``transform=`` hook.
"""

from __future__ import annotations

import io
import uuid
from ..storage import get_storage

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

SRC_PATTERN = "<SRC>"


def sql_query_transformer(sql: str):
    """SqlQueryBasedTransformer: ``SELECT ... FROM <SRC> ...`` — the incoming
    batch is registered as a temp view substituted for <SRC>."""

    def apply(df: DataFrame) -> DataFrame:
        view = f"_src_{uuid.uuid4().hex[:8]}"
        df.createOrReplaceTempView(view)
        try:
            return df.sparkSession.sql(sql.replace(SRC_PATTERN, view))
        finally:
            pass   # temp view GC'd with the session; name is unique per call
    return apply


def sql_file_transformer(path: str):
    """SqlFileBasedTransformer: the query text lives in a file."""
    with io.StringIO(get_storage(path).read_bytes(path).decode()) as fh:
        return sql_query_transformer(fh.read())


def flatten_transformer(separator: str = "_"):
    """FlatteningTransformer.java:37: recursively flatten nested structs into
    top-level columns ``outer<sep>inner`` (arrays/maps stay as-is)."""

    def apply(df: DataFrame) -> DataFrame:
        def walk(prefix_name: str, prefix_ref: str, schema: T.StructType):
            out = []
            for f in schema.fields:
                name = f"{prefix_name}{f.name}"
                ref = f"{prefix_ref}`{f.name}`"
                if isinstance(f.dataType, T.StructType):
                    out.extend(walk(name + separator, ref + ".", f.dataType))
                else:
                    out.append(F.col(ref).alias(name))
            return out

        sel = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                sel.extend(walk(f.name + separator, f"`{f.name}`.", f.dataType))
            else:
                sel.append(F.col(f"`{f.name}`"))
        return df.select(*sel)

    return apply


def chain_transformers(*transformers):
    """ChainedTransformer: left-to-right composition."""

    def apply(df: DataFrame) -> DataFrame:
        for t in transformers:
            df = t(df)
        return df
    return apply
