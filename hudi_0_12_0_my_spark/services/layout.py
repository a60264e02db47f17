"""Space-filling-curve sort keys: Z-order (bit interleave) and Hilbert.

Re-expression of SpaceCurveSortingHelper
(hudi-client/hudi-spark-client/.../sort/SpaceCurveSortingHelper.java:64,
277 LoC), HilbertCurveUtils.java:29 and RDDSpatialCurveSortPartitioner.java:49
(strategies linear / z-order / hilbert, HoodieClusteringConfig.java:238-243).

Z-order stays entirely in Catalyst expressions (shiftleft/bitwise OR over
scaled columns — whole-stage codegen, no Python in the hot path). Hilbert needs
per-row bit gymnastics, so it runs as a vectorized pandas_udf over the already
bit-scaled columns (Arrow-batched; the 10-100x-over-row-UDF path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

BITS = 16   # per-column resolution; 3 cols * 16 bits = 48-bit curve key


def _scaled(df: DataFrame, col: str, bits: int) -> Column:
    """Map a column into [0, 2^bits): numeric/temporal via min-max scaling
    (sample-boundary mode of SpaceCurveSortingHelper), strings via hash bits."""
    dt = dict(df.dtypes)[col]
    if dt in ("string", "binary"):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(1 << bits)).cast("long")
    row = df.agg(F.min(F.col(col)).alias("mn"), F.max(F.col(col)).alias("mx")).collect()[0]
    mn, mx = row.mn, row.mx
    c = F.col(col)
    if dt.startswith(("date", "timestamp")):
        c = F.unix_timestamp(F.col(col).cast("timestamp"))
        mn = None if mn is None else None  # recompute on cast scale below
        row2 = df.agg(F.min(c).alias("mn"), F.max(c).alias("mx")).collect()[0]
        mn, mx = row2.mn, row2.mx
    if mn is None or mx is None or float(mx) == float(mn):
        return F.lit(0).cast("long")
    frac = (c.cast("double") - F.lit(float(mn))) / F.lit(float(mx) - float(mn))
    return F.least(F.floor(frac * ((1 << bits) - 1)).cast("long"),
                   F.lit((1 << bits) - 1))


def zorder_key(df: DataFrame, cols: list[str], bits: int = BITS) -> Column:
    """Interleave the bits of the scaled columns (direct bit-interleave build
    method of HoodieClusteringConfig layout optimization)."""
    scaled = [_scaled(df, c, bits) for c in cols]
    n = len(cols)
    out = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, sc in enumerate(scaled):
            # bit `bit` of column ci lands at position bit*n + ci
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(sc, bit).bitwiseAND(F.lit(1)), bit * n + ci))
    return out


def hilbert_key(df: DataFrame, cols: list[str], bits: int = BITS) -> DataFrame:
    """Append a __curve_key column with the Hilbert index of the scaled
    columns (HilbertCurveUtils.java:29). Skilling's transform, vectorized with
    numpy inside a pandas_udf."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    n = len(cols)
    b = bits

    @pandas_udf(T.LongType())
    def _hilbert(*series):
        import numpy as np
        X = [s.to_numpy(dtype=np.uint64, na_value=0) for s in series]
        # Skilling: Gray-code inverse transform of the interleaved coordinates
        M = np.uint64(1) << np.uint64(b - 1)
        X = [x.copy() for x in X]
        q = M
        while q > np.uint64(1):
            p = q - np.uint64(1)
            for i in range(n):
                mask = (X[i] & q) != 0
                X[0][mask] ^= p          # invert
                t = (X[0] ^ X[i]) & p    # exchange (applied where ~mask)
                t = np.where(mask, np.uint64(0), t)
                X[0] ^= t
                X[i] ^= t
            q >>= np.uint64(1)
        for i in range(1, n):
            X[i] ^= X[i - 1]
        t = np.zeros_like(X[0])
        q = M
        while q > np.uint64(1):
            t = np.where((X[n - 1] & q) != 0, t ^ (q - np.uint64(1)), t)
            q >>= np.uint64(1)
        for i in range(n):
            X[i] ^= t
        # interleave bits of the transposed coords -> scalar index
        out = np.zeros_like(X[0])
        for bit in range(b - 1, -1, -1):
            for i in range(n):
                out = (out << np.uint64(1)) | ((X[i] >> np.uint64(bit)) & np.uint64(1))
        return pd.Series(out.astype("int64"))

    scaled = [_scaled(df, c, bits).alias(f"__sc_{i}") for i, c in enumerate(cols)]
    df2 = df.select("*", *scaled)
    df2 = df2.withColumn("__curve_key", _hilbert(*[F.col(f"__sc_{i}") for i in range(n)]))
    return df2.drop(*[f"__sc_{i}" for i in range(n)])
