"""Single-call array literals for model constants.

``F.lit(<python list>)`` in CLASSIC PySpark builds
``array(*[lit(x) for x in xs])`` — one py4j round trip and one CreateArray
child PER ELEMENT (the r7 "single Literal" comments were only true under
Spark Connect — ADVICE r7). A 1-D numpy array instead rides Py4J's array
converter into ONE JVM ``functions.lit`` call, producing a single Literal
leaf: ~4x faster to construct at 1k elements and a 1-node (not 1k-node)
subtree for every analyzer/optimizer walk. Matrices become one array
literal per ROW (k calls, not k*d).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F


def dbl_lit(xs) -> Column:
    """array<double> literal in one py4j call."""
    return F.lit(np.asarray(list(xs), dtype=np.float64))


def int_lit(xs) -> Column:
    """array-of-int literal; int32 when every element fits (matching the
    element-wise Py4J promotion the per-element lit() path produced, so
    downstream result types are unchanged), int64 otherwise."""
    vals = [int(x) for x in xs]
    small = all(-2**31 <= v < 2**31 for v in vals)
    return F.lit(np.asarray(vals, dtype=np.int32 if small else np.int64))


def str_lit(xs) -> Column:
    """array<string> literal in one py4j call."""
    return F.lit(np.asarray(list(xs), dtype=np.str_))


def dbl_mat_lit(rows) -> Column:
    """array<array<double>> literal: one array literal per row."""
    return F.array(*[dbl_lit(r) for r in rows])
