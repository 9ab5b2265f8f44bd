"""Vector math over embedding columns (``array<float>``) using built-in
higher-order functions — F.zip_with / F.aggregate stay JVM-side, no
Python boundary, so these scale linearly with executor count.

Precision contract: inputs are cast to ``array<double>`` and folded
left-to-right (F.aggregate is a sequential fold, as is DuckDB's
list_* reduction), so dot products are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) in double; callers round for oracle comparison."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
