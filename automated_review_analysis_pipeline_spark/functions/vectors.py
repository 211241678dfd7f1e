"""Vector math over ArrayType columns -- all built-in higher-order functions.

Used by the similarity-search and embedding-dedup operators. Everything is
JVM-side (``aggregate`` / ``zip_with``), no Python. Inputs are cast to
double FIRST so the left-to-right fold is bit-identical to the DuckDB
oracle's float64 math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column) -> Column:
    """array<float> -> array<double> (needed before any fold: float32
    accumulation diverges from the oracle's float64)."""
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Left-to-right fold of pairwise products; deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|); inputs must already be double arrays."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
