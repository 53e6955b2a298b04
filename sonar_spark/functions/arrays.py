"""Array/vector column expressions (SURVEY §2.7 distance family).

All JVM-side higher-order functions — no Python. These are the exact
formulas of reference algorithms/stats/distance.go, expressed over
array<double>/array<float> columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def asum(col: Column) -> Column:
    """Sum of array elements (double)."""
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product (distance.go:48-70 numerator)."""
    return asum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm2(a: Column) -> Column:
    return F.sqrt(asum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine_similarity(a: Column, b: Column) -> Column:
    """a.b / (|a||b|), 0 when either norm is 0 (distance.go:48-70)."""
    d = norm2(a) * norm2(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def euclidean(a: Column, b: Column) -> Column:
    """L2 distance (distance.go:29-37)."""
    return F.sqrt(
        asum(F.zip_with(a, b, lambda x, y: F.pow(x.cast("double") - y.cast("double"), 2)))
    )


def manhattan(a: Column, b: Column) -> Column:
    """L1 distance (distance.go:156-166)."""
    return asum(F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))))


def chebyshev(a: Column, b: Column) -> Column:
    """L-inf distance (distance.go:169-184)."""
    return F.array_max(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
    )


def hamming(a: Column, b: Column) -> Column:
    """Count of unequal positions (distance.go:187-195)."""
    return asum(F.zip_with(a, b, lambda x, y: (x != y).cast("double")))


def jaccard_exact(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| on element sets (distance.go:198-216) — the
    MinHash estimand, exact form."""
    u = F.size(F.array_union(a, b))
    return F.when(
        u > 0, F.size(F.array_intersect(a, b)).cast("double") / u
    ).otherwise(F.lit(0.0))
