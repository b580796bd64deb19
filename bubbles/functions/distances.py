"""Distance functions as pure Spark column expressions over
ARRAY<DOUBLE> columns (X13 UDF surface of the reference,
源代码/distance/DistanceCalculator.java:9-20 + 5 strategy impls).

Column expressions stay inside whole-stage codegen — no Python UDFs.
The numpy twins used inside kernels live in
bubbles.kernels.hdbscan_kernel.ROW_DISTANCES.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sum_arr(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def euclidean(a: Column, b: Column) -> Column:
    """sqrt(Σ (a_i - b_i)^2) — ref 源代码/distance/EuclideanDistance.java:28-36"""
    return F.sqrt(_sum_arr(F.zip_with(a, b, lambda x, y: (x - y) * (x - y))))


def manhattan(a: Column, b: Column) -> Column:
    """Σ |a_i - b_i| — ref 源代码/distance/ManhattanDistance.java:28-36"""
    return _sum_arr(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def chebyshev(a: Column, b: Column) -> Column:
    """max |a_i - b_i| — ref 源代码/distance/SupremumDistance.java:28-40"""
    return F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def dot(a: Column, b: Column) -> Column:
    return _sum_arr(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_sum_arr(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    """1 - cos similarity — ref 源代码/distance/CosineSimilarity.java:28-40"""
    den = norm(a) * norm(b)
    return F.when(den == 0, F.lit(1.0)).otherwise(F.lit(1.0) - dot(a, b) / den)


def pearson(a: Column, b: Column) -> Column:
    """1 - pearson corr over components — ref 源代码/distance/PearsonCorrelation.java:28-55"""
    d = F.size(a).cast("double")
    ma = _sum_arr(a) / d
    mb = _sum_arr(b) / d
    ca = F.transform(a, lambda x: x - ma)
    cb = F.transform(b, lambda x: x - mb)
    den = norm(ca) * norm(cb)
    return F.when(den == 0, F.lit(1.0)).otherwise(F.lit(1.0) - dot(ca, cb) / den)


DISTANCES = {
    "euclidean": euclidean,
    "manhattan": manhattan,
    "chebyshev": chebyshev,
    "cosine": cosine,
    "pearson": pearson,
}


def distance_expr(a: Column, b: Column, metric: str = "euclidean") -> Column:
    """Resolve a metric name to a column expression (user-extensible:
    pass any callable (Column, Column) -> Column instead of a name)."""
    if callable(metric):
        return metric(a, b)
    try:
        return DISTANCES[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(DISTANCES)}")
