"""Data-Bubble statistics as column expressions.

A bubble summarizes a set of points by (n, LS, SS): count, linear sum
and per-dimension square sum. From these the representative, extent
and nnDist are derived (Santos et al. 2021 §IV; reference
源代码/mappers/CombineStep.java:42-64 and
源代码/datastructure/ClusterFeatureDataBubbles.java:216-239).

Paper-formula fixes applied per SURVEY.md §2.9:
  B1: n is summed (groupBy count), never "+1 per merge".
  B2: exponents use true float division (the reference's 1/d int
      division made nnDist == extent for d > 1).
  B3: extent uses the paper's global form
      sqrt(Σ_d (2·n·SS_d − 2·LS_d²) / (n(n−1))), negatives clamped,
      not the per-dimension averaged variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bubble_rep(ls: Column, n: Column) -> Column:
    """rep = LS/n elementwise (F8, CombineStep.java:58-64)."""
    return F.transform(ls, lambda x: x / n)


def bubble_extent(ls: Column, ss: Column, n: Column) -> Column:
    """Paper extent (F9/B3): sqrt(Σ_d max(0, 2n·SS_d − 2·LS_d²) / (n(n−1)));
    0 when n <= 1 (ClusterFeatureDataBubbles.java:224-231 intent)."""
    num = F.aggregate(
        F.zip_with(ls, ss, lambda l, s: F.greatest(2.0 * n * s - 2.0 * l * l, F.lit(0.0))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(n > 1, F.sqrt(num / (n * (n - F.lit(1.0))))).otherwise(F.lit(0.0))


def bubble_nn_dist(extent: Column, n: Column, dim: Column, k: int = 1) -> Column:
    """nnDist = (k/n)^(1/d) · extent (F10, fixing B2 int division;
    ClusterFeatureDataBubbles.java:233-239)."""
    return F.pow(F.lit(float(k)) / n, F.lit(1.0) / dim.cast("double")) * extent


def bubble_distance_expr(
    dist: Column, e_a: Column, e_b: Column, nn_a: Column, nn_b: Column
) -> Column:
    """Bubble-to-bubble distance (F6, HdbscanDataBubbles.java:592-600):
    if d − (e_a+e_b) ≥ 0: d − (e_a+e_b) + (nn_a+nn_b)
    else: max(nn_a, nn_b)."""
    gap = dist - (e_a + e_b)
    return F.when(gap >= 0, gap + nn_a + nn_b).otherwise(F.greatest(nn_a, nn_b))


def mutual_reachability(dist: Column, core_a: Column, core_b: Column) -> Column:
    """max(d, core_a, core_b) (F7, HDBSCANStar.java:162-168)."""
    return F.greatest(dist, core_a, core_b)
