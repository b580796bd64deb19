"""Column-expression builders (JVM-side, codegen-friendly): distances,
Data-Bubble statistics, text analysis, vector math."""

from bubbles.functions.distances import distance_expr, DISTANCES
from bubbles.functions.bubble_stats import (
    bubble_rep,
    bubble_extent,
    bubble_nn_dist,
    bubble_distance_expr,
    mutual_reachability,
)

__all__ = [
    "distance_expr",
    "DISTANCES",
    "bubble_rep",
    "bubble_extent",
    "bubble_nn_dist",
    "bubble_distance_expr",
    "mutual_reachability",
]
