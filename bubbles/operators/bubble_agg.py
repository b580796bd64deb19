"""Data-Bubble aggregation (A2) as a distributed groupBy.agg.

Reference: ``源代码/mappers/CombineStep.java:18-64`` merges cluster
features pairwise inside ``reduceByKey`` — non-associative and
carrying bug B1 (n += 1 per merge). The rebuild aggregates per
dimension with plain ``sum``/``count`` (associative, partial
aggregation map-side, one shuffle of #bubbles rows — not points) and
derives rep/extent/nnDist as column expressions afterwards
(paper formulas, SURVEY.md §2.9 B1–B3 fixed).

The feature array is unpacked into d scalar columns so the whole
pipeline stays in whole-stage codegen; d is bounded (reference data
≤ 90 dims) so the expression count is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bubbles.functions.bubble_stats import bubble_extent, bubble_nn_dist, bubble_rep


def bubble_aggregate(
    assigned: DataFrame,
    dim: int,
    key_cols: tuple = ("subset_id", "bubble_id"),
    features_col: str = "features",
    k: int = 1,
) -> DataFrame:
    """(key..., n, ls, ss, rep, extent, nn_dist) per bubble."""
    fs = [F.col(features_col)[i] for i in range(dim)]
    aggs = (
        [F.count("*").cast("double").alias("n")]
        + [F.sum(fs[i]).alias(f"__ls{i}") for i in range(dim)]
        + [F.sum(fs[i] * fs[i]).alias(f"__ss{i}") for i in range(dim)]
    )
    agg = assigned.groupBy(*key_cols).agg(*aggs)
    ls = F.array(*[F.col(f"__ls{i}") for i in range(dim)])
    ss = F.array(*[F.col(f"__ss{i}") for i in range(dim)])
    n = F.col("n")
    out = agg.select(
        *key_cols,
        n,
        ls.alias("ls"),
        ss.alias("ss"),
    )
    extent = bubble_extent(F.col("ls"), F.col("ss"), n)
    return (
        out.withColumn("rep", bubble_rep(F.col("ls"), n))
        .withColumn("extent", extent)
        .withColumn("nn_dist", bubble_nn_dist(F.col("extent"), n, F.lit(dim), k=k))
    )
