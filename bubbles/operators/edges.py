"""Edge-relation operators over (src, dst, weight) DataFrames: the
reference's Stage C/D building blocks re-expressed relationally.

A4 adjacency build      Main.java:318-347   groupBy + collect_list
A5 per-key max edge     Main.java:363-371   max_by(struct)
P6 tied-edge filter     FilterTiedEdges.java:20-27   left-semi join
P7 edge removal         FilterHighestEdgeWeight.java:20-29  left-anti join
P8 adjacency pruning    FilterAdjacentVertex.java:20-47  re-derive from
                        the surviving edge set (cheaper than array
                        surgery and equivalent)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adjacency(edges: DataFrame) -> DataFrame:
    """(vertex, neighbors ARRAY<BIGINT> sorted) from undirected edges.
    Each edge contributes both directions (Main.java:318-330 flatMap)."""
    both = edges.select(F.col("src").alias("vertex"), F.col("dst").alias("neighbor")).unionAll(
        edges.select(F.col("dst").alias("vertex"), F.col("src").alias("neighbor"))
    )
    return both.groupBy("vertex").agg(
        F.sort_array(F.collect_list("neighbor")).alias("neighbors")
    )


def max_edge_per_key(edges: DataFrame, key_col: str = "subset_id") -> DataFrame:
    """Heaviest edge per key (A5). Deterministic tie-break: the
    smallest (src, dst) among equal weights — deliberately NOT the
    reference's behavior (Main.java:363-371 uses a `>=` comparator,
    which keeps the LAST-SEEN tied edge: scan-order-dependent, hence
    nondeterministic under Spark partitioning; any fixed total order
    is a valid replacement and min-(src,dst) is engine-portable)."""
    best = F.max(
        F.struct(F.col("weight"), (-F.col("src")).alias("ns"), (-F.col("dst")).alias("nd"))
    ).alias("__best")
    return edges.groupBy(key_col).agg(best).select(
        key_col,
        (-F.col("__best.ns")).alias("src"),
        (-F.col("__best.nd")).alias("dst"),
        F.col("__best.weight").alias("weight"),
    )


def tied_edges(edges: DataFrame, max_edges: DataFrame) -> DataFrame:
    """Edges whose weight ties ANY per-key max weight (P6) — a
    left-semi join on weight alone, faithfully reproducing the
    reference's collected-list scan (which also matches on weight
    only). Note the corollary it inherits: with cross-key weight
    collisions (common for quantized weights), an edge can 'tie' a
    DIFFERENT key's max — callers needing per-key tie semantics
    should semi-join on (key, weight) instead."""
    return edges.join(
        max_edges.select("weight").distinct(), on="weight", how="left_semi"
    )


def remove_edges(edges: DataFrame, removed: DataFrame) -> DataFrame:
    """Drop edges matching (src, dst) of the removal set (P7) — a
    left-anti join."""
    return edges.join(
        removed.select("src", "dst").distinct(), on=["src", "dst"], how="left_anti"
    )
