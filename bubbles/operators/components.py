"""Distributed connected components (X6) as iterative DataFrame joins.

Reference: ``源代码/main/findConnectedComponentsOnMST.java:18-73`` +
``Main.java:386-407`` — a local-max-absorption variant iterated to
fixpoint behind an accumulator. Rebuild: min-label propagation with a
pointer-jumping hop each round (label-of-label join), which converges
in ~O(log n) rounds instead of O(diameter); convergence is decided by
a deterministic aggregate (not an accumulator, which double-counts
under task retry). Each round is localCheckpoint()ed to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(vertex, component) with component = min vertex id of the
    component. ``edges`` is an undirected (src, dst) edge list.

    Round shape (tightened round 11, guide §2.4): each round's
    previous label rides along as an extra column through the pointer
    jump, so the convergence count is a filter over the freshly
    checkpointed rows instead of a second full equi-join per round —
    one join + one shuffle of the label relation removed per round
    (measured at sf0.1: 1.81 s -> 1.53 s; 200k-edge bipartite graph
    11.5 s -> 9.6 s, same-session medians of 5/3). Pre-partitioning
    the static ``sym`` relation by its join key was tried and
    deliberately NOT kept: localCheckpoint preserves
    outputPartitioning only with AQE off (measured: 1 exchange
    without AQE, 2 with), and every real session here runs AQE."""
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionAll(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy("a")
            .agg(F.min("component").alias("__nb_min"))
            .withColumnRenamed("a", "vertex")
        )
        stepped = (
            labels.join(nb_min, on="vertex", how="left")
            .select(
                "vertex",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("__nb_min"), F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jump: component <- component's component
        l2 = stepped.select(
            F.col("vertex").alias("__v2"), F.col("component").alias("__c2")
        )
        jumped = (
            stepped.join(l2, stepped.component == F.col("__v2"), how="left")
            .select(
                "vertex",
                "__old",
                F.least(
                    F.col("component"), F.coalesce(F.col("__c2"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        # convergence check scans the rows just materialized — no join
        changed = jumped.filter(F.col("component") != F.col("__old")).count()
        labels = jumped.select("vertex", "component")
        if changed == 0:
            break
    if changed != 0:
        # unconverged labels are silently wrong — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels
