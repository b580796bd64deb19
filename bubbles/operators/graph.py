"""Exact fixed-point PageRank — iterative graph analytics.

The MapReduce-era flagship algorithm, re-expressed declaratively: one
equi-join (ranks ⨝ edges on src) plus one aggregation (sum
contributions by dst) per iteration, chained lazily so Catalyst sees
the whole unrolled plan.  Complements ``operators.components``
(connected components) on the graph side of the engine.

Determinism uses the same discipline as ``operators.kmeans``: ranks
live in integer micro-units, the per-edge contribution is the
integer division ``rank div out_degree``, and the damping factor is
the rational 85/100 applied as ``(85 * contrib) div 100`` — every
operation is exact int64 arithmetic, so the result is independent of
partitioning/aggregation order and the DuckDB twin can unroll the
iterations as CTEs and match bit-for-bit.

    r₀(v)   = micro                      (1.0 in micro-units)
    rₜ₊₁(v) = (micro·(den-num)) div den
              + (num · Σ_{u→v} (rₜ(u) div out(u))) div den

Dangling vertices (no out-edges) keep their rank but distribute
nothing — the standard simplification (no teleport redistribution);
the twin applies the same rule via a LEFT JOIN.

Scale: edges shuffle once per iteration on src (the join) and once
on dst (the agg) — the canonical PageRank shuffle pattern; ranks are
one row per vertex.  Skewed high-in-degree vertices are a sum agg
(map-side partials absorb them); skewed high-OUT-degree vertices
fan out in the join exactly like any hot join key — AQE skew-join
handles the split.  For deep iteration counts, localCheckpoint every
few rounds to cap lineage depth (same guidance as
``plans/mrhdbscan.fit``); the default here is shallow unrolling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    micro: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """(vertex, rank_micro) after ``n_iter`` exact damped iterations
    over the distinct directed edge set."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_n"))

    base = (micro * (damping_den - damping_num)) // damping_den
    ranks = verts.select(
        "vertex", F.lit(micro).cast("long").alias("rank_micro")
    )
    for _ in range(n_iter):
        contrib = (
            ranks.join(e, ranks["vertex"] == e["src"])
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("vertex"),
                F.expr("rank_micro div out_n").alias("share"),
            )
            .groupBy("vertex")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = verts.join(contrib, "vertex", "left").select(
            "vertex",
            (
                F.lit(base).cast("long")
                + F.expr(
                    f"CAST({damping_num} AS BIGINT)"
                    " * coalesce(inflow, CAST(0 AS BIGINT))"
                    f" div {damping_den}"
                )
            ).alias("rank_micro"),
        )
    return ranks
