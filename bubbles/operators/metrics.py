"""Distributed clustering-evaluation metrics (pair counting).

The quality protocol (tools/quality.py, QUALITY_r6.json) scores ARI by
collecting labels to the driver — fine at 245k, impossible at 10^8.
These operators compute the same pair-counting statistics as DataFrame
aggregations: the contingency table is one hash aggregation whose
cardinality is (#clusters_a x #clusters_b) — tiny regardless of row
count — and everything after is arithmetic on a handful of rows.

All sufficient statistics are exact int64 (C(n,2) at n=10^8 is ~5e15,
comfortably inside long); the final ratios are single IEEE double
expressions evaluated in a pinned order, so the DuckDB twin reproduces
them bit-for-bit (+,-,*,/ are correctly rounded everywhere; no
log/exp, which is why entropy-based NMI is deliberately absent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    # C(cnt, 2) in exact integer arithmetic: cnt*(cnt-1) is even, so a
    # right shift IS the halving (a double `/2` would round past 2^53 —
    # cnt*(cnt-1) reaches 1e16 at n=1e8)
    c = col.cast("long")
    return F.shiftright(c * (c - F.lit(1)), 1)


def clustering_pair_stats(
    df: DataFrame,
    col_a: str = "label_a",
    col_b: str = "label_b",
) -> DataFrame:
    """One-row pair-counting comparison of two labelings.

    Columns (all exact int64 except the three doubles):
      n           rows compared (non-null in both labelings)
      n_pairs     C(n, 2)
      same_both   pairs co-clustered in BOTH labelings (sum C(n_ij,2))
      same_a      pairs co-clustered in `col_a`        (sum C(a_i,2))
      same_b      pairs co-clustered in `col_b`        (sum C(b_j,2))
      ari         adjusted Rand index
      pair_precision  same_both / same_b   (b as the prediction)
      pair_recall     same_both / same_a
    Degenerate cases (every row one cluster / all singletons in both)
    leave ari NULL — the index is undefined there, and NULL round-trips
    engines exactly where a sentinel would not.

    Scale shape: one hash aggregation to the (label_a, label_b)
    contingency (map-side partials absorb any cluster size), then
    aggregations over #clusters rows. No window, no sort, no collect.
    """
    pairs = df.select(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    cont = pairs.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("cnt"))
    sij = cont.agg(
        F.sum(_c2(F.col("cnt"))).alias("same_both"),
        F.sum("cnt").alias("n"),
    )
    sa = (
        cont.groupBy("__a")
        .agg(F.sum("cnt").alias("c"))
        .agg(F.sum(_c2(F.col("c"))).alias("same_a"))
    )
    sb = (
        cont.groupBy("__b")
        .agg(F.sum("cnt").alias("c"))
        .agg(F.sum(_c2(F.col("c"))).alias("same_b"))
    )
    stats = sij.crossJoin(sa).crossJoin(sb)
    n_pairs = _c2(F.col("n").cast("long"))
    # expected index and ARI in a PINNED double evaluation order (the
    # DuckDB twin spells out the identical expression): exp = sa*sb/np,
    # ari = (sij - exp) / ((sa+sb)/2 - exp)
    # n_pairs = C(n,2) is 0 for n < 2; divide through nullif so the
    # degenerate input yields NULL ari (docstring contract) instead of
    # an ANSI DIVIDE_BY_ZERO, matching the precision/recall guards
    exp = (
        F.col("same_a").cast("double")
        * F.col("same_b").cast("double")
        / F.nullif(F.col("n_pairs").cast("double"), F.lit(0.0))
    )
    return (
        stats.withColumn("n_pairs", n_pairs)
        .withColumn(
            "ari",
            (F.col("same_both").cast("double") - exp)
            / F.nullif(
                (
                    F.col("same_a").cast("double")
                    + F.col("same_b").cast("double")
                )
                / F.lit(2.0)
                - exp,
                F.lit(0.0),
            ),
        )
        .withColumn(
            "pair_precision",
            F.col("same_both").cast("double")
            / F.nullif(F.col("same_b").cast("double"), F.lit(0.0)),
        )
        .withColumn(
            "pair_recall",
            F.col("same_both").cast("double")
            / F.nullif(F.col("same_a").cast("double"), F.lit(0.0)),
        )
        .select(
            F.col("n").cast("long").alias("n"),
            "n_pairs",
            "same_both",
            "same_a",
            "same_b",
            "ari",
            "pair_precision",
            "pair_recall",
        )
    )
