"""As-of (temporal) join — an operator Spark lacks natively,
composed purely from built-ins (north-star scope: align event streams,
feature snapshots, rates).

Technique: tag both relations, union them, and carry the right side's
payload forward with ``last_value(..., ignoreNulls)`` over a
(by-key, time) window — one shuffle on the by-key, no UDF, fully
codegen'd. Matches DuckDB's ``ASOF JOIN`` (backward direction:
greatest right.ts ≤ left.ts per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list = "user_id",
    right_cols: list | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` ≤ left.``on`` within the same ``by`` group (backward
    as-of). Right rows with no match yield nulls."""
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]

    l_tag = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        if c in l_tag.columns:
            l_tag = l_tag.withColumnRenamed(c, f"{c}__lhs")
        l_tag = l_tag.withColumn(f"{c}{suffix}", F.lit(None))
    r_tag = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    unioned = l_tag.select(sorted(l_tag.columns)).unionByName(
        r_tag.select(sorted(l_tag.columns))
    )
    # right rows sort before left rows at equal timestamps so an exact
    # tie matches (ASOF's <= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(on, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in right_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    for c in right_cols:
        if f"{c}__lhs" in out.columns:
            out = out.withColumnRenamed(f"{c}__lhs", c)
    return out
