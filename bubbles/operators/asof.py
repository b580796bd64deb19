"""As-of (temporal) join — an operator Spark lacks natively,
composed purely from built-ins (north-star scope: align event streams,
feature snapshots, rates).

Technique: tag both relations, union them, and carry the right side's
whole payload ROW forward as a struct with ``last(..., ignoreNulls)``
over a (by-key, time) window — one shuffle on the by-key, no UDF,
fully codegen'd. Filling a struct (never null for a right row, even
when every payload column in it is NULL) keeps row-level matching
independent of payload nullability, exactly like DuckDB's ``ASOF
JOIN`` (backward direction: greatest right.ts ≤ left.ts per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    as-of). Left rows with no match yield nulls."""
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]

    rrow_type = T.StructType([right.schema[c] for c in right_cols])
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__rrow", F.lit(None).cast(rrow_type)
    )
    r_tag = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__rrow"),
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
    filled = unioned.withColumn(
        "__rrow", F.last("__rrow", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__rrow").getField(c))
    return out.drop("__rrow")
