"""Exact per-key stratified sampling (X1).

Reference: ``源代码/main/Main.java:132-163`` — RDD
``sampleByKeyExact`` with per-key fraction, then driver-side ordinal
assignment. The rebuild uses a deterministic hash-rank instead: rank
rows per key by ``xxhash64(point_id, seed)`` and keep the first
ceil(fraction·n) (min 2). Exact counts like ``sampleByKeyExact``
(DataFrame ``sampleBy`` is only approximate), fully reproducible
across runs/plans, one shuffle, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample_exact(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
    id_col: str = "point_id",
    min_per_key: int = 2,
    max_per_key: int | None = None,
) -> DataFrame:
    """Keep exactly max(min_per_key, ceil(fraction·n_k)) rows per key.

    Adds ``sample_ord`` (0-based ordinal within the key, the
    reference's per-key sample numbering, Main.java:143-163).
    """
    w = Window.partitionBy(key_col).orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), id_col)
    n_keep = F.greatest(
        F.lit(min_per_key),
        F.ceil(F.count("*").over(Window.partitionBy(key_col)) * F.lit(fraction)),
    )
    if max_per_key is not None:
        n_keep = F.least(n_keep, F.lit(max_per_key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__keep", n_keep)
        .filter(F.col("__rn") <= F.col("__keep"))
        .withColumn("sample_ord", F.col("__rn") - 1)
        .drop("__rn", "__keep")
    )
