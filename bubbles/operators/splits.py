"""Deterministic train/validation/test splits (north-star scope: a
training-data pipeline needs reproducible, engine-independent dataset
splits that never depend on row order or partitioning).

The bucket is the first 8 hex digits of md5 of the string id, mod 100
— a pure projection (zero shuffle, trivially parallel at any scale)
that any engine can replay exactly (the DuckDB twin uses
``CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % 100``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(id_col: Column) -> Column:
    """Stable [0, 100) bucket from the md5 of the stringified id."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    cuts: tuple = (80, 90),
    names: tuple = ("train", "val", "test"),
) -> DataFrame:
    """Adds ``bucket`` (0-99) and ``split`` columns. ``cuts`` are the
    exclusive upper bucket bounds of all but the last split: the
    default (80, 90) yields 80/10/10 train/val/test."""
    if len(cuts) != len(names) - 1:
        raise ValueError("need exactly one cut per split boundary")
    b = split_bucket(F.col(id_col))
    expr = F.lit(names[-1])
    for cut, name in zip(reversed(cuts), reversed(names[:-1])):
        expr = F.when(b < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("bucket", b).withColumn("split", expr)
