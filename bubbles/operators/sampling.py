"""Exact per-key stratified sampling (X1).

Reference: ``源代码/main/Main.java:132-163`` — RDD
``sampleByKeyExact`` with per-key fraction, then driver-side ordinal
assignment. The rebuild uses a deterministic hash-rank instead: rank
rows per key by ``xxhash64(point_id, seed)`` and keep the first
ceil(fraction·n) (min 2). Exact counts like ``sampleByKeyExact``
(DataFrame ``sampleBy`` is only approximate), fully reproducible
across runs/plans, no driver collect.

Scale shape: the rank runs over SLIM (key, id, hash) rows via a
salted two-phase top-m — a per-(key, salt) pre-rank keeps each salt's
top keep_k, so the final per-key rank sees ≤ n_salts·keep_k rows no
matter how large a key is (iteration 0 of fit() has ONE key holding
the whole dataset; a plain per-key window would sort it in a single
task). The payload joins back on the winners only (driver-bounded in
every caller, so AQE broadcasts it). Selected rows and ordinals are
identical to a plain per-key rank by the same (hash, id) total order:
any global top-m row has < m rows before it globally, hence < m
within its salt, so it always survives the pre-rank.
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
    n_salts: int = 32,
) -> DataFrame:
    """Keep exactly max(min_per_key, ceil(fraction·n_k)) rows per key.

    Adds ``sample_ord`` (0-based ordinal within the key, the
    reference's per-key sample numbering, Main.java:143-163).
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("__n"))
    n_keep = F.greatest(
        F.lit(min_per_key), F.ceil(F.col("__n") * F.lit(fraction))
    )
    if max_per_key is not None:
        n_keep = F.least(n_keep, F.lit(max_per_key))
    # long, not int: a single key can hold the whole dataset (fit
    # iteration 0), and ceil(n*fraction) past 2^31 must not overflow
    counts = counts.select(key_col, n_keep.cast("long").alias("__keep"))
    slim = (
        df.select(
            key_col,
            F.col(id_col),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"),
        )
        .join(counts, on=key_col)
        .withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.lit(n_salts))
        )
    )
    w1 = Window.partitionBy(key_col, "__salt").orderBy("__h", id_col)
    w2 = Window.partitionBy(key_col).orderBy("__h", id_col)
    winners = (
        slim.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("__keep"))
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= F.col("__keep"))
        .select(key_col, id_col, (F.col("__rn") - 1).alias("sample_ord"))
    )
    return df.join(winners, on=[key_col, id_col])
