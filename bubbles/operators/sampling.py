"""Exact per-key stratified sampling (X1).

Reference: ``源代码/main/Main.java:132-163`` — RDD
``sampleByKeyExact`` with per-key fraction, then driver-side ordinal
assignment. The rebuild uses a deterministic hash-rank instead: rank
rows per key by ``xxhash64(point_id, seed)`` and keep the first
ceil(fraction·n) (min 2). Exact counts like ``sampleByKeyExact``
(DataFrame ``sampleBy`` is only approximate), fully reproducible
across runs/plans, no driver collect.

Scale shape (round 12 — fully JVM-side, no Python boundary): the rank
runs over SLIM (key, id, hash, keep) rows via a SALTED pre-rank
(guide §2.5/§4.1): a deterministic hash salt splits each key into
``n_salts`` groups, a per-(key, salt) window keeps each group's
``keep_k`` smallest (hash, id) rows — any global top-m row of a key
is top-m within its salt group, so winners always survive — and the
final per-key rank then sees ≤ n_salts·keep_k rows no matter how
large a key is (iteration 0 of fit() has ONE key holding the whole
dataset; a plain per-key window would sort it in a single task).
Both windows are whole-stage-codegen JVM operators; the previous
shape pre-ranked per input partition inside an Arrow ``mapInPandas``
pass, which round-tripped every slim row through Python workers —
measured 30% slower at 600k rows and a per-worker memory liability
at scale (the salt shuffle it avoided is ~32 B/row of slim keys,
cheap next to the boundary crossing). The salt is derived from the
id, never ``rand()`` (retry-safe, SPARK-38388), and the selected
rows and ordinals are identical to a plain per-key rank by the same
(hash, id) total order — n_salts cannot change the result, only the
parallelism. The payload joins back on the winners only
(driver-bounded in every caller, so AQE broadcasts it).
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
    min_ratio: float | None = None,
    ratio_cap: int | None = None,
    counts: DataFrame | None = None,
    n_salts: int | None = None,
) -> DataFrame:
    """Keep exactly max(min_per_key, ceil(fraction·n_k)) rows per key.

    Adds ``sample_ord`` (0-based ordinal within the key, the
    reference's per-key sample numbering, Main.java:143-163).

    ``min_ratio``/``ratio_cap``: optional scale floor that overrides
    ``max_per_key`` for very large keys — keep at least
    min(ceil(n_k·min_ratio), ratio_cap) rows. fit() passes
    2/max_local_size so a key of any size fans out into expected
    bubbles of ≤ max_local_size/2 points instead of stalling at a
    fixed sample cap (a 6M-point key sampled at a flat 768 makes
    ~7.8k-point bubbles that all exceed the local cap, forcing a
    whole extra fragmenting iteration).

    ``counts``: optional precomputed DataFrame(key_col, ``__n``) with
    one row per key — fit() passes the per-subset sizes it already
    aggregated for routing, saving one full pass over ``df``.

    ``n_salts``: pre-rank fan-out per key (default
    max(64, 4·defaultParallelism)); any value yields identical rows.
    """
    if counts is None:
        counts = df.groupBy(key_col).agg(F.count("*").alias("__n"))
    n_keep = F.greatest(
        F.lit(min_per_key), F.ceil(F.col("__n") * F.lit(fraction))
    )
    if max_per_key is not None:
        n_keep = F.least(n_keep, F.lit(max_per_key))
    if min_ratio is not None and ratio_cap is not None:
        n_keep = F.greatest(
            n_keep,
            F.least(
                F.ceil(F.col("__n") * F.lit(float(min_ratio))),
                F.lit(int(ratio_cap)),
            ),
        )
    # long, not int: a single key can hold the whole dataset (fit
    # iteration 0), and ceil(n*fraction) past 2^31 must not overflow
    counts = counts.select(key_col, n_keep.cast("long").alias("__keep"))
    slim = df.select(
        key_col,
        F.col(id_col),
        F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"),
    ).join(F.broadcast(counts), on=key_col)

    if n_salts is None:
        n_salts = max(64, 4 * df.sparkSession.sparkContext.defaultParallelism)
    # deterministic per-id salt, seeded independently of __h so the
    # split is uncorrelated with the rank order
    salt = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.lit(n_salts))
    w1 = Window.partitionBy(key_col, "__salt").orderBy("__h", id_col)
    pre = (
        slim.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("__keep"))
    )
    w = Window.partitionBy(key_col).orderBy("__h", id_col)
    winners = (
        pre.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__keep"))
        .select(key_col, id_col, (F.col("__rn") - 1).alias("sample_ord"))
    )
    return df.join(winners, on=[key_col, id_col])
