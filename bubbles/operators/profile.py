"""Column-level data profiling — the first query a pipeline runs
against a new 100 TB corpus drop (null rates, cardinalities, value
ranges) before any cleaning stage is configured.

``profile_columns`` emits one row per profiled column:
``(column, n_rows, n_nulls, n_distinct, min_repr, max_repr,
total_len)``.  All statistics for ALL columns are computed in a
SINGLE aggregation node: Spark plans the N exact ``count(DISTINCT)``
aggregates through one Expand (each input row fans out N+1 ways,
tagged per distinct-group) followed by two-phase partial/final hash
aggregation — one shuffle for the whole profile, never one job per
column.  The scan reads only the profiled columns (column pruning),
and min/max run typed (numeric order, not lexicographic) before the
final cast to string.

The per-row Expand fan-out is the documented cost of EXACT
cardinalities: N+1 rows per input row, absorbed by map-side partial
aggregation (the shuffle carries only distinct (column, value)
partials, bounded by the true cardinalities, not the row count).
For a 1000-column table, profile in column batches of ~32 so a
single Expand never multiplies the scan by 1000; for
cardinality-only-approximate use cases Spark's native
``approx_count_distinct`` HLL drops the Expand entirely, but its
binary sketch is not engine-portable, so the exact form is what the
DuckDB twin pins (the KMV sketch in operators/sketch.py is the
portable approximate path).

``min_repr``/``max_repr``/``total_len`` stringify values, so they are
engine-portable for integer, string, date and timestamp columns;
floating-point stringification differs across engines in edge cases
(scientific notation thresholds) — profile floats through an explicit
``CAST(x AS DECIMAL(p, s))`` column if twin-parity matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One profile row per column in ``columns``, from one aggregation
    pass over ``df``. Exact distinct counts (see module docstring for
    the Expand cost model)."""
    if not columns:
        raise ValueError("profile_columns needs at least one column")
    if len(set(columns)) != len(columns):
        raise ValueError(f"duplicate columns: {columns}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__nn_{i}"),
            F.count_distinct(col).alias(f"__nd_{i}"),
            F.min(col).cast("string").alias(f"__mn_{i}"),
            F.max(col).cast("string").alias(f"__mx_{i}"),
            F.sum(F.length(col.cast("string"))).alias(f"__tl_{i}"),
        ]
    one = df.agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__nn_{i}")).alias("n_nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_repr"),
                F.col(f"__mx_{i}").alias("max_repr"),
                # all-NULL column: sum() is NULL, report 0 chars
                F.coalesce(F.col(f"__tl_{i}"), F.lit(0).cast("long")).alias(
                    "total_len"
                ),
            )
            for i, c in enumerate(columns)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.column",
        "r.n_rows",
        "r.n_nulls",
        "r.n_distinct",
        "r.min_repr",
        "r.max_repr",
        "r.total_len",
    )


def key_skew_profile(
    df: DataFrame, key_col: str, k_sample: int = 1024
) -> DataFrame:
    """One-row skew diagnosis for a prospective join/groupBy key —
    the number that decides whether a key needs salting BEFORE the
    job burns a day discovering it at 100 TB.

    Emits ``(n_keys, n_rows, max_count, p50_count, p99_count,
    skew_ratio_ppm)`` where ``skew_ratio_ppm = max_count * n_keys *
    1e6 div n_rows`` — the hottest key's row count as ppm-multiples
    of the mean (1_000_000 = perfectly uniform; 50_000_000 = the hot
    key is 50x the mean and a plain shuffle will straggle on it).
    Rule of thumb: salt above ~10x (10_000_000 ppm), or rely on AQE
    skew-join for joins only.

    Cost: one two-phase count per key (map-side partials absorb the
    hot key before the shuffle — counting is never itself skewed),
    one tiny agg, and hash-rank-sampled count quantiles
    (sampled_quantiles: deterministic, <= k_sample rows ever
    windowed). Exact integers end-to-end; p50/p99 are exact when the
    key space is <= k_sample."""
    from bubbles.operators.sketch import sampled_quantiles

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    base = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_count"),
    )
    q = sampled_quantiles(
        counts.withColumn("__g", F.lit("g")),
        "__g",
        key_col,
        "cnt",
        qs_ppm=[500_000, 990_000],
        k=k_sample,
    )
    qs = q.groupBy("__g").agg(
        F.max(F.when(F.col("q_ppm") == 500_000, F.col("value"))).alias("p50_count"),
        F.max(F.when(F.col("q_ppm") == 990_000, F.col("value"))).alias("p99_count"),
    )
    return (
        base.crossJoin(qs.drop("__g"))
        .withColumn(
            "skew_ratio_ppm",
            F.expr(
                "CAST(max_count AS DECIMAL(38,0)) * n_keys * 1000000 div n_rows"
            ).cast("long"),
        )
        .select(
            "n_keys", "n_rows", "max_count", "p50_count", "p99_count",
            "skew_ratio_ppm",
        )
    )


def join_cardinality(
    df_a: DataFrame, df_b: DataFrame, key_col: str
) -> DataFrame:
    """EXACT output-size profile of a prospective equi-join — the
    other half of join planning next to ``key_skew_profile``: before
    launching a 100 TB x 10 TB join, know |A JOIN B| and whether one
    key produces most of it (the fan-out blowup a cartesian-ish
    many-to-many join hides until it OOMs).

    |A JOIN B on k| = sum over k of cA(k)*cB(k), computed from the
    two COUNT relations — each side collapses to one row per key via
    a partial-agged count (the 100 TB tables never meet; their counts
    do, in a key-sized equi-join). Emits one row: (join_rows,
    n_keys_common, max_key_rows, max_key, top_key_share_ppm) where
    max_key is the largest single-key contribution (deterministic
    (contribution, key) tie-break) and top_key_share_ppm its share of
    the join output — 1_000_000 means ONE key is the whole join."""
    ca = df_a.groupBy(key_col).agg(F.count(F.lit(1)).alias("__ca"))
    cb = df_b.groupBy(key_col).agg(F.count(F.lit(1)).alias("__cb"))
    # __k as STRING (works for any key type — a long cast NULLed
    # string keys and broke the tie-break); the per-key product in
    # DECIMAL(38,0) — two 4e9-row sides on one hot key exceed 2^63
    # and a BIGINT multiply wraps silently in non-ANSI Spark, exactly
    # the blowup this profile exists to detect
    contrib = ca.join(cb, on=key_col).select(
        F.col(key_col).cast("string").alias("__k"),
        (F.col("__ca").cast("decimal(38,0)") * F.col("__cb")).alias("__c"),
    )
    agg = contrib.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("join_rows"),
        F.count(F.lit(1)).alias("n_keys_common"),
        F.max(F.struct(F.col("__c"), F.col("__k"))).alias("__m"),
    )
    return _cardinality_report(agg)


def _cardinality_report(agg: DataFrame) -> DataFrame:
    """Final projection of ``join_cardinality``, split out so the
    >2^63 saturation path is unit-testable without 4e9-row inputs.

    The >2^63 blowup (two 4e9-row sides on one hot key) is exactly
    what this profile exists to report, and a non-ANSI decimal->long
    cast would NULL the headline counts right at that scale (round-8
    ADVICE). The output stays BIGINT (the driver's value-hasher is
    dtype-sensitive; see tests/test_twin_types.py) but SATURATES at
    int64 max instead of NULLing: a reported 9223372036854775807
    means "at least this big — do not run this join"."""
    i64max = F.lit(9223372036854775807).cast("decimal(38,0)")
    return agg.select(
        F.least(F.col("join_rows").cast("decimal(38,0)"), i64max)
        .cast("long")
        .alias("join_rows"),
        "n_keys_common",
        F.least(
            F.coalesce(F.col("__m.__c"), F.lit(0)).cast("decimal(38,0)"), i64max
        )
        .cast("long")
        .alias("max_key_rows"),
        F.col("__m.__k").alias("max_key"),
        F.when(F.col("join_rows") > 0,
               F.expr("CAST(__m.__c AS DECIMAL(38,0)) * 1000000 div join_rows"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_key_share_ppm"),
    )
