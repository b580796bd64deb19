"""Bucketed (pre-shuffled) tables — the co-located-join layout.

At 100 TB the same fact table is joined on the same key by every
pipeline run; a sort-merge join shuffles it every time. Writing it
ONCE bucketed by the join key (``bucketBy`` — Spark's persisted hash
partitioning, metadata-tracked in the catalog) makes every later
equi-join or aggregation on that key exchange-free: the scan itself
reports hashpartitioning(key, n_buckets), so Catalyst plans the join
with ZERO Exchange on the bucketed side(s). Bucket counts must match
(or divide evenly, with spark.sql.bucketing v2) for both sides to
skip the shuffle.

Spark constraint: bucketed output requires ``saveAsTable`` (the
bucket spec lives in the catalog, not in parquet footers) — a plain
``.parquet(path)`` write silently drops bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "error",
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) by the join key. ``n_buckets`` should match
    the partner table's — mismatched counts re-shuffle one side."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket key. With equal
    bucket counts the physical plan contains NO Exchange — assert via
    ``df._jdf.queryExecution().executedPlan()`` (done in the test and
    in tools/plan_audit.py)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on_cols)
