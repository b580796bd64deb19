"""Bucketed-table source/sink: pre-shuffled, co-located storage for
the joins a 100 TB warehouse runs every day.

Spark's bucketed tables (``write.bucketBy(n, key).sortBy(key)
.saveAsTable``) persist the hash-partitioning INTO the file layout:
every write shuffles once, and every subsequent equi-join or
aggregation on the bucket key reads both sides already co-located —
the sort-merge join plans with ZERO Exchange nodes (asserted by
tests/test_bucketed.py and tools/plan_audit.py). For a fact table
joined on the same key by hundreds of daily queries, that is the
single biggest shuffle eliminator available: pay the shuffle once at
ingest, never again.

Sizing rule at scale: pick ``n_buckets`` so each bucket's PER-TABLE
bytes stay in the hundreds of MB (one task's comfortable working
set) — e.g. a 10 TB fact table at 512 MB/bucket wants ~20k buckets.
Both join sides must use the same bucket count (or a divisor) for
the co-located plan. ``sortBy`` orders rows inside each bucket file
(row-group locality, min/max stats); note that since Spark 3.0 the
READ side only exploits that order for Sort elimination under the
legacy conf ``spark.sql.legacy.bucketedTableScan.outputOrdering``
(which forces one-file-per-bucket reads) — the shuffle elimination
is the scale win and needs no conf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet bucketed table in the session
    catalog (no Hive needed — the bucket spec lives in the Spark
    catalog; files land under ``spark.sql.warehouse.dir``)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # one file per bucket: repartition with Spark's HashPartitioning
    # (the same Murmur3 hash the bucket spec uses) so every task holds
    # exactly one bucket's rows. Without this each task writes a file
    # per bucket it touches, and the scan refuses to trust sortBy
    # order across multiple files — re-adding the merge-join Sort.
    from pyspark.sql import functions as F

    w = (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With both
    sides bucketed on ``key`` this plans as a sort-merge join with no
    Exchange on either side — scan, zip buckets, merge (pinned by
    tests/test_bucketed.py and tools/plan_audit.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=key)
