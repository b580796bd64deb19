"""Streaming CDC snapshot maintenance — a change stream (upserts +
deletes) continuously materialized into a queryable parquet snapshot:
the streaming face of ``operators.cdc.merge_upsert`` and the lake
equivalent of a MERGE-INTO sink.

Layout: each micro-batch writes a FULL new snapshot version under
``<path>/v=<batch_id>/`` and then atomically repoints the ``_CURRENT``
marker (write-temp + rename — readers never observe a half-written
version). Versioning by ``batch_id`` makes the sink idempotent under
foreachBatch's at-least-once replay contract: a replayed batch
rebuilds the SAME version from the SAME inputs (the previous pointer
still names the prior version until the rename), so exactly-once
snapshot semantics come out of at-least-once delivery. Old versions
stay readable for time travel until pruned.

Scale: the per-batch cost is merge_upsert's — one two-phase
winner-per-key agg over the (small) change batch + one equi-join
against the current snapshot, then an insert-only rewrite. A full
rewrite per batch is the parquet-lake baseline (what Delta/Iceberg
COW does per commit); for 100 TB snapshots with tiny batches the
refinement is partitioning the snapshot (write_corpus) and rewriting
only partitions the batch touches — the merge operator is unchanged,
only the write clause narrows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _current_path(path: str) -> str:
    return os.path.join(path, "_CURRENT")


def read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    """The current snapshot version, or None before the first commit."""
    marker = _current_path(path)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def upsert_snapshot_sink(
    path: str,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
):
    """A ``foreachBatch`` function maintaining the snapshot at
    ``path`` from a stream of change rows (payload + seq + op).
    Use: ``changes.writeStream.foreachBatch(upsert_snapshot_sink(p))
    .option("checkpointLocation", ...).start()``."""
    from bubbles.operators.cdc import merge_upsert

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        payload = [c for c in batch_df.columns if c not in (seq_col, op_col)]
        current = read_snapshot(spark, path)
        if current is None:
            current = spark.createDataFrame([], batch_df.select(*payload).schema)
        merged = merge_upsert(
            current, batch_df, key_col=key_col, seq_col=seq_col, op_col=op_col
        )
        vdir = os.path.join(path, f"v={batch_id}")
        merged.write.mode("overwrite").parquet(vdir)
        tmp = _current_path(path) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, _current_path(path))

    return apply_batch
