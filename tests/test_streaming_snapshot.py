"""Streaming CDC snapshot maintenance (streaming/snapshot.py):
change batches stream in, the parquet snapshot stays correct and
equals the batch-composed merge."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bubbles.streaming.snapshot import read_snapshot, upsert_snapshot_sink

CHANGE_SCHEMA = "doc_id long, text string, seq long, op string"


def _write_changes(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "seq": pa.array([r[2] for r in rows], pa.int64()),
                "op": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        path,
    )


def _snap_dict(spark, path):
    df = read_snapshot(spark, path)
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_streaming_upsert_snapshot(spark, tmp_path):
    data = tmp_path / "changes"
    data.mkdir()
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        raw = spark.readStream.schema(CHANGE_SCHEMA).parquet(str(data))
        q = (
            raw.writeStream.foreachBatch(upsert_snapshot_sink(snap))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # batch 1: three inserts
    _write_changes(str(data / "b1.parquet"), [
        (1, "one", 1, "upsert"),
        (2, "two", 2, "upsert"),
        (3, "three", 3, "upsert"),
    ])
    run_stream()
    assert _snap_dict(spark, snap) == {1: "one", 2: "two", 3: "three"}

    # batch 2: update 1, delete 2, insert 4 — snapshot reflects all,
    # and doc 3 (untouched) survives from the previous version
    _write_changes(str(data / "b2.parquet"), [
        (1, "one-v2", 10, "upsert"),
        (2, None, 11, "delete"),
        (4, "four", 12, "upsert"),
    ])
    run_stream()
    assert _snap_dict(spark, snap) == {1: "one-v2", 3: "three", 4: "four"}

    # equals the batch-composed merge of all changes at once
    from bubbles.operators.cdc import merge_upsert

    all_changes = spark.read.parquet(str(data))
    empty = spark.createDataFrame([], "doc_id long, text string")
    oneshot = {
        r["doc_id"]: r["text"]
        for r in merge_upsert(empty, all_changes).collect()
    }
    assert oneshot == _snap_dict(spark, snap)


def test_snapshot_versions_and_pointer(spark, tmp_path):
    """Each batch commits a new version; _CURRENT flips atomically and
    old versions stay readable (time travel)."""
    import os

    data = tmp_path / "changes"
    data.mkdir()
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    assert read_snapshot(spark, snap) is None  # before the first commit

    def run_stream():
        raw = spark.readStream.schema(CHANGE_SCHEMA).parquet(str(data))
        q = (
            raw.writeStream.foreachBatch(upsert_snapshot_sink(snap))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    _write_changes(str(data / "b1.parquet"), [(1, "a", 1, "upsert")])
    run_stream()
    _write_changes(str(data / "b2.parquet"), [(1, "b", 2, "upsert")])
    run_stream()

    with open(os.path.join(snap, "_CURRENT")) as f:
        cur = f.read().strip()
    assert cur == "1"
    v0 = spark.read.parquet(os.path.join(snap, "v=0")).collect()
    assert [(r["doc_id"], r["text"]) for r in v0] == [(1, "a")]
    assert _snap_dict(spark, snap) == {1: "b"}
