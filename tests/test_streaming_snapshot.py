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


# ------------------------------------------------- stream-static + kmv


def test_stream_static_enrich_equals_batch(spark):
    from bubbles.streaming.events import (
        enrich_stream,
        read_events_batch,
        run_enrich_to_memory,
        user_segments_dim,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["segment"], r["event_type"]): (r["n"], r["sum_value"])
        for r in run_enrich_to_memory(spark, sf, name="t_enrich").collect()
    }
    dim = user_segments_dim(spark, sf)
    want = {
        (r["segment"], r["event_type"]): (r["n"], r["sum_value"])
        for r in enrich_stream(read_events_batch(spark, sf), dim).collect()
    }
    assert got == want and len(got) > 0


def test_stream_kmv_multi_batch_equals_batch_sketch(spark, tmp_path):
    """Two micro-batches of events: the stream's FINAL per-key sketch
    equals the batch sketch over the union — bottom-k state merges
    across batches correctly and stays bounded at k."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from bubbles.operators.sketch import kmv_distinct
    from bubbles.streaming.events import kmv_distinct_stream

    data = tmp_path / "ev"
    data.mkdir()
    base = 1_700_000_000_000_000

    def write(path, uids):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(uids)), pa.int64()),
                    "ts": pa.array([base + i for i in range(len(uids))], pa.timestamp("us")),
                    "user_id": pa.array(uids, pa.int64()),
                    "event_type": pa.array(["click"] * len(uids)),
                    "value": pa.array([1.0] * len(uids)),
                    "props": pa.array(["{}"] * len(uids)),
                }
            ),
            path,
        )

    write(str(data / "b1.parquet"), list(range(0, 60)))
    write(str(data / "b2.parquet"), list(range(40, 120)))  # overlap + new

    raw = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(data))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        kmv_distinct_stream(raw, k=16)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_kmv")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM t_kmv").collect()
    # update mode: one row per batch; the LAST (max n_kept, min kth)
    # is the final state — with k=16 < 120 distinct, n_kept is 16 in
    # both, so take the row with the smaller kth_min
    final = min(rows, key=lambda r: (r["kth_min"] is None, r["kth_min"]))
    batch = spark.createDataFrame(
        [("click", u) for u in list(range(0, 60)) + list(range(40, 120))],
        "event_type string, user_id long",
    )
    want = kmv_distinct(batch, "event_type", "user_id", k=16).collect()[0]
    assert (final["n_kept"], final["kth_min"], final["est_distinct"]) == (
        want["n_kept"],
        want["kth_min"],
        want["est_distinct"],
    )
    assert len(rows) == 2  # one update row per micro-batch


def test_stream_near_dup_matches_batch_and_finds_planted(spark, tmp_path):
    """Streaming near-dup vs a static corpus index: (1) the streaming
    query's candidates equal running the same stateless signature
    pipeline on the docs as a batch frame; (2) a planted near-copy of
    a corpus document is flagged; (3) an unrelated doc is not."""
    from pyspark.sql import functions as F

    from bubbles.streaming.neardup import (
        corpus_band_index,
        stream_near_dup_candidates,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    corpus_rows = [(i, base.replace("fox", f"fox{i}")) for i in range(20)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    index = corpus_band_index(corpus, num_hashes=8, band_size=4).localCheckpoint()

    # genuine NEAR-copy of corpus doc 7 (not byte-identical): the
    # trailing words change, so only a partial shingle overlap —
    # a band must still match on the agreeing lanes
    near = base.replace("fox", "fox7").replace(
        "loud hunters", "quiet hunters"
    )
    far = "completely different content about spark physical planning"
    stream_rows = [(100, near), (101, far)]
    data = tmp_path / "docs"
    spark.createDataFrame(stream_rows, "doc_id long, text string").write.parquet(
        str(data)
    )

    batch_docs = spark.read.parquet(str(data))
    want = sorted(
        map(
            tuple,
            stream_near_dup_candidates(batch_docs, index)
            .select("doc_id", "corpus_id", "band")
            .collect(),
        )
    )

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(data))
    q = (
        stream_near_dup_candidates(stream, index)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_neardup")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT doc_id, corpus_id, band FROM t_neardup").collect())
    )
    assert got == want
    flagged = {d for d, _, _ in got}
    assert 100 in flagged, "planted near-copy not flagged"
    assert 101 not in flagged, "unrelated doc falsely flagged"
    assert any(c == 7 for d, c, _ in got if d == 100)
    # the stream text is NOT in the corpus byte-identically, so the
    # match above exercises partial-overlap banding, not equality
    assert near not in {t for _, t in corpus_rows}


def test_persisted_band_index_same_candidates_no_corpus_exchange(spark, tmp_path):
    """Round-9 amortization: the bucketed persisted index yields the
    SAME candidate pairs as the in-memory index, and the warm join
    reads the corpus side with no Exchange (bucketed layout satisfies
    the join distribution via the flattened bkey)."""
    from pyspark.sql import functions as F

    from bubbles.streaming.neardup import (
        corpus_band_index,
        load_corpus_band_index,
        persist_corpus_band_index,
        stream_near_dup_candidates,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    corpus = spark.createDataFrame(
        [(i, base.replace("fox", f"fox{i}")) for i in range(20)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, base.replace("fox", "fox7").replace("loud", "quiet")),
         (101, "completely unrelated content about physical planning")],
        "doc_id long, text string",
    )
    want = sorted(
        map(
            tuple,
            stream_near_dup_candidates(
                batch, corpus_band_index(corpus).localCheckpoint()
            ).collect(),
        )
    )
    import shutil

    # a fresh session does not know about a previous run's managed
    # table, so its leftover warehouse directory must go first
    spark.sql("DROP TABLE IF EXISTS t_neardup_idx")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/t_neardup_idx", ignore_errors=True)
    persist_corpus_band_index(corpus, "t_neardup_idx", n_buckets=4)
    warm = stream_near_dup_candidates(
        batch, load_corpus_band_index(spark, "t_neardup_idx")
    )
    got = sorted(map(tuple, warm.collect()))
    assert got == want
    # plan property: with broadcast off (forcing the join to care
    # about distribution) the corpus side must come from the bucketed
    # files with no shuffle — exactly one Exchange, the tiny probe
    # side. Fresh frame: a collected frame's queryExecution is frozen.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        warm2 = stream_near_dup_candidates(
            batch, load_corpus_band_index(spark, "t_neardup_idx")
        )
        plan = warm2._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    head = plan.split("== Initial Plan ==")[0]
    assert "Bucketed: true" in plan, f"index scan is not bucket-aware:\n{plan}"
    assert head.count("Exchange") <= 1, f"corpus side shuffled:\n{head}"
    # refresh over an EXISTING index (catalog entry + location both
    # present) must reclaim and rebuild without complaint
    persist_corpus_band_index(corpus, "t_neardup_idx", n_buckets=4)
    got3 = sorted(
        map(
            tuple,
            stream_near_dup_candidates(
                batch, load_corpus_band_index(spark, "t_neardup_idx")
            ).collect(),
        )
    )
    assert got3 == want
    spark.sql("DROP TABLE IF EXISTS t_neardup_idx")


def test_persist_band_index_refuses_unrelated_dir(spark):
    """Round-10 (ADVICE r9): a warehouse directory that collides with
    the table name but does NOT look like a previous index write
    (no parquet part files / _SUCCESS) is refused, not destroyed; an
    empty leftover dir (interrupted write) is reclaimed."""
    import os
    import shutil

    import pytest
    from bubbles.streaming.neardup import persist_corpus_band_index

    corpus = spark.createDataFrame(
        [(1, "some document text that is long enough to shingle ok")],
        "doc_id long, text string",
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    tdir = f"{wh}/t_neardup_guard"
    spark.sql("DROP TABLE IF EXISTS t_neardup_guard")
    shutil.rmtree(tdir, ignore_errors=True)
    # unrelated data parked under the warehouse at the colliding name
    os.makedirs(tdir)
    with open(f"{tdir}/precious.txt", "w") as f:
        f.write("not an index")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        persist_corpus_band_index(corpus, "t_neardup_guard", n_buckets=2)
    assert os.path.exists(f"{tdir}/precious.txt")  # untouched
    # an EMPTY leftover dir is an interrupted write: reclaimed
    os.remove(f"{tdir}/precious.txt")
    persist_corpus_band_index(corpus, "t_neardup_guard", n_buckets=2)
    assert spark.table("t_neardup_guard").count() > 0
    spark.sql("DROP TABLE IF EXISTS t_neardup_guard")
