"""JSONL/CSV corpus ingestion: explicit schema, corrupt-record
quarantine (one bad line = one quarantined row, never a job failure)."""


def test_read_documents_jsonl_quarantine(spark, tmp_path):
    from bubbles.sources.documents import read_documents_jsonl, split_quarantine

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "s", "n_chars": 12}\n'
        '{"doc_id": 3, "text": "missing fields are null"}\n'
    )
    df = read_documents_jsonl(spark, str(p))
    clean, bad = split_quarantine(df)
    c = clean.toPandas().sort_values("doc_id")
    assert list(c["doc_id"]) == [1, 2, 3]
    assert c[c.doc_id == 3]["lang"].isna().all()
    b = bad.toPandas()
    assert len(b) == 1 and "not json" in b.iloc[0]["_corrupt"]


def test_read_documents_csv_quarantine(spark, tmp_path):
    from bubbles.sources.documents import read_documents_csv, split_quarantine

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,s,11\n"
        "oops,not,a,valid,row,at,all,extra,cols\n"
        "2,zweite zeile,de,s,12\n"
    )
    df = read_documents_csv(spark, str(p))
    clean, bad = split_quarantine(df)
    assert sorted(clean.toPandas()["doc_id"]) == [1, 2]
    # .count() on the quarantine side prunes to the corrupt column
    # alone, which Spark disallows on raw CSV scans - materialize
    assert len(bad.toPandas()) == 1


def test_write_corpus_partitioned_roundtrip(spark, tmp_path):
    """Hive-partitioned write: directory layout, round-trip equality,
    and plan-time partition pruning (a split filter reads only that
    split's files)."""
    from pyspark.sql import functions as F

    from bubbles.operators.splits import assign_split
    from bubbles.sources.documents import write_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus")
    write_corpus(assign_split(docs), out, partition_by=("split",))

    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert dirs == ["split=test", "split=train", "split=val"]

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # pruning: the split filter lands in the scan's PartitionFilters
    # (directory-level pruning, zero I/O for other splits) and the
    # pruned scan returns exactly the train rows
    train = back.filter(F.col("split") == "train")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters", 1)[1][:200]
    n_train = docs.count() - back.filter(F.col("split") != "train").count()
    assert train.count() == n_train > 0
    # content round-trips (ids + texts)
    a = sorted(r.doc_id for r in back.select("doc_id").collect())
    b = sorted(r.doc_id for r in docs.select("doc_id").collect())
    assert a == b

    # missing partition column fails fast
    try:
        write_corpus(docs, str(tmp_path / "x"), partition_by=("nope",))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    join with ZERO Exchange in the physical plan (persisted hash
    partitioning) — the co-located-join layout for repeated joins."""
    from pyspark.sql import functions as F

    from bubbles.sources.bucketed import bucketed_join, write_bucketed

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(li, "t_li_bucketed", "l_orderkey", 8, mode="overwrite")
        write_bucketed(od, "t_od_bucketed", "l_orderkey", 8, mode="overwrite")
        j = bucketed_join(spark, "t_li_bucketed", "t_od_bucketed", "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:600]
        # same rows as the plain (shuffled) join
        assert j.count() == li.join(od, on="l_orderkey").count()
        # the plain join DOES shuffle — the bucketing is what removed it
        p2 = (
            li.join(od, on="l_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_od_bucketed")
