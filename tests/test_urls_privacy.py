"""Tests for URL canonicalization (operators/urls.py), privacy ops
(operators/privacy.py) and the ORC corpus round trip
(sources/documents.py)."""

import pytest
from pyspark.sql import functions as F

from bubbles.operators.privacy import pseudonymize, suppress_rare
from bubbles.operators.urls import canonicalize_urls


def _canon(spark, *urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, url string")
    rows = sorted(canonicalize_urls(df).collect(), key=lambda r: r["i"])
    return [(r["canonical_url"], r["host"]) for r in rows]


def test_url_variants_collapse(spark):
    out = _canon(
        spark,
        "https://www.ex.com/p?a=1&b=2",
        "HTTPS://WWW.EX.COM:443/p?b=2&utm_source=x&a=1&fbclid=z#frag",
        "https://www.ex.com:443/p?b=2&a=1",
    )
    assert out[0] == out[1] == out[2] == ("https://www.ex.com/p?a=1&b=2", "www.ex.com")


def test_url_ports_and_paths(spark):
    out = _canon(
        spark,
        "http://h.com:80/x",      # default port dropped
        "http://h.com:8080/x",    # non-default kept
        "https://h.com",          # empty path -> /
        "ftp://files.h.com/a/b",  # non-http scheme passes through
    )
    assert out[0] == ("http://h.com/x", "h.com")
    assert out[1] == ("http://h.com:8080/x", "h.com")
    assert out[2] == ("https://h.com/", "h.com")
    assert out[3] == ("ftp://files.h.com/a/b", "files.h.com")


def test_url_tracking_only_query_dropped(spark):
    out = _canon(spark, "https://h.com/p?utm_source=a&utm_medium=b&gclid=1")
    assert out[0] == ("https://h.com/p", "h.com")


def test_url_non_url_rows_null(spark):
    out = _canon(spark, "not a url", "", "www.missing-scheme.com/x")
    assert out == [(None, None)] * 3


def test_url_ref_param_vs_prefix(spark):
    # 'ref' is tracking; 'refresh' is NOT (the regex anchors on = )
    out = _canon(spark, "https://h.com/p?ref=sidebar&refresh=30")
    assert out[0] == ("https://h.com/p?refresh=30", "h.com")


# ---------------------------------------------------------------- privacy


def test_pseudonymize_deterministic_and_salted(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200), (4, None)], "event_id bigint, user_id bigint"
    )
    a = {r["event_id"]: r["user_id"] for r in pseudonymize(df, ["user_id"], "s1").collect()}
    b = {r["event_id"]: r["user_id"] for r in pseudonymize(df, ["user_id"], "s1").collect()}
    c = {r["event_id"]: r["user_id"] for r in pseudonymize(df, ["user_id"], "s2").collect()}
    assert a == b                       # same salt -> same tokens
    assert a[1] == a[2] != a[3]         # referential integrity kept
    assert a[1] != c[1]                 # salt rotation unlinks
    assert a[4] is None                 # NULL stays NULL
    assert len(a[1]) == 16


def test_pseudonymize_join_compatibility(spark):
    """Two tables pseudonymized with the same salt still join."""
    ev = spark.createDataFrame([(1, 100), (2, 200)], "eid bigint, user_id bigint")
    usr = spark.createDataFrame([(100, "a"), (200, "b")], "user_id bigint, seg string")
    j = pseudonymize(ev, ["user_id"], "k").join(
        pseudonymize(usr, ["user_id"], "k"), on="user_id"
    )
    assert j.count() == 2


def test_suppress_rare(spark):
    rows = [(i, "common") for i in range(10)] + [(10, "rare"), (11, None)]
    df = spark.createDataFrame(rows, "id bigint, v string")
    out = {r["id"]: r["v"] for r in suppress_rare(df, "v", min_count=5).collect()}
    assert out[0] == "common" and out[10] is None and out[11] is None
    assert len(out) == 12  # rows survive, values are generalized


def test_privacy_validation(spark):
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        pseudonymize(df, [], "s")
    with pytest.raises(ValueError):
        pseudonymize(df, ["id"], "")
    with pytest.raises(ValueError):
        suppress_rare(df, "nope")
    with pytest.raises(ValueError):
        suppress_rare(df, "id", min_count=0)


# ---------------------------------------------------------------- orc


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    from bubbles.sources.documents import read_corpus_orc, write_corpus_orc

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.when(F.col("id") % 2 == 0, "train").otherwise("val").alias("split"),
    )
    path = str(tmp_path / "orc_corpus")
    write_corpus_orc(df, path, partition_by=("split",))
    back = read_corpus_orc(spark, path)
    assert back.count() == 1000
    assert sorted(back.columns) == ["doc_id", "split", "text"]
    # scan-side guarantees carry over: filter pushdown reaches the ORC
    # scan, and the partition filter prunes directories
    q = back.filter((F.col("split") == "train") & (F.col("doc_id") < 10))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan
    assert "PartitionFilters" in plan and "split" in plan
    assert q.count() == 5
    # round-trip values intact
    row = back.filter(F.col("doc_id") == 7).collect()[0]
    assert row["text"] == "text 7" and row["split"] == "val"


def test_orc_partition_column_validation(spark, tmp_path):
    from bubbles.sources.documents import write_corpus_orc

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        write_corpus_orc(df, str(tmp_path / "x"), partition_by=("nope",))


def test_jsonl_round_trip(spark, tmp_path):
    from bubbles.sources.documents import (
        read_documents_jsonl,
        split_quarantine,
        write_corpus_jsonl,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text with \"quotes\" and \\ backslash "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        (F.col("id") % 7).alias("n_chars"),
    )
    path = str(tmp_path / "jsonl_corpus")
    write_corpus_jsonl(df, path)
    # cache before splitting: Spark refuses to answer queries that
    # reference ONLY the corrupt-record column of a raw JSON scan
    raw = read_documents_jsonl(spark, path).cache()
    back, bad = split_quarantine(raw)
    assert bad.count() == 0
    assert back.count() == 200
    row = back.filter(F.col("doc_id") == 13).collect()[0]
    assert row["text"] == 'text with "quotes" and \\ backslash 13'
    assert row["n_chars"] == 6
