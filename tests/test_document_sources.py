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
