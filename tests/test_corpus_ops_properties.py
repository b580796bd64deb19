"""Property-based tests (hypothesis) for the round-6 corpus ops:
chunking coverage/overlap invariants, CDC merge laws, KMV sketch
laws, and corpus_diff consistency with merge_upsert.

Same strategy as test_text_properties.py: one Spark job per property
over a generated batch (never one job per example)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

words = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
    min_size=0,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(words, min_size=1, max_size=6), st.integers(2, 12), st.integers(0, 6))
def test_chunking_coverage_and_overlap_properties(spark, docs, w, o):
    """For ANY doc and any (chunk_tokens, overlap): every token is in
    >= 1 chunk; chunk_ord/start are consistent with the stride; every
    chunk except possibly the first starts exactly stride after its
    predecessor; token multiset of stride-covered prefix positions is
    preserved in order within each chunk."""
    from bubbles.operators.chunking import chunk_documents

    o = min(o, w - 1)
    stride = w - o
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string",
    )
    rows = chunk_documents(df, chunk_tokens=w, overlap_tokens=o).collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(docs):
        toks = [t for t in toks if t]
        chunks = sorted(per.get(i, []), key=lambda r: r["chunk_ord"])
        if not toks:
            assert not chunks
            continue
        assert chunks, f"doc {i} lost"
        covered = set()
        for r in chunks:
            s = r["start_token"]
            assert s == r["chunk_ord"] * stride
            body = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert body == toks[s : s + w]
            assert r["n_chunk_tokens"] == len(body)
            covered.update(range(s, min(s + w, len(toks))))
        assert covered == set(range(len(toks))), f"doc {i} coverage gap"


change_ops = st.lists(
    st.tuples(
        st.integers(0, 6),                      # key
        st.sampled_from(["upsert", "delete"]),  # op
        st.integers(0, 20),                     # seq
        st.text(alphabet="abc", max_size=3),    # payload
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(change_ops, change_ops)
def test_merge_upsert_laws(spark, b1, b2):
    """Laws for ANY change batches: (1) at-least-once idempotence —
    applying a batch twice == once; (2) batch composition — apply(B1)
    then apply(B2) == apply(B1 ∪ B2) when B2's seqs are bumped above
    B1's."""
    from bubbles.operators.cdc import merge_upsert

    snap = spark.createDataFrame(
        [(k, f"base{k}") for k in range(4)], "doc_id bigint, text string"
    )

    def ch(rows, seq_bump=0):
        data = [(k, t, s + seq_bump, op) for k, op, s, t in rows]
        return spark.createDataFrame(
            data, "doc_id bigint, text string, seq bigint, op string"
        )

    def snap_of(df):
        return sorted((r["doc_id"], r["text"]) for r in df.collect())

    once = merge_upsert(snap, ch(b1))
    twice = merge_upsert(snap, ch(b1).union(ch(b1)))
    assert snap_of(once) == snap_of(twice)

    stepped = merge_upsert(merge_upsert(snap, ch(b1)), ch(b2, seq_bump=100))
    oneshot = merge_upsert(snap, ch(b1).union(ch(b2, seq_bump=100)))
    assert snap_of(stepped) == snap_of(oneshot)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 400), min_size=1, max_size=120),
    st.integers(2, 300),
)
def test_kmv_laws(spark, values, split_at):
    """Laws for ANY value multiset: duplicate-invariance, exactness
    below k, and shard-merge == whole."""
    from bubbles.operators.sketch import kmv_distinct, kmv_merge, kmv_sketch_rows

    k = 16
    rows = [("g", f"v{v}") for v in values]
    df = spark.createDataFrame(rows, "g string, v string")
    whole = kmv_distinct(df, "g", "v", k=k).collect()[0]
    n_true = len(set(values))
    if n_true < k:
        assert whole["est_distinct"] == n_true
    a = kmv_sketch_rows(
        df.filter(F.col("v") < f"v{split_at}"), "g", "v", k=k
    )
    b = kmv_sketch_rows(
        df.filter(~(F.col("v") < f"v{split_at}")), "g", "v", k=k
    )
    merged = kmv_merge(a.unionByName(b), "g", k=k).collect()[0]
    assert (whole["n_kept"], whole["kth_min"], whole["est_distinct"]) == (
        merged["n_kept"],
        merged["kth_min"],
        merged["est_distinct"],
    )


def test_corpus_diff_agrees_with_merge(spark):
    """corpus_diff(snapshot, merge_upsert(snapshot, changes)) reports
    exactly the changes that took effect."""
    from bubbles.operators.cdc import corpus_diff, merge_upsert

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 5, "upsert"),   # changed
            (2, None, 5, "delete"),   # removed
            (9, "i", 5, "upsert"),    # added
            (3, "c", 5, "upsert"),    # upsert with IDENTICAL payload -> no diff row
        ],
        "doc_id bigint, text string, seq bigint, op string",
    )
    merged = merge_upsert(snap, changes)
    diff = {r["doc_id"]: r["status"] for r in corpus_diff(snap, merged).collect()}
    assert diff == {1: "changed", 2: "removed", 9: "added"}


def test_corpus_diff_schema_mismatch_fails(spark):
    from bubbles.operators.cdc import corpus_diff

    a = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    b = spark.createDataFrame([(1, "x", 2)], "doc_id bigint, text string, extra bigint")
    import pytest

    with pytest.raises(ValueError):
        corpus_diff(a, b)
