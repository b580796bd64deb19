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


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 200), min_size=0, max_size=80),
    st.lists(st.integers(0, 200), min_size=0, max_size=80),
)
def test_kmv_overlap_laws(spark, va, vb):
    """Laws for ANY pair of value multisets: jaccard in [0, 1e6],
    est_intersect <= est_union, symmetry, and exactness when the
    union fits below k."""
    from bubbles.operators.sketch import kmv_overlap

    k = 32
    if not va and not vb:
        return
    a = spark.createDataFrame(
        [("g", f"v{v}") for v in va] or [("empty", "x")], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"v{v}") for v in vb] or [("empty", "x")], "g string, v string"
    )
    rows = {r["g"]: r for r in kmv_overlap(a, b, "g", "v", k=k).collect()}
    if "g" in rows:
        r = rows["g"]
        assert 0 <= r["jaccard_ppm"] <= 1_000_000
        assert r["est_intersect"] <= r["est_union"]
        assert r["k_intersect"] <= r["n_kept_union"]
        sa, sb = set(va), set(vb)
        if len(sa | sb) < k and va and vb:
            assert r["est_union"] == len(sa | sb)
            assert r["k_intersect"] == len(sa & sb)
            assert r["est_intersect"] == len(sa & sb)
        # symmetry
        swapped = {
            x["g"]: x for x in kmv_overlap(b, a, "g", "v", k=k).collect()
        }["g"]
        assert (r["est_union"], r["k_intersect"], r["jaccard_ppm"]) == (
            swapped["est_union"],
            swapped["k_intersect"],
            swapped["jaccard_ppm"],
        )


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(1, 5000), min_size=1, max_size=60), st.integers(1, 4000))
def test_compaction_plan_laws(spark, sizes, target):
    """Laws for ANY file inventory: bin_ids non-decreasing in file
    order, bin_offset < target always, offset 0 iff the running sum
    crossed a fresh multiple, and sum(sizes) preserved."""
    from bubbles.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate(sizes)], "part string, f long, sz long"
    )
    rows = sorted(
        compaction_plan(files, "part", "f", "sz", target_bytes=target).collect(),
        key=lambda r: r["f"],
    )
    assert [r["sz"] for r in rows] == sizes
    cum = 0
    for r in rows:
        assert r["bin_id"] == cum // target
        assert r["bin_offset"] == cum % target
        cum += r["sz"]
    bins = [r["bin_id"] for r in rows]
    assert bins == sorted(bins)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
def test_sampled_quantiles_laws(spark, vals):
    """Laws for ANY value list (group <= k so the sample is exact):
    q=0 -> min, q=1e6 -> max, monotone in q, values come from the
    input."""
    from bubbles.operators.sketch import sampled_quantiles

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(vals)],
        "g string, id long, v double",
    )
    got = {
        r["q_ppm"]: r["value"]
        for r in sampled_quantiles(
            df, "g", "id", "v", qs_ppm=[0, 250_000, 500_000, 1_000_000], k=128
        ).collect()
    }
    assert got[0] == min(vals) and got[1_000_000] == max(vals)
    assert got[0] <= got[250_000] <= got[500_000] <= got[1_000_000]
    assert all(v in vals for v in got.values())
    # exact order statistics at the pinned index rule
    s = sorted(vals)
    m = len(s)
    for q, v in got.items():
        assert v == s[q * (m - 1) // 1_000_000]
