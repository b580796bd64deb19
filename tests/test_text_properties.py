"""Property-based tests (hypothesis) for the text-operator algebra.

Strategy: drive the COLUMN EXPRESSIONS through one Spark job per
property over a hypothesis-generated batch of rows (one job per
example would take minutes); invariants are checked row-wise in
pandas. ASCII-printable corpus: the engine's cross-engine contract
(Spark vs DuckDB lower/regex) is only claimed for ASCII text —
TESTDATA.md fixtures are ASCII.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ascii_text = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:!?@+-()",
    max_size=80,
)


def _profile_rows(spark, texts):
    from bubbles.operators.text import text_profile

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return text_profile(df).toPandas().sort_values("doc_id")


@settings(max_examples=10, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=8))
def test_quality_micros_bounded_and_consistent(spark, texts):
    """quality_micros ∈ [0, 1e6]; quality == micros/1e6 exactly;
    counts are non-negative and n_alpha+punct ≤ n_chars."""
    out = _profile_rows(spark, texts)
    assert ((out.quality_micros >= 0) & (out.quality_micros <= 1_000_000)).all()
    assert (out.quality == out.quality_micros / 1_000_000.0).all()
    assert (out.n_alpha + out.n_punct <= out.n_chars).all()
    assert (out.n_tokens >= 1).all()  # split('') yields ['']


@settings(max_examples=8, deadline=None)
@given(
    st.lists(ascii_text.filter(lambda s: len(s) >= 5), min_size=1, max_size=5),
    st.integers(min_value=0, max_value=4),
)
def test_winnowing_shared_substring_guarantee(spark, texts, pad):
    """Planting the same 8-char (k+w-1) substring into two documents
    guarantees at least one shared fingerprint; fingerprints of a doc
    are always drawn from its own gram hashes (subset property via
    determinism: same text -> same fp set)."""
    from bubbles.operators.text import winnow_fingerprints

    core = "ZqXw9Ykp"  # 8 = k + w - 1
    rows = [(2 * i, ("x" * pad) + core + t) for i, t in enumerate(texts)]
    rows += [(2 * i + 1, t + core) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df).toPandas()
    by_doc = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    for i in range(len(texts)):
        assert by_doc[2 * i] & by_doc[2 * i + 1], (
            f"docs {2*i} and {2*i+1} share '{core}' but no fingerprint"
        )


@settings(max_examples=8, deadline=None)
@given(st.lists(ascii_text, min_size=2, max_size=6))
def test_keyword_search_invariants(spark, texts):
    """Score is finite and non-negative, rows ≤ top_k, and a document
    containing a query term strictly outscores the all-zero-tf docs."""
    from bubbles.operators.search import keyword_search

    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((len(texts), "needleterm appears here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        keyword_search(df, ["needleterm"], top_k=len(rows))
        .toPandas()
        .sort_values("score", ascending=False)
    )
    assert len(out) <= len(rows)
    assert (out.score >= 0).all()
    top = out.iloc[0]
    assert top.tf_needleterm > 0
    zero = out[out.tf_needleterm == 0]
    if len(zero):
        assert (top.score > zero.score).all()


# ---------------------------------------------------------------------------
# netpbm stream index (pure python — no Spark job needed per example)
# ---------------------------------------------------------------------------

frame_shapes = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=7),   # w
        st.integers(min_value=1, max_value=5),   # h
        st.sampled_from([b"P5", b"P6"]),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=50, deadline=None)
@given(frame_shapes, st.randoms(use_true_random=False))
def test_netpbm_stream_index_roundtrip(shapes, rnd):
    """Indexing a synthesized multi-frame stream recovers every
    frame's exact geometry and payload offsets; truncating the last
    payload byte always raises (torn-stream quarantine contract)."""
    from bubbles.operators.multimodal import _netpbm_stream_index

    blob = b""
    want = []
    for w, h, magic in shapes:
        c = 3 if magic == b"P6" else 1
        payload = bytes(rnd.randrange(256) for _ in range(w * h * c))
        header = magic + b"\n" + f"{w} {h}\n255\n".encode()
        want.append((len(blob) + len(header), w, h, c, payload))
        blob += header + payload
    idx = _netpbm_stream_index(blob)
    assert len(idx) == len(shapes)
    for (off, end, w, h, c), (woff, ww, wh, wc, wpayload) in zip(idx, want):
        assert (off, w, h, c) == (woff, ww, wh, wc)
        assert blob[off:end] == wpayload
    # torn stream: last payload byte missing
    try:
        _netpbm_stream_index(blob[:-1])
        raise AssertionError("truncated stream must raise")
    except ValueError:
        pass
