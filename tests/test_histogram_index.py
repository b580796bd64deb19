"""Tests for histogram (operators/histogram.py) and the inverted
index (operators/search.py inverted_index)."""

import pytest
from pyspark.sql import functions as F

from bubbles.operators.histogram import histogram
from bubbles.operators.search import inverted_index


def test_histogram_bins_and_negatives(spark):
    df = spark.createDataFrame(
        [(x,) for x in [-10.5, -0.1, 0.0, 0.1, 9.99, 10.0, 25.0, None]],
        "v double",
    )
    out = {r["bin"]: (r["bin_start"], r["n"]) for r in histogram(df, "v", 10.0).collect()}
    # floor rounds toward -inf: -10.5 -> bin -2, -0.1 -> bin -1
    assert out[-2] == (-20.0, 1)
    assert out[-1] == (-10.0, 1)
    assert out[0] == (0.0, 3)     # 0.0, 0.1, 9.99
    assert out[1] == (10.0, 1)    # 10.0 lands in [10, 20)
    assert out[2] == (20.0, 1)
    assert sum(n for _, n in out.values()) == 7  # NULL excluded


def test_histogram_validation(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        histogram(df, "nope", 1.0)
    with pytest.raises(ValueError):
        histogram(df, "v", 0.0)


def test_inverted_index_df_tf_and_cap(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana banana banana"),
            (3, "apple cherry"),
        ],
        "doc_id bigint, text string",
    )
    rows = inverted_index(docs, max_postings=2).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append((r["doc_id"], r["tf"], r["df"]))
    # df is the TRUE document frequency, counted before the cap
    assert all(d == 3 for _, _, d in by_term["apple"])
    assert len(by_term["apple"]) == 2  # capped
    # top postings by (tf desc, doc_id asc): apple tf=2 in doc 1
    assert sorted(by_term["apple"])[0] == (1, 2, 3)
    assert by_term["banana"] == [(2, 3, 2), (1, 1, 2)] or sorted(
        by_term["banana"]
    ) == [(1, 1, 2), (2, 3, 2)]
    assert by_term["cherry"] == [(3, 1, 1)]


def test_inverted_index_tie_break_on_doc_id(spark):
    docs = spark.createDataFrame(
        [(i, "same") for i in range(10)], "doc_id bigint, text string"
    )
    rows = inverted_index(docs, max_postings=3).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2]  # tf all 1 -> lowest ids
    assert all(r["df"] == 10 for r in rows)


def test_inverted_index_case_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "Apple APPLE  apple"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    rows = inverted_index(docs, max_postings=5).collect()
    assert len(rows) == 1
    assert rows[0]["term"] == "apple" and rows[0]["tf"] == 3 and rows[0]["df"] == 1


def test_inverted_index_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        inverted_index(docs, max_postings=0)


# ---------------------------------------------------------- substring dedup


def _clean(spark, docs, **kw):
    from bubbles.operators.text import substring_dedup

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_kept"])
        for r in substring_dedup(df, **kw).collect()
    }


def test_substring_dedup_cross_doc_span_removed_in_full(spark):
    """A 10-token span shared by two docs is removed ENTIRELY from
    both (every alignment of the sliding 8-gram covers it), while the
    unique prefix/suffix tokens survive."""
    span = " ".join(f"dup{i}" for i in range(10))
    out = _clean(
        spark,
        [(1, f"alpha beta {span} gamma"), (2, f"x {span} y z")],
        gram_tokens=8,
        min_count=2,
    )
    assert out[1] == ("alpha beta gamma", 13, 3)
    assert out[2] == ("x y z", 13, 3)


def test_substring_dedup_straddles_window_boundary(spark):
    """The case fixed-window segment_dedup misses: the duplicated span
    sits at DIFFERENT offsets in the two docs, so no fixed window
    alignment matches — the sliding grams still catch it."""
    span = " ".join(f"s{i}" for i in range(9))
    docs = [
        (1, "a b c " + span + " tail1"),
        (2, span + " completely different suffix here"),
    ]
    out = _clean(spark, docs, gram_tokens=8, min_count=2)
    assert out[1][0] == "a b c tail1"
    assert out[2][0] == "completely different suffix here"
    # contrast: segment_dedup at the same granularity keeps both copies
    from bubbles.operators.text import segment_dedup

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    seg = {
        r["doc_id"]: r["text_clean"]
        for r in segment_dedup(df, min_docs=2, tokens_per_segment=8).collect()
    }
    assert "s0" in seg[1] and "s0" in seg[2]  # offset misalignment survives


def test_substring_dedup_within_doc_repetition(spark):
    """min_count counts TOTAL occurrences: a doc repeating its own
    8-gram loses both copies (Lee et al. count within-doc repeats)."""
    g = " ".join(f"r{i}" for i in range(8))
    out = _clean(spark, [(1, f"start {g} mid {g} end")], gram_tokens=8, min_count=2)
    assert out[1][0] == "start mid end"


def test_substring_dedup_short_docs_untouched(spark):
    out = _clean(
        spark,
        [(1, "a b c"), (2, "a b c"), (3, "")],
        gram_tokens=8,
        min_count=2,
    )
    # identical docs, but shorter than one gram: nothing to flag
    assert out[1][0] == "a b c" and out[2][0] == "a b c"
    assert out[3][2] >= 0  # empty doc survives with a row


def test_substring_dedup_fully_removed_doc(spark):
    t = " ".join(f"w{i}" for i in range(8))
    out = _clean(spark, [(1, t), (2, t)], gram_tokens=8, min_count=2)
    assert out[1] == ("", 8, 0) and out[2] == ("", 8, 0)


def test_substring_dedup_validation(spark):
    from bubbles.operators.text import substring_dedup

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        substring_dedup(df, gram_tokens=0)
    with pytest.raises(ValueError):
        substring_dedup(df, min_count=1)


# ------------------------------------------------------------ collocations


def test_collocations_planted_pair_ranks_first(spark):
    """'san francisco' always co-occurs (lift = N/c) while 'the the'
    pairs are chance-level (lift ~ 1): the planted collocation must
    rank first with the exact integer lift."""
    from bubbles.operators.text import collocations

    rows = [(i, "the cat sat on the mat san francisco") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = collocations(df, min_count=5, top_k=10).collect()
    got = {r["ab"]: r for r in out}
    # perfectly-collocated unique pairs: lift = 1e6*10*80/(10*10) = 8e6
    sf = got["san francisco"]
    assert sf["lift_micro"] == 8_000_000
    assert sf["cab"] == 10 and sf["ca"] == 10 and sf["cb"] == 10
    # pairs involving the doubled word 'the' (c=20) get half the lift
    # and rank strictly below every perfectly-collocated pair
    assert got["on the"]["lift_micro"] == 4_000_000
    ranks = [r["ab"] for r in out]
    assert ranks.index("san francisco") < ranks.index("on the")


def test_collocations_min_count_prunes(spark):
    from bubbles.operators.text import collocations

    df = spark.createDataFrame(
        [(1, "rare pair here"), (2, "other words only")],
        "doc_id bigint, text string",
    )
    assert collocations(df, min_count=2, top_k=10).count() == 0


def test_collocations_validation(spark):
    from bubbles.operators.text import collocations

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        collocations(df, min_count=0)
    with _pytest.raises(ValueError):
        collocations(df, top_k=0)


# ---------------------------------------------------------------- k-core


def _brute_kcore(edges, k):
    """Reference peeling in plain Python."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, nb in adj.items() if len(nb) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return {v: len(nb) for v, nb in adj.items() if nb}


def test_k_core_matches_brute_force(spark):
    from bubbles.operators.graph import k_core

    import random

    rng = random.Random(7)
    # planted 5-clique (a 4-core) + sparse noise + a pendant chain
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(rng.randrange(5, 40), rng.randrange(5, 40)) for _ in range(60)]
    edges += [(100, 101), (101, 102), (102, 103)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for k in (2, 3, 4, 5):
        got = {
            r["vertex"]: r["core_degree"]
            for r in k_core(df, k=k).collect()
        }
        assert got == _brute_kcore(edges, k), f"k={k}"
    # the 5-clique IS the 4-core
    assert set(_brute_kcore(edges, 4)) >= set(range(5))


def test_k_core_peels_cascading_chain(spark):
    """A chain is 1-core only: k=2 must cascade-peel it entirely,
    which takes multiple rounds (each round removes only the ends)."""
    from bubbles.operators.graph import k_core

    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, "src bigint, dst bigint")
    assert k_core(df, k=2).count() == 0
    one = {r["vertex"]: r["core_degree"] for r in k_core(df, k=1).collect()}
    assert len(one) == 11 and one[0] == 1 and one[5] == 2


def test_k_core_validation(spark):
    from bubbles.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        k_core(df, k=0)


def test_k_core_deep_peel_converges_by_default(spark):
    """Round-7 fix: max_iter=None (default) iterates to the fixpoint —
    a long path peels only its two endpoints per round, which used to
    exhaust the fixed 100-round cap and raise on a legal input; an
    explicit budget still raises when exceeded."""
    from bubbles.operators.graph import k_core

    path = [(i, i + 1) for i in range(240)]  # needs ~120 rounds at k=2
    df = spark.createDataFrame(path, "src bigint, dst bigint")
    assert k_core(df, k=2).count() == 0
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(df, k=2, max_iter=5)
