"""clustering_pair_stats (bubbles/operators/metrics.py): distributed
pair-counting ARI / precision / recall vs a plain-python reference."""

from __future__ import annotations

from itertools import combinations

import pytest

from bubbles.operators.metrics import clustering_pair_stats


def _ref(a, b):
    """Brute-force pair counting over all C(n,2) pairs."""
    idx = range(len(a))
    same_both = same_a = same_b = 0
    for i, j in combinations(idx, 2):
        ea, eb = a[i] == a[j], b[i] == b[j]
        same_a += ea
        same_b += eb
        same_both += ea and eb
    n_pairs = len(a) * (len(a) - 1) // 2
    exp = same_a * same_b / n_pairs
    den = (same_a + same_b) / 2 - exp
    ari = (same_both - exp) / den if den else None
    return same_both, same_a, same_b, n_pairs, ari


def _stats(spark, a, b):
    df = spark.createDataFrame(
        list(zip(a, b)), "label_a long, label_b long"
    )
    return clustering_pair_stats(df).collect()[0]


def test_pair_stats_match_bruteforce(spark):
    a = [1, 1, 1, 2, 2, 3, 3, 3, 3, 4]
    b = [7, 7, 2, 2, 2, 5, 5, 6, 6, 6]
    r = _stats(spark, a, b)
    sb, sa_, sb_, np_, ari = _ref(a, b)
    assert (r["same_both"], r["same_a"], r["same_b"], r["n_pairs"]) == (
        sb, sa_, sb_, np_,
    )
    assert r["ari"] == pytest.approx(ari, rel=1e-12)
    assert r["pair_precision"] == pytest.approx(sb / sb_, rel=1e-12)
    assert r["pair_recall"] == pytest.approx(sb / sa_, rel=1e-12)


def test_identical_labelings_score_one(spark):
    a = [1, 1, 2, 2, 2, 3]
    r = _stats(spark, a, a)
    assert r["ari"] == 1.0
    assert r["pair_precision"] == 1.0 and r["pair_recall"] == 1.0


def test_label_renaming_invariant(spark):
    a = [1, 1, 2, 2, 2, 3, 3]
    b = [9, 9, 4, 4, 4, 1, 1]  # same partition, renamed ids
    r = _stats(spark, a, b)
    assert r["ari"] == 1.0


def test_degenerate_single_cluster_is_null(spark):
    a = [1, 1, 1]
    r = _stats(spark, a, a)
    assert r["ari"] is None  # undefined, not a fake 0/1


def test_single_row_is_null_not_divide_by_zero(spark):
    # n=1 -> n_pairs=0; under ANSI mode the expected-index division
    # must nullif through, not raise DIVIDE_BY_ZERO
    r = _stats(spark, [1], [1])
    assert r["n"] == 1 and r["n_pairs"] == 0
    assert r["ari"] is None
    assert r["pair_precision"] is None and r["pair_recall"] is None


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 2), (None, 3), (3, None)],
        "label_a long, label_b long",
    )
    r = clustering_pair_stats(df).collect()[0]
    assert r["n"] == 3
