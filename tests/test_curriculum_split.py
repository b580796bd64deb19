"""Semantic tests for the leakage-safe split and curriculum bucketing
(bubbles/operators/splits.py). The DuckDB twins pin cross-engine
exactness; these pin the PROPERTIES the ops exist for: near-dups never
straddle splits, and buckets order by quality."""

from __future__ import annotations

import numpy as np
import pytest

from bubbles.operators.splits import curriculum_buckets, leakage_safe_split


def _docs(spark):
    base = [
        "the cat sat on the mat and looked at the dog with great interest",
        "a quick brown fox jumps over the lazy dog near the river bank",
        "data pipelines shuffle and aggregate large relations for analytics",
        "completely unrelated text about cooking pasta with tomato sauce",
    ]
    rows = []
    did = 0
    for b in base:
        for copy in range(3):  # 3 near-identical copies per group
            rows.append((did, b + f" tail{copy}"))
            did += 1
    # singletons
    for i in range(20):
        rows.append((did, f"unique document number {i} " + "filler " * (i % 7)))
        did += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_leakage_safe_split_groups_never_straddle(spark):
    df = _docs(spark)
    out = leakage_safe_split(df).toPandas()
    assert len(out) == df.count()  # every doc assigned exactly once
    assert set(out["split"]) <= {"train", "val", "test"}
    # all members of a canonical group share one split
    per_group = out.groupby("canonical_id")["split"].nunique()
    assert (per_group == 1).all()
    # the three copies of each base text really did group together
    sizes = out.groupby("canonical_id").size()
    assert (sizes >= 3).sum() >= 4


def test_leakage_safe_split_precomputed_groups(spark):
    # a persisted dedup pass can be passed through verbatim
    df = _docs(spark)
    groups = spark.createDataFrame(
        [(int(r["doc_id"]), int(r["doc_id"]) // 2) for r in df.collect()],
        "doc_id long, canonical_id long",
    )
    out = leakage_safe_split(df, groups=groups).toPandas()
    per_group = out.groupby("canonical_id")["split"].nunique()
    assert (per_group == 1).all()


def test_curriculum_buckets_order_by_quality(spark):
    df = _docs(spark)
    out = curriculum_buckets(df, n_buckets=5).toPandas()
    assert out["bucket"].between(0, 4).all()
    # monotone: higher quality_micros can never land in a lower bucket
    o = out.sort_values(["quality_micros", "doc_id"])
    assert o["bucket"].is_monotonic_increasing or (
        np.diff(o["bucket"].to_numpy()) >= 0
    ).all()


def test_curriculum_buckets_exact_when_corpus_fits_sample(spark):
    # n <= k: the hash-rank sample IS the corpus, so thresholds are the
    # exact lower order statistics — replicate in plain python
    df = _docs(spark)
    out = curriculum_buckets(df, n_buckets=4).toPandas()
    scores = np.sort(out["quality_micros"].to_numpy())
    m = len(scores)
    thr = sorted(
        scores[(q * (m - 1)) // 1_000_000]
        for q in (250_000, 500_000, 750_000)
    )
    expect = {
        int(r["doc_id"]): int(sum(r["quality_micros"] >= t for t in thr))
        for _, r in out.iterrows()
    }
    got = dict(zip(out["doc_id"].astype(int), out["bucket"].astype(int)))
    assert got == expect


def test_curriculum_buckets_validates(spark):
    with pytest.raises(ValueError, match="n_buckets"):
        curriculum_buckets(_docs(spark), n_buckets=1)
