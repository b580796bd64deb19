"""End-to-end MRHDBSCAN estimator tests (SURVEY.md §5 item 2):
distributed pipeline must EQUAL the exact kernel when τ ≥ n
(single-subset degenerate case) and approximate it (high ARI) when
recursion kicks in."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bubbles import MRHDBSCAN
from bubbles.kernels.hdbscan_kernel import hdbscan_exact
from tests.test_kernel import ari, blobs


def to_df(spark, X, ids=None):
    ids = ids if ids is not None else np.arange(len(X))
    return spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, X)],
        schema="point_id long, features array<double>",
    )


@pytest.fixture(scope="module")
def blob_data():
    return blobs(seed=42, n=400, d=4, centers=3, spread=20.0)


def test_fit_exact_path_matches_kernel(spark, blob_data):
    X, y = blob_data
    df = to_df(spark, X)
    model = MRHDBSCAN(min_pts=4, min_cluster_size=4, max_local_size=1000).fit(df)
    got = model.labels.orderBy("point_id").toPandas()
    exact = hdbscan_exact(X, min_pts=4, min_cluster_size=4)
    assert model.n_iterations == 0
    # identical edge set → identical hierarchy → identical labels
    assert np.array_equal(got["label"].to_numpy(), exact.labels)
    assert ari(got["label"].to_numpy(), y) == pytest.approx(1.0)
    # MST matches the kernel's edge multiset
    mst = model.mst_edges.toPandas()
    assert np.allclose(np.sort(mst["weight"]), np.sort(exact.mst[2]))


def test_fit_recursive_path_high_ari(spark, blob_data):
    X, y = blob_data
    df = to_df(spark, X)
    model = MRHDBSCAN(
        min_pts=4, min_cluster_size=8, max_local_size=60, sample_fraction=0.2, seed=7
    ).fit(df)
    got = model.labels.orderBy("point_id").toPandas()
    assert model.n_iterations >= 1
    assert len(got) == len(X)
    a = ari(got["label"].to_numpy(), y)
    assert a > 0.9, f"recursive ARI too low: {a}"


def test_fit_outputs_contract(spark, blob_data):
    X, y = blob_data
    model = MRHDBSCAN(min_pts=4, min_cluster_size=4, max_local_size=1000).fit(
        to_df(spark, X)
    )
    tree = model.cluster_tree.toPandas()
    assert set(tree.columns) == {
        "label",
        "parent",
        "birth_level",
        "death_level",
        "stability",
        "n_points",
    }
    assert (tree["label"] == 1).sum() == 1  # root present
    scores = model.outlier_scores.toPandas()
    assert len(scores) == len(X)
    assert scores["score"].between(-10, 1.0001).all()


def test_fit_stalled_subset_terminates(spark):
    # pathological: all points identical → local model can never split;
    # the stall guard must fall back to the exact path and terminate
    X = np.zeros((150, 3))
    X[:75] += 100.0  # two identical-point piles
    df = to_df(spark, X)
    model = MRHDBSCAN(min_pts=4, min_cluster_size=4, max_local_size=50).fit(df)
    got = model.labels.orderBy("point_id").toPandas()
    assert len(got) == 150
    assert ari(got["label"].to_numpy(), np.repeat([0, 1], 75)) == pytest.approx(1.0)


def test_fit_gauss_mixture_quality(spark):
    # paper-protocol quality gate (BASELINE.md): Gauss1-style 10-D,
    # 20-cluster mixture through the recursive path; the paper's DB
    # variant scores 0.864 — we require >= 0.85 at test scale
    import sys

    sys.path.insert(0, ".")
    from tools.quality import gauss_mixture

    X, y = gauss_mixture(12000)
    df = to_df(spark, X)
    from bubbles import MRHDBSCAN

    model = MRHDBSCAN(
        min_pts=4,
        min_cluster_size=20,
        sample_fraction=0.1,
        max_local_size=2048,
        seed=42,
    ).fit(df)
    labels = model.labels.orderBy("point_id").toPandas()["label"].to_numpy()
    assert model.n_iterations >= 1
    score = ari(labels, y)
    assert score >= 0.85, f"ARI {score} below paper DB-variant level"


def test_fit_deterministic(spark, blob_data):
    # FIXTURES.md §7: seeded fit is reproducible run-to-run
    X, _ = blob_data
    df = to_df(spark, X)
    est = MRHDBSCAN(min_pts=4, min_cluster_size=8, max_local_size=60, seed=7)
    a = est.fit(df).labels.orderBy("point_id").toPandas()
    b = est.fit(df).labels.orderBy("point_id").toPandas()
    assert (a["label"].to_numpy() == b["label"].to_numpy()).all()


def test_model_hierarchy_levels(spark, blob_data):
    X, _ = blob_data
    model = MRHDBSCAN(min_pts=4, min_cluster_size=4, max_local_size=1000).fit(
        to_df(spark, X)
    )
    h = model.hierarchy_levels().toPandas()
    assert set(h.columns) == {"level_weight", "point_id", "label"}
    assert h["point_id"].nunique() == len(X)
    # levels descend
    ws = sorted(h["level_weight"].unique(), reverse=True)
    assert ws[0] > ws[-1]


def test_model_hierarchy_levels_full_vs_compact(spark, blob_data):
    X, _ = blob_data
    model = MRHDBSCAN(min_pts=4, min_cluster_size=4, max_local_size=1000).fit(
        to_df(spark, X)
    )
    compact = model.hierarchy_levels().toPandas()
    full = model.hierarchy_levels(full=True).toPandas()
    cw = set(compact["level_weight"].unique())
    fw = set(full["level_weight"].unique())
    # full = compact birth levels plus every noise level
    assert cw <= fw
    assert len(fw) > len(cw)
    # on shared levels the label matrices agree exactly
    key = ["level_weight", "point_id"]
    shared = full[full["level_weight"].isin(cw)].sort_values(key).reset_index(drop=True)
    comp = compact.sort_values(key).reset_index(drop=True)
    assert shared.equals(comp)
    # at the very bottom full level, any point with a positive noise
    # level has gone noise (label 0) at some full-only level
    scores = model.outlier_scores.toPandas()
    noisy = scores[scores["score"] > 0]
    if len(noisy):
        zero_labels = full[full["label"] == 0]
        assert zero_labels["point_id"].nunique() >= noisy["point_id"].nunique() // 2


def test_fit_degenerate_inputs(spark):
    """Empty / single-point / tiny inputs produce well-formed models
    instead of KeyError/IndexError (r5 bugs): empty labels frame for
    an empty corpus, all-noise for sub-min_cluster_size inputs. A
    2-point corpus with min_pts=4 gets inf core distances and the
    reference-faithful GLOSH inf/inf = NaN score (HDBSCANStar.java
    division semantics), so scores are not asserted there."""
    from bubbles import MRHDBSCAN

    def fit_rows(rows):
        df = spark.createDataFrame(rows, "point_id long, features array<double>")
        return MRHDBSCAN(min_pts=4, min_cluster_size=4, dim=2).fit(df)

    m = fit_rows([])
    assert m.labels.count() == 0
    assert m.outlier_scores.count() == 0
    assert m.cluster_tree.count() == 0

    m = fit_rows([(0, [1.0, 2.0])])
    p = m.labels.toPandas()
    assert list(p.point_id) == [0] and list(p.label) == [0]  # noise
    assert m.outlier_scores.toPandas().score.notna().all()

    m = fit_rows([(i, [1.0, 2.0]) for i in range(50)])
    p = m.labels.toPandas()
    assert len(p) == 50 and set(p.label) == {0}  # identical: all noise


def test_lpt_placement_helpers(spark):
    """The driver-side Murmur3 twin matches Spark's F.hash AND actual
    repartition placement; LPT respects capacity monotonicity."""
    from pyspark.sql import functions as F

    from bubbles.plans.mrhdbscan import (
        _lpt_bins,
        _murmur3_32_long,
        _partition_reps,
    )

    vals = [0, 1, 7, 42, 476, -1, -987654321, 2**62, 123456789012345]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    assert all(_murmur3_32_long(r.v) == r.h for r in rows)

    # placement: every row of a repartition(n, col) lands where the
    # driver predicted
    df = spark.createDataFrame([(v,) for v in range(300)], "v long")
    got = (
        df.repartition(16, "v")
        .select("v", F.spark_partition_id().alias("p"))
        .collect()
    )
    assert all(_murmur3_32_long(r.v) % 16 == r.p for r in got)

    # reps: a bijection bins -> partitions
    reps = _partition_reps(16)
    assert sorted(_murmur3_32_long(r) % 16 for r in reps) == list(range(16))

    # LPT: max bin load within 4/3 + max_item of the ideal split
    weights = {i: w for i, w in enumerate([100, 90, 80, 10, 10, 5, 5, 1] * 4)}
    bins = _lpt_bins(list(weights), weights, 4)
    loads = [0.0] * 4
    for it, b in bins.items():
        loads[b] += weights[it]
    ideal = sum(weights.values()) / 4
    assert max(loads) <= (4 / 3) * ideal + max(weights.values())
