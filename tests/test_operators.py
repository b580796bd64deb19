"""Operator-level tests: sampling (X1), nearest assignment (J1),
bubble aggregation (A2), edge relations (A4/A5/P6/P7), connected
components (X6), kNN join (W1/J5), sources (S2/S5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bubbles.operators.bubble_agg import bubble_aggregate
from bubbles.operators.components import connected_components
from bubbles.operators.edges import (
    adjacency,
    max_edge_per_key,
    remove_edges,
    tied_edges,
)
from bubbles.operators.nearest import knn_join, nearest_representative
from bubbles.operators.sampling import stratified_sample_exact


@pytest.fixture(scope="module")
def points_df(spark):
    rows = [(i, [float(i % 7), float(i % 11)], i % 3) for i in range(200)]
    return spark.createDataFrame(
        rows, schema="point_id long, features array<double>, subset_id long"
    )


def test_stratified_sample_exact_counts(spark, points_df):
    out = stratified_sample_exact(points_df, "subset_id", 0.1).toPandas()
    sizes = points_df.groupBy("subset_id").count().toPandas()
    for _, row in sizes.iterrows():
        expect = max(2, int(np.ceil(row["count"] * 0.1)))
        got = (out["subset_id"] == row["subset_id"]).sum()
        assert got == expect
    # deterministic across invocations
    out2 = stratified_sample_exact(points_df, "subset_id", 0.1).toPandas()
    assert sorted(out["point_id"]) == sorted(out2["point_id"])
    # ordinals are dense 0..k-1 per key
    for s, grp in out.groupby("subset_id"):
        assert sorted(grp["sample_ord"]) == list(range(len(grp)))


def test_stratified_sample_max_per_key(spark, points_df):
    out = stratified_sample_exact(
        points_df, "subset_id", 0.5, max_per_key=5
    ).toPandas()
    assert out.groupby("subset_id").size().max() <= 5


def test_stratified_sample_ratio_floor_scales_with_key_size(spark):
    # the fit() scale rule: keys large enough that ceil(n*fraction)
    # overshoots max_per_key still fan out at >= n*min_ratio samples,
    # while small keys are untouched by the floor (inert below
    # max_per_key / min_ratio points)
    rows = [(0, i) for i in range(20_000)] + [(1, 100_000 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "subset_id long, point_id long")
    out = (
        stratified_sample_exact(
            df,
            "subset_id",
            0.05,
            max_per_key=16,
            min_ratio=2.0 / 1024,
            ratio_cap=1024,
        )
        .groupBy("subset_id")
        .count()
        .toPandas()
        .set_index("subset_id")["count"]
    )
    # big key: floor min(ceil(20000*2/1024), 1024) = 40 > cap 16
    assert out[0] == 40
    # small key: ceil(40*0.05)=2 within cap; floor ceil(40*2/1024)=1 inert
    assert out[1] == 2
    # without the floor the cap wins
    capped = (
        stratified_sample_exact(df, "subset_id", 0.05, max_per_key=16)
        .groupBy("subset_id")
        .count()
        .toPandas()
        .set_index("subset_id")["count"]
    )
    assert capped[0] == 16


def test_nearest_representative_argmin(spark, points_df):
    reps = stratified_sample_exact(points_df, "subset_id", 0.05)
    out = nearest_representative(points_df, reps).toPandas()
    assert len(out) == 200
    # verify argmin against numpy per subset
    pts = points_df.toPandas()
    rp = reps.toPandas()
    for s in [0, 1, 2]:
        P = pts[pts.subset_id == s]
        R = rp[rp.subset_id == s].sort_values("sample_ord")
        rmat = np.array(R["features"].tolist())
        for _, p in P.head(10).iterrows():
            d = np.linalg.norm(rmat - np.array(p["features"]), axis=1)
            want = R.iloc[int(np.argmin(d))]["point_id"]
            got = out[out.point_id == p["point_id"]]["bubble_id"].iloc[0]
            assert got == want


def test_bubble_aggregate_stats(spark, points_df):
    reps = stratified_sample_exact(points_df, "subset_id", 0.05)
    assigned = nearest_representative(points_df, reps)
    bub = bubble_aggregate(assigned, dim=2).toPandas()
    # n sums to the dataset size
    assert bub["n"].sum() == 200
    # rep == ls/n elementwise; extent >= 0
    for _, r in bub.iterrows():
        np.testing.assert_allclose(
            np.array(r["rep"]), np.array(r["ls"]) / r["n"], rtol=1e-12
        )
        assert r["extent"] >= 0
        if r["n"] > 1:
            assert r["nn_dist"] == pytest.approx(
                (1.0 / r["n"]) ** 0.5 * r["extent"], rel=1e-12
            )


@pytest.fixture(scope="module")
def edges_df(spark):
    rows = [
        (0, 1, 1.0, 10),
        (1, 2, 3.0, 10),
        (2, 3, 2.0, 10),
        (5, 6, 3.0, 20),
        (6, 7, 0.5, 20),
    ]
    return spark.createDataFrame(
        rows, schema="src long, dst long, weight double, subset_id long"
    )


def test_adjacency(spark, edges_df):
    adj = {r["vertex"]: r["neighbors"] for r in adjacency(edges_df).collect()}
    assert adj[1] == [0, 2]
    assert adj[6] == [5, 7]


def test_max_edge_and_tied_and_remove(spark, edges_df):
    mx = max_edge_per_key(edges_df).toPandas().set_index("subset_id")
    assert mx.loc[10, "weight"] == 3.0
    assert mx.loc[20, "weight"] == 3.0
    tied = tied_edges(edges_df, max_edge_per_key(edges_df)).toPandas()
    assert len(tied) == 2  # both weight-3 edges tie the max
    remaining = remove_edges(
        edges_df, spark.createDataFrame([(1, 2)], "src long, dst long")
    ).toPandas()
    assert len(remaining) == 4
    assert not ((remaining.src == 1) & (remaining.dst == 2)).any()


def test_connected_components_two_comps(spark, edges_df):
    cc = connected_components(edges_df.select("src", "dst")).toPandas()
    comp = dict(zip(cc.vertex, cc.component))
    assert comp[0] == comp[1] == comp[2] == comp[3] == 0
    assert comp[5] == comp[6] == comp[7] == 5


def test_connected_components_long_path(spark):
    # pointer jumping must handle a path graph quickly
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    cc = connected_components(edges).toPandas()
    assert cc.component.nunique() == 1
    assert len(cc) == n


def test_knn_join(spark):
    rows = [(i, [float(i)]) for i in range(10)]
    df = spark.createDataFrame(rows, "point_id long, features array<double>")
    out = knn_join(df, df, k=2).toPandas()
    mine = out[out.point_id == 5].sort_values("rank")
    assert set(mine["neighbor_id"]) == {4, 6}
    assert (out.groupby("point_id").size() == 2).all()


def test_read_points_text(spark, tmp_path):
    from bubbles.sources.points import read_points_text

    p = tmp_path / "pts.txt"
    p.write_text("1.0 2.0 3.0\n4.0 5.0 6.0\n\n7.0 8.0 9.0\n")
    df = read_points_text(spark, str(p)).toPandas()
    assert len(df) == 3  # blank line skipped
    assert df["point_id"].nunique() == 3  # B4 fixed: unique ids
    feats = sorted([list(map(float, f)) for f in df["features"]])
    assert feats[0] == [1.0, 2.0, 3.0]


def test_output_writers(spark, tmp_path):
    from bubbles import MRHDBSCAN
    from bubbles.sources.points import (
        write_cluster_tree,
        write_flat_partition,
        write_outlier_scores,
    )
    from tests.test_kernel import blobs

    X, _ = blobs(seed=2, n=60, centers=2, spread=15.0)
    df = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(X)],
        "point_id long, features array<double>",
    )
    model = MRHDBSCAN(min_pts=4, min_cluster_size=4).fit(df)
    write_flat_partition(model.labels, str(tmp_path / "flat"))
    write_cluster_tree(model.cluster_tree, str(tmp_path / "tree"))
    write_outlier_scores(model.outlier_scores, str(tmp_path / "scores"))
    flat = spark.read.option("header", True).csv(str(tmp_path / "flat"))
    assert flat.count() == 60


def test_cli_writes_hierarchy_csv(spark, tmp_path):
    """python -m bubbles end-to-end on an Iris-sized text input: the
    reference's primary documented output (<scale>,<label_1..n> lines,
    Main.java:556-565) lands as <out>/hierarchy, and compact=true
    writes the birth-levels-only variant as <out>/compact_hierarchy."""
    import glob

    from bubbles.__main__ import main
    from tests.test_kernel import blobs

    X, _ = blobs(seed=5, n=150, centers=3, spread=15.0)
    p = tmp_path / "iris_like.txt"
    p.write_text("\n".join(" ".join(f"{v:.6f}" for v in row) for row in X))

    def read_lines(d):
        files = glob.glob(f"{d}/part-*")
        assert files, f"no output under {d}"
        return [
            ln
            for f in files
            for ln in open(f).read().splitlines()
            if ln.strip()
        ]

    out_full = tmp_path / "out_full"
    main([f"file={p}", "minPts=4", "minClSize=4", f"out={out_full}",
          "master=local[4]"])
    full = read_lines(out_full / "hierarchy")
    # each line: scale + one label per object, scales strictly descending
    scales = []
    for ln in full:
        cells = ln.split(",")
        assert len(cells) == 1 + 150
        scales.append(float(cells[0]))
        assert all(c.lstrip("-").isdigit() for c in cells[1:])
    assert scales == sorted(scales, reverse=True)

    # auxiliary .vis (HDBSCANStar.java:470-489): "1" = full hierarchy,
    # then the hierarchy file's line count
    vis = (out_full / "visualization.vis").read_text().splitlines()
    assert vis == ["1", str(len(full))]

    out_c = tmp_path / "out_compact"
    main([f"file={p}", "minPts=4", "minClSize=4", f"out={out_c}",
          "compact=true", "master=local[4]"])
    compact = read_lines(out_c / "compact_hierarchy")
    assert 0 < len(compact) <= len(full)
    # compact levels are a subset of full levels
    fs = {ln.split(",")[0] for ln in full}
    assert {ln.split(",")[0] for ln in compact} <= fs
    vis_c = (out_c / "visualization.vis").read_text().splitlines()
    assert vis_c == ["0", str(len(compact))]


def test_asof_join_backward(spark):
    from bubbles.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 20, 50)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(10, 90, 1.0), (10, 205, 2.0), (10, 300, 3.0), (20, 60, 9.0)],
        "user_id long, ts long, v double",
    )
    out = (
        asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
        .toPandas()
        .set_index("event_id")
    )
    assert out.loc[1, "v_right"] == 1.0  # 90 <= 100
    assert out.loc[2, "v_right"] == 2.0  # exact tie 205 matches
    assert np.isnan(out.loc[3, "v_right"])  # no prior right row (60 > 50)


def test_stratified_sample_matches_plain_window_rank(spark):
    # the salted two-phase sampler must select the SAME rows and
    # ordinals as a plain per-key rank over (xxhash64(id, seed), id)
    # — including the single-key case (iteration 0 of fit holds the
    # whole dataset under one key)
    import random

    from pyspark.sql import Window

    from bubbles.operators.sampling import stratified_sample_exact

    random.seed(5)
    rows = [(i, random.randrange(4), float(i)) for i in range(5000)]
    df = spark.createDataFrame(rows, "point_id long, subset_id long, payload double")

    def plain(d, fraction, max_per_key=None, seed=42):
        w = Window.partitionBy("subset_id").orderBy(
            F.xxhash64(F.col("point_id"), F.lit(seed)), "point_id"
        )
        n_keep = F.greatest(
            F.lit(2),
            F.ceil(F.count("*").over(Window.partitionBy("subset_id")) * F.lit(fraction)),
        )
        if max_per_key is not None:
            n_keep = F.least(n_keep, F.lit(max_per_key))
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .withColumn("__keep", n_keep)
            .filter(F.col("__rn") <= F.col("__keep"))
            .withColumn("sample_ord", F.col("__rn") - 1)
            .drop("__rn", "__keep")
        )

    cases = [
        (df, 0.03, None),
        (df, 0.5, 50),
        (df.withColumn("subset_id", F.lit(0)), 0.05, 100),
    ]
    for d, frac, cap in cases:
        want = sorted(
            map(tuple, plain(d, frac, cap).select(
                "subset_id", "point_id", "sample_ord", "payload").collect())
        )
        got = sorted(
            map(tuple, stratified_sample_exact(
                d, "subset_id", frac, max_per_key=cap).select(
                "subset_id", "point_id", "sample_ord", "payload").collect())
        )
        assert got == want
