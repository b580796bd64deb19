"""Out-of-sample cluster assignment for a fitted MRHDBSCAN model —
score NEW points against an existing clustering without refitting.

The reference has no prediction path (its driver refits from scratch,
源代码/main/Main.java); this is the standard HDBSCAN*
``approximate_predict`` (Campello, Moulavi, Zimek, Sander — "Hierarchical
Density Estimates for Data Clustering, Visualization, and Outlier
Detection", TKDD 2015, §4.2 membership of unseen objects; popularized by
the hdbscan library's approximate_predict) re-expressed against this
engine's distance-level conventions:

* a new point x is measured against the FITTED reference set (the
  caller re-supplies the fitted features; the model persists labels,
  core distances and the cluster tree, not vectors),
* ``core_x`` mirrors the reference's fitted convention (core distance =
  (min_pts-1)-th smallest including self-0, HDBSCANStar.java) by
  augmenting x's fitted-neighbor distances with a virtual self-0,
* x would have attached to the hierarchy through its nearest fitted
  point p at the mutual-reachability level
  ``d_mr = max(d(x,p), core(p), core_x)``,
* x is a member of p's flat cluster c iff ``d_mr <= birth_level(c)``
  (clusters live on the distance interval [death_level, birth_level];
  the root's NaN birth means always-member, but the root is never a
  flat label) — otherwise x is noise (label 0). Fitted noise p (label
  0) predicts noise directly.
* ``strength`` grades membership inside the cluster's lifetime:
  1 at/below death_level (would survive to the cluster's last level),
  linearly down to 0 at birth_level, 0 for noise.

Execution shape (the 100 TB story): the reference relation is joined
once (labels + core distances + tree levels onto the fitted features),
collected into ONE numpy broadcast, and every new point is scored by a
vectorized Arrow kernel in a single ``mapInPandas`` pass — zero
shuffles, no window, no join on the new-point side, so the SAME plan
runs unchanged over a Structured Streaming source (stream scoring =
this operator on a readStream frame; test_predict pins stream==batch).
The broadcast is size-gated like every other broadcast in this repo:
beyond ``max_reference_rows`` the call refuses and tells the caller to
sample the reference (per-cluster stratified sampling keeps the
decision boundary — at billions of fitted points one does not want a
billion-row nearest-neighbor reference anyway).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PREDICT_SCHEMA = (
    "point_id long, label long, strength double, "
    "nearest_fitted_id long, mr_dist double"
)


def _make_predict_kernel(bc, min_pts: int, metric: str):
    """Arrow kernel: vectorized per-row kNN against the broadcast
    reference + the membership rule above. Ties on the nearest
    distance keep the smallest fitted id (deterministic, the repo-wide
    tie convention)."""
    import numpy as np
    import pandas as pd

    from bubbles.kernels.hdbscan_kernel import ROW_DISTANCES

    dist_rows = ROW_DISTANCES[metric]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, labels, core, birth, death = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["features"]]
            )
            out_label = np.zeros(n, dtype=np.int64)
            out_strength = np.zeros(n, dtype=np.float64)
            out_nearest = np.full(n, -1, dtype=np.int64)
            out_dmr = np.full(n, np.inf, dtype=np.float64)
            for i in range(n):
                d = dist_rows(mat, X[i])
                # nearest fitted point; distance ties keep smallest id
                j = np.lexsort((ids, d))[0]
                out_nearest[i] = ids[j]
                # core_x: (min_pts-1)-th smallest including a virtual
                # self-0 — the fitted convention applied to x
                if min_pts <= 1:
                    core_x = 0.0
                elif min_pts - 1 <= d.shape[0]:
                    core_x = float(np.partition(d, min_pts - 2)[min_pts - 2])
                else:
                    core_x = float(d.max(initial=0.0))
                d_mr = max(float(d[j]), float(core[j]), core_x)
                out_dmr[i] = d_mr
                lbl = int(labels[j])
                if lbl == 0:
                    continue  # nearest fitted point is noise
                b, dth = float(birth[j]), float(death[j])
                member = np.isnan(b) or d_mr <= b
                if not member:
                    continue
                out_label[i] = lbl
                if np.isnan(b) or np.isnan(dth) or b <= dth:
                    out_strength[i] = 1.0
                else:
                    out_strength[i] = float(
                        np.clip((b - d_mr) / (b - dth), 0.0, 1.0)
                    )
            yield pd.DataFrame(
                {
                    "point_id": pdf["point_id"].astype(np.int64),
                    "label": out_label,
                    "strength": np.round(out_strength, 9),
                    "nearest_fitted_id": out_nearest,
                    "mr_dist": out_dmr,
                }
            )

    return kernel


def approximate_predict(
    model,
    fitted_points: DataFrame,
    new_points: DataFrame,
    min_pts: int = 4,
    metric: str = "euclidean",
    features_col: str = "features",
    max_reference_rows: int = 500_000,
) -> DataFrame:
    """(point_id, label, strength, nearest_fitted_id, mr_dist) for
    every row of ``new_points`` — see the module docstring for the
    membership semantics.

    ``fitted_points`` must be (point_id, features) of the data the
    model was fitted on (or a sample of it; see below) and ``min_pts``
    / ``metric`` must match the fit's parameters — the model relations
    carry neither vectors nor hyper-parameters, so the caller
    re-supplies them (same contract as scikit-style transformers that
    require X at predict time for neighbor searches).

    Scale contract: the joined reference (features + label + core +
    tree levels) is a single broadcast. Past ``max_reference_rows``
    the call raises — sample the fitted set per cluster instead (a
    stratified sample keeps every decision boundary; prediction
    against a sample is still approximate_predict, just coarser).
    """
    if metric not in ("euclidean", "manhattan", "chebyshev", "cosine", "pearson"):
        raise ValueError(f"unknown metric {metric!r}")
    import numpy as np

    spark = new_points.sparkSession

    tree = model.cluster_tree.select("label", "birth_level", "death_level")
    ref = (
        fitted_points.select("point_id", F.col(features_col).alias("features"))
        .join(model.labels, on="point_id")
        .join(
            model.outlier_scores.select("point_id", "core_distance"),
            on="point_id",
        )
        .join(tree, on="label", how="left")  # noise has no tree row
        .select(
            "point_id", "features", "label", "core_distance",
            "birth_level", "death_level",
        )
    )
    rows = ref.limit(max_reference_rows + 1).collect()
    if len(rows) > max_reference_rows:
        raise ValueError(
            f"prediction reference exceeds max_reference_rows="
            f"{max_reference_rows}; pass a per-cluster sample of the "
            f"fitted points instead (stratified by model.labels)"
        )
    if not rows:
        raise ValueError(
            "empty prediction reference: fitted_points shares no "
            "point_id with model.labels"
        )
    ids = np.array([r["point_id"] for r in rows], dtype=np.int64)
    mat = np.array(
        [np.asarray(r["features"], dtype=np.float64) for r in rows]
    )
    labels = np.array([r["label"] for r in rows], dtype=np.int64)
    core = np.array([r["core_distance"] for r in rows], dtype=np.float64)
    birth = np.array(
        [np.nan if r["birth_level"] is None else r["birth_level"] for r in rows],
        dtype=np.float64,
    )
    death = np.array(
        [np.nan if r["death_level"] is None else r["death_level"] for r in rows],
        dtype=np.float64,
    )
    bc = spark.sparkContext.broadcast((ids, mat, labels, core, birth, death))

    staged = new_points.select(
        F.col("point_id").cast("long").alias("point_id"),
        F.col(features_col).cast("array<double>").alias("features"),
    )
    return staged.mapInPandas(
        _make_predict_kernel(bc, min_pts, metric), schema=_PREDICT_SCHEMA
    )
