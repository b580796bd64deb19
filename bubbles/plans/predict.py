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
  caller re-supplies the fitted features, or the model carries a
  persisted prediction reference — see ``MRHDBSCANModel.save``),
* ``core_x`` is the distance to x's (min_pts-1)-th nearest fitted
  neighbor — equivalently the min_pts-th smallest of x's distance
  list after prepending a virtual self-0. This is the rule that makes
  self-prediction exact: a fitted point's distance list already
  contains its own 0, so core_x reproduces the fitted core distance
  ((min_pts-1)-th smallest including self, HDBSCANStar.java),
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


# diff-tensor budget per distance block: the blocked metrics build a
# (block × reference × dim) intermediate, so the block width adapts to
# the reference size (4096 new rows at a 1.5k×2 reference; a handful at
# a 500k×64 one — each row still vectorized over the full reference)
_BLOCK_TARGET_BYTES = 1 << 29


def _block_distances(mat, Xblk, metric: str):
    """(block × reference) distance matrix. Element-for-element the
    same operations (and reduction axis) as the per-row numpy twins in
    ``bubbles.kernels.hdbscan_kernel.ROW_DISTANCES``, batched over the
    block axis — the subtract-based metrics are bit-identical to the
    per-row path (no ||a||²-2ab+||b||² shortcut, which loses precision
    exactly where it matters: a fitted point's own distance must be an
    exact 0 for the self-predict tie rule)."""
    import numpy as np

    if metric == "euclidean":
        d = Xblk[:, None, :] - mat[None, :, :]
        return np.sqrt(np.einsum("bmj,bmj->bm", d, d))
    if metric == "manhattan":
        return np.abs(Xblk[:, None, :] - mat[None, :, :]).sum(axis=2)
    if metric == "chebyshev":
        return np.abs(Xblk[:, None, :] - mat[None, :, :]).max(axis=2)
    if metric == "cosine":
        num = Xblk @ mat.T
        den = (
            np.sqrt(np.einsum("bj,bj->b", Xblk, Xblk))[:, None]
            * np.sqrt(np.einsum("mj,mj->m", mat, mat))[None, :]
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            out = 1.0 - num / den
        return np.where(den == 0, 1.0, out)
    if metric == "pearson":
        Xc = Xblk - Xblk.mean(axis=1, keepdims=True)
        Mc = mat - mat.mean(axis=1, keepdims=True)
        num = Xc @ Mc.T
        den = (
            np.sqrt(np.einsum("bj,bj->b", Xc, Xc))[:, None]
            * np.sqrt(np.einsum("mj,mj->m", Mc, Mc))[None, :]
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            out = 1.0 - num / den
        return np.where(den == 0, 1.0, out)
    raise ValueError(f"unknown metric {metric!r}")


def _make_predict_kernel(bc, min_pts: int, metric: str):
    """Arrow kernel: chunked block-distance kNN against the broadcast
    reference + the membership rule above — no per-row Python loop
    (one numpy pass per ≤4k-row block) and no sort on the reference
    axis (nearest + tie-break is an O(m) masked argmin; core_x is an
    O(m) partition). Ties on the nearest distance keep the smallest
    fitted id (deterministic, the repo-wide tie convention)."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, labels, core, birth, death = bc.value
        m, dim = mat.shape
        blk = max(1, min(4096, _BLOCK_TARGET_BYTES // max(1, m * dim * 8)))
        big_id = np.iinfo(np.int64).max
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
            for s in range(0, n, blk):
                e = min(n, s + blk)
                D = _block_distances(mat, X[s:e], metric)
                rows = np.arange(e - s)
                # nearest fitted point; exact distance ties keep the
                # smallest id: mask the tie columns with their ids and
                # argmin those (O(m), replaces a full per-row lexsort)
                dmin = D.min(axis=1)
                idsel = np.where(D == dmin[:, None], ids[None, :], big_id)
                j = idsel.argmin(axis=1)
                out_nearest[s:e] = ids[j]
                # core_x: the (min_pts-1)-th nearest fitted neighbor —
                # i.e. the min_pts-th smallest after prepending a
                # virtual self-0 — so self-predicting a fitted point
                # reproduces its fitted core distance
                if min_pts <= 1:
                    core_x = np.zeros(e - s)
                elif min_pts - 1 <= m:
                    core_x = np.partition(D, min_pts - 2, axis=1)[
                        :, min_pts - 2
                    ]
                else:
                    core_x = D.max(axis=1)
                d_mr = np.maximum(np.maximum(D[rows, j], core[j]), core_x)
                out_dmr[s:e] = d_mr
                lbl = labels[j]
                b, dth = birth[j], death[j]
                # member iff the nearest fitted point is clustered and
                # d_mr is inside the cluster's lifetime (NaN birth =
                # always-member); noise (label 0) scores strength 0
                member = (lbl != 0) & (np.isnan(b) | (d_mr <= b))
                out_label[s:e] = np.where(member, lbl, 0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    frac = np.clip((b - d_mr) / (b - dth), 0.0, 1.0)
                full_strength = np.isnan(b) | np.isnan(dth) | (b <= dth)
                out_strength[s:e] = np.where(
                    member, np.where(full_strength, 1.0, frac), 0.0
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


def reference_frame(
    model, fitted_points: DataFrame, features_col: str = "features"
) -> DataFrame:
    """Join the fitted features with everything the membership rule
    needs: (point_id, features, label, core_distance, birth_level,
    death_level). Distributed — this is also what
    ``MRHDBSCANModel.save`` persists (sampled) as the model's
    prediction reference."""
    tree = model.cluster_tree.select("label", "birth_level", "death_level")
    return (
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


def approximate_predict(
    model,
    fitted_points: DataFrame | None,
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
    model was fitted on (or a sample of it; see below), and ``min_pts``
    / ``metric`` must match the fit's parameters. Pass
    ``fitted_points=None`` to score against the model's PERSISTED
    prediction reference instead (``MRHDBSCANModel.save(...,
    fitted_points=...)`` + ``load`` — the deploy-a-model workflow:
    fit offline, save, predict online with no training data on hand).

    Scale contract: the joined reference (features + label + core +
    tree levels) is a single broadcast. Past ``max_reference_rows``
    the call raises — sample the fitted set per cluster instead (a
    stratified sample keeps every decision boundary; prediction
    against a sample is still approximate_predict, just coarser).

    Broadcast lifetime: the reference broadcast cannot be destroyed
    eagerly (the returned plan is lazy and may be a streaming source),
    so it lives until the SparkContext ends. Callers that re-score in
    a loop (notebooks, plan audits) can reclaim executor/driver memory
    once a result is fully consumed via the handle attached to the
    returned DataFrame: ``result._reference_broadcast.unpersist()``.
    """
    if metric not in ("euclidean", "manhattan", "chebyshev", "cosine", "pearson"):
        raise ValueError(f"unknown metric {metric!r}")
    import numpy as np

    spark = new_points.sparkSession

    if fitted_points is None:
        ref = getattr(model, "_predict_reference", None)
        if ref is None:
            raise ValueError(
                "no prediction reference: pass fitted_points, or persist "
                "one with MRHDBSCANModel.save(path, fitted_points=...) "
                "and load the model from there"
            )
    else:
        ref = reference_frame(model, fitted_points, features_col)
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
    out = staged.mapInPandas(
        _make_predict_kernel(bc, min_pts, metric), schema=_PREDICT_SCHEMA
    )
    # expose the broadcast so long-lived sessions can unpersist it once
    # the result is consumed (see the docstring's lifetime note)
    out._reference_broadcast = bc
    return out
