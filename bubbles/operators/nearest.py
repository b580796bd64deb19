"""Nearest-representative assignment (J1) and kNN joins (W1/J5).

Reference J1: ``源代码/mappers/FirstStep.java:74-102`` — per-point
linear scan of the driver-collected sample list (closure broadcast),
first strictly-smaller distance wins.

Rebuild: the samples of each subset are collapsed to ONE row holding
an ``array<struct>`` (they are bounded by τ), broadcast-hash-joined
on the subset key, and the argmin is computed by ``F.aggregate`` over
that array as a pure projection. The big side is never shuffled and
no aggregate runs at all — zero exchanges beyond the broadcast
(verified via .explain: BroadcastHashJoin + Project only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bubbles.functions.distances import distance_expr


def nearest_representative(
    points: DataFrame,
    reps: DataFrame,
    key_col: str = "subset_id",
    metric: str = "euclidean",
    features_col: str = "features",
    rep_id_col: str = "point_id",
    out_col: str = "bubble_id",
) -> DataFrame:
    """Assign each point the id of its nearest representative in the
    same key group. ``reps`` needs (key_col, rep_id_col, sample_ord,
    features). Ties keep the earlier sample ordinal (the reference's
    scan order with strict <, FirstStep.java:84-97).

    Contract: every key present in ``points`` must have reps — the
    inner join DROPS points of uncovered keys (the bulk twin raises a
    KeyError on the same condition; fit() guarantees coverage by
    construction since reps are sampled from the points).
    """
    rep_arrays = reps.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("sample_ord").alias("ord"),
                    F.col(rep_id_col).alias("rid"),
                    F.col(features_col).alias("fv"),
                )
            )
        ).alias("__samples")
    )
    feats = F.col(features_col)

    def step(acc, s):
        d = distance_expr(feats, s["fv"], metric)
        better = d < acc["d"]
        return F.struct(
            F.when(better, d).otherwise(acc["d"]).alias("d"),
            F.when(better, s["rid"]).otherwise(acc["rid"]).alias("rid"),
        )

    init = F.struct(
        F.lit(float("inf")).alias("d"), F.lit(-1).cast("long").alias("rid")
    )
    best = F.aggregate(F.col("__samples"), init, step)
    return (
        points.join(F.broadcast(rep_arrays), on=key_col)
        .withColumn("__best", best)
        .select(
            key_col,
            "point_id",
            features_col,
            F.col("__best.rid").alias(out_col),
            F.col("__best.d").alias("rep_dist"),
        )
    )


def nearest_representative_bulk(
    points: DataFrame,
    samples_by_subset: dict,
    metric: str = "euclidean",
    features_col: str = "features",
    bc_out: list | None = None,
) -> DataFrame:
    """Arrow/numpy fast path for J1 used inside fit(): the per-subset
    sample sets (driver-bounded, like the reference's closure-shipped
    sample list, Main.java:166-169) go out as a broadcast variable and
    each partition computes its argmin vectorized via mapInPandas —
    no shuffle, no per-element expression interpretation (measured
    ~100× faster than the higher-order-function projection at 60k×768).

    ``samples_by_subset``: {subset_id: (ids int64[m], mat float64[m,d])}
    with rows already in sample_ord order (ties keep the first, the
    reference's scan semantics). ``bc_out``: optional list the sample
    broadcast is appended to so an iterative caller can ``destroy()``
    it once the result is materialized — the fit loop makes one
    broadcast per iteration (hundreds of MB each at big samples) and
    without the cleanup they accumulate for the fit's lifetime.
    Contract shared with ``nearest_representative``: every subset_id
    present in ``points`` must have an entry (this path fails loudly
    with a KeyError; the column-expression path's inner join silently
    drops uncovered subsets — prefer this one when coverage is not
    guaranteed by construction).
    """
    import numpy as np
    import pandas as pd

    from bubbles.kernels.hdbscan_kernel import ROW_DISTANCES

    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(samples_by_subset)
    if bc_out is not None:
        bc_out.append(bc)
    dist_rows = ROW_DISTANCES[metric]

    # Arrow hands the kernel ~10k-row batches; with many live subsets
    # a batch splinters into per-subset slices of a FEW rows each and
    # the per-sample numpy calls stop amortizing (measured at 19.8M
    # pts / 4095 subsets: iteration-1 assignment cost 3x iteration-0's
    # despite 27x fewer flops). Coalescing batches to ~200k rows
    # before processing is a pure regrouping — per-row outputs are
    # bit-identical, row order is preserved — that makes every slice
    # ~20x larger. 200k rows x small dims ≈ tens of MB transient.
    _TARGET_ROWS = 200_000

    def _process(pdf):
            out_bubble = np.empty(len(pdf), dtype=np.int64)
            out_dist = np.empty(len(pdf), dtype=np.float64)
            # vstack over the Arrow column beats a per-row listcomp;
            # contiguous per-subset slices (one stable argsort) beat a
            # full-batch boolean mask re-scan per distinct subset
            X_all = np.vstack(pdf[features_col].to_numpy())
            subs = pdf["subset_id"].to_numpy()
            order = np.argsort(subs, kind="stable")
            sorted_subs = subs[order]
            cuts = np.flatnonzero(np.diff(sorted_subs)) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(subs)]))
            for lo, hi in zip(starts, ends):
                rows = order[lo:hi]
                ids, mat = bc.value[int(sorted_subs[lo])]
                X = X_all[rows]
                best_d = np.full(len(X), np.inf)
                best_i = np.zeros(len(X), dtype=np.int64)
                for j in range(len(ids)):
                    d = dist_rows(X, mat[j])
                    upd = d < best_d  # strict <: first sample wins ties
                    best_d[upd] = d[upd]
                    best_i[upd] = j
                out_bubble[rows] = ids[best_i]
                out_dist[rows] = best_d
            return pd.DataFrame(
                {
                    "subset_id": pdf["subset_id"],
                    "point_id": pdf["point_id"],
                    features_col: pdf[features_col],
                    "bubble_id": out_bubble,
                    "rep_dist": out_dist,
                }
            )

    def gen(it):
        buf, nbuf = [], 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            buf.append(pdf)
            nbuf += len(pdf)
            if nbuf >= _TARGET_ROWS:
                yield _process(pd.concat(buf, ignore_index=True))
                buf, nbuf = [], 0
        if buf:
            yield _process(pd.concat(buf, ignore_index=True))

    return points.select("subset_id", "point_id", features_col).mapInPandas(
        gen,
        schema=(
            f"subset_id long, point_id long, {features_col} array<double>, "
            "bubble_id long, rep_dist double"
        ),
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    metric: str = "euclidean",
    left_id: str = "point_id",
    right_id: str = "point_id",
    features_col: str = "features",
) -> DataFrame:
    """Brute-force kNN of each left row among right rows (J5 rebuild,
    ref 源代码/mappers/CoreDistanceMapper.java:57-110): broadcast
    cross join + windowed top-k. Scale path: pre-bucket with LSH and
    join on buckets before this (see operators.similarity).

    Equal ids on both sides are treated as THE SAME ITEM and excluded
    (the ANN-family self-search convention, same as lsh_topk/ivf_topk
    with queries=). For cross-dataset kNN over independent id spaces,
    disambiguate the ids first (e.g. offset one side) or a right row
    sharing a left row's id can never be returned as its neighbor."""
    from pyspark.sql import Window

    r = right.select(
        F.col(right_id).alias("__nb_id"), F.col(features_col).alias("__nb_features")
    )
    dist = distance_expr(F.col(features_col), F.col("__nb_features"), metric).alias("dist")
    pairs = (
        left.crossJoin(F.broadcast(r))
        .filter(F.col(left_id) != F.col("__nb_id"))
        .select(left_id, F.col("__nb_id").alias("neighbor_id"), dist)
    )
    w = Window.partitionBy(left_id).orderBy("dist", "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
