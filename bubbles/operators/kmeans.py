"""Distributed Lloyd's k-means with exact fixed-point accumulation.

The missing "train" step in front of ``similarity.ivf_topk`` and
``dedup.semantic_dedup`` (both take one assign step against sampled
or pinned centroids): ``kmeans_fit`` iterates
assign → update ``n_iter`` times and returns the final per-point
assignment; ``kmeans_centroids`` returns the trained centroids in
the shape those operators consume.

Determinism is the hard part of distributed k-means: the centroid
update is a MEAN, and floating-point partial sums depend on partition
order, so naive implementations drift across session parallelism and
can flip the NEXT iteration's argmin.  Here the update quantizes each
coordinate to integer fixed point,

    q = floor(v * 2^20)        (one exactly-rounded multiply + floor)

accumulates int64 sums (exact, order-independent — the same
micro-unit discipline as text.quality_micros), and dequantizes once
on the driver with the pinned division sequence
``float(sum) / n / 1048576.0``.  Every engine that replays those ops
gets bit-identical centroids, which is what makes the unrolled DuckDB
oracle twin possible at all.

Execution shape (per iteration): one columnar scan →
assignment mapInPandas (broadcast centroids, numpy argmin, ties break
toward the smallest centroid ordinal — same convention as
``_ivf_assign_probe``) which ALSO emits per-batch integer partial
sums (combine-in-mapper: k×dim rows per batch, not one row per
point) → a k×dim-key aggregation → a bounded driver collect
(k×dim rows).  No shuffle of the corpus itself, ever; the only
exchange is the tiny partial-sum agg.  Building the returned plan
runs ``n_iter - 1`` bounded jobs (the iterative-algorithm pattern,
same as ``plans/mrhdbscan.fit``).  int64 partial sums hold while
n_rows·2^20·max|v| stays under 2^63 — ~10^12 unit-scale rows; pass a
smaller ``scale_bits`` beyond that.

Empty clusters keep their previous centroid (deterministic, and the
rule a LEFT JOIN + coalesce expresses in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _base_and_init(df, k, id_col, vec_col, centroid_ids, seed):
    """NULL-filtered (point_id, features) frame + initial centroid
    matrix (pinned corpus ids, or seeded hash-rank sample)."""
    import numpy as np

    from bubbles.operators.sampling import stratified_sample_exact

    df = df.filter(F.col(vec_col).isNotNull())
    base = df.select(
        F.col(id_col).alias("point_id"),
        F.col(vec_col).cast("array<double>").alias("features"),
        F.lit(0).alias("subset_id"),
    )
    if centroid_ids is not None:
        ord_of = {int(p): i for i, p in enumerate(centroid_ids)}
        crows = sorted(
            base.filter(F.col("point_id").isin([int(x) for x in centroid_ids]))
            .select("point_id", "features")
            .collect(),
            key=lambda r: ord_of[int(r.point_id)],
        )
    else:
        cents = stratified_sample_exact(
            base, "subset_id", 0.0, seed=seed, min_per_key=k
        )
        crows = sorted(
            cents.select("sample_ord", "point_id", "features").collect(),
            key=lambda r: r.sample_ord,
        )[:k]
    if centroid_ids is not None:
        # fail fast: a missing / NULL-filtered pinned id would silently
        # shift every later cluster ordinal (the caller maps ordinal i
        # back to centroid_ids[i]), and an all-missing list would
        # assign everything to cluster 0 with distance inf
        found = {int(r.point_id) for r in crows}
        missing = [int(x) for x in centroid_ids if int(x) not in found]
        if missing:
            raise ValueError(
                f"centroid_ids not present in the corpus (or NULL-"
                f"vector-filtered): {missing[:20]}"
                + ("..." if len(missing) > 20 else "")
            )
    elif not crows:
        raise ValueError("cannot sample centroids from an empty corpus")
    cmat = np.array([r.features for r in crows], dtype=np.float64)
    return base, cmat


def _assign_of(sc, cmat_now):
    """Batch argmin over centroid ordinals, ascending, strict < (ties
    → smallest ordinal) on SQUARED euclidean distance — sqrt-free,
    same interior as kernels.hdbscan_kernel._rows_euclidean."""
    import numpy as np

    bc = sc.broadcast(cmat_now)

    def best(X: "np.ndarray") -> "np.ndarray":
        m = bc.value
        best_d = np.full(len(X), np.inf)
        best_j = np.zeros(len(X), dtype=np.int64)
        for j in range(len(m)):
            d0 = X - m[j]
            d = np.einsum("ij,ij->i", d0, d0)
            upd = d < best_d
            best_d[upd] = d[upd]
            best_j[upd] = j
        return best_j

    return best


def _train(base, cmat, n_iter, scale):
    """Run ``n_iter - 1`` exact quantized Lloyd updates; returns the
    final centroid matrix. With more than one update pass the slim
    (point_id, features) projection is cached for the duration of the
    loop (MEMORY_AND_DISK — evictable, recomputable) and unpersisted
    before returning: without it every Lloyd pass re-executes the full
    upstream lineage (source scan + cast + NULL filter), one corpus
    scan per iteration. n_iter=2 (one update) keeps the uncached
    single-pass plan."""
    import numpy as np
    import pandas as pd

    cached = False
    if n_iter > 2:
        from pyspark import StorageLevel

        base.persist(StorageLevel.MEMORY_AND_DISK)
        cached = True
    sc = base.sparkSession.sparkContext
    for _ in range(n_iter - 1):
        best = _assign_of(sc, cmat)

        def partial(it):
            dim = None
            sums: dict[int, np.ndarray] = {}
            ns: dict[int, int] = {}
            for pdf in it:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["features"].to_numpy())
                dim = X.shape[1]
                bj = best(X)
                q = np.floor(X * scale).astype(np.int64)
                for j in np.unique(bj):
                    mask = bj == j
                    s = q[mask].sum(axis=0)
                    j = int(j)
                    if j in sums:
                        sums[j] += s
                        ns[j] += int(mask.sum())
                    else:
                        sums[j] = s
                        ns[j] = int(mask.sum())
            for j, s in sums.items():
                yield pd.DataFrame(
                    {
                        "cluster": j,
                        "pos": np.arange(dim, dtype=np.int64),
                        "psum": s,
                        "pn": ns[j],
                    }
                )

        stats = (
            base.select("features")
            .mapInPandas(partial, "cluster long, pos long, psum long, pn long")
            .groupBy("cluster", "pos")
            .agg(F.sum("psum").alias("s"), F.sum("pn").alias("n"))
            .collect()
        )
        new = cmat.copy()  # empty clusters keep their previous centroid
        for r in stats:
            new[int(r.cluster)][int(r.pos)] = float(r.s) / int(r.n) / scale
        cmat = new
    if cached:
        base.unpersist(False)
    return cmat


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_ids: list | None = None,
    seed: int = 42,
    scale_bits: int = 20,
) -> DataFrame:
    """Lloyd's k-means; returns (id_col, cluster) after ``n_iter``
    assignment passes with ``n_iter - 1`` exact centroid updates in
    between.  ``cluster`` is the centroid ordinal 0..k-1 (the order
    of ``centroid_ids``, or sample order).  NULL vectors excluded
    (ANN-family contract)."""
    import numpy as np
    import pandas as pd

    base, cmat = _base_and_init(df, k, id_col, vec_col, centroid_ids, seed)
    cmat = _train(base, cmat, n_iter, float(1 << scale_bits))
    best = _assign_of(base.sparkSession.sparkContext, cmat)

    def assign_out(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["features"].to_numpy())
            yield pd.DataFrame({"point_id": pdf["point_id"], "cluster": best(X)})

    return (
        base.select("point_id", "features")
        .mapInPandas(assign_out, "point_id long, cluster long")
        .select(F.col("point_id").alias(id_col), "cluster")
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_ids: list | None = None,
    seed: int = 42,
    scale_bits: int = 20,
) -> "tuple":
    """Train exactly as ``kmeans_fit`` (same init, same quantized
    updates) but return the final centroids as driver-side
    ``(ordinals ndarray, matrix ndarray)`` — the (cids, cmat) shape
    ``similarity._ivf_assign_probe`` consumes, composing
    train-then-index pipelines (k-means → IVF inverted lists, or
    k-means → SemDeDup buckets).  k rows: inherently driver-sized."""
    import numpy as np

    base, cmat = _base_and_init(df, k, id_col, vec_col, centroid_ids, seed)
    cmat = _train(base, cmat, n_iter, float(1 << scale_bits))
    return np.arange(len(cmat), dtype=np.int64), cmat
