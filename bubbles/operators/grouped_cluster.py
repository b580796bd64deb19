"""Per-group density clustering as a DataFrame aggregation:
``groupBy(key).applyInPandas(exact HDBSCAN kernel)`` — the
Spark-idiomatic "cluster every segment independently" surface (per
language, per tenant, per day...). Net-new beyond the reference
(which clusters one dataset per run; cf. 源代码/main/Main.java run
loop), built from the same exact kernel the MR pipeline validates
against.

Scale shape: ONE hash exchange on the group key, then each group is
a single Arrow batch in a worker-side numpy kernel — embarrassingly
parallel across groups, no driver participation. The kernel is
O(n²) per group (exact HDBSCAN), so groups must be segment-sized;
``max_group_size`` fails fast with a clear message instead of
letting one giant group OOM an executor — for such groups the
distributed `bubbles.MRHDBSCAN` is the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bubbles.kernels.hdbscan_kernel import hdbscan_exact


def hdbscan_per_group(
    df: DataFrame,
    group_col: str,
    features_col: str = "features",
    id_col: str = "point_id",
    min_pts: int = 4,
    min_cluster_size: int = 4,
    metric: str = "euclidean",
    max_group_size: int = 50_000,
) -> DataFrame:
    """Returns (group_col, id_col, label, glosh): group-LOCAL cluster
    labels (-1 = noise, stable ordering by first point id in each
    cluster is NOT guaranteed — labels are ids, not ranks) plus the
    GLOSH outlier score per point."""
    import numpy as np
    import pandas as pd

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        f"{group_col} {fields[group_col]}, {id_col} {fields[id_col]}, "
        "label long, glosh double"
    )

    def fit(key, pdf):
        n = len(pdf)
        if n > max_group_size:
            raise ValueError(
                f"group {key} has {n} rows > max_group_size="
                f"{max_group_size}; use bubbles.MRHDBSCAN for "
                "groups beyond single-worker exact clustering"
            )
        X = np.stack(pdf[features_col].to_numpy())
        if n < max(min_pts, 2):
            lab = np.full(n, -1, np.int64)
            sc = np.zeros(n, np.float64)
        else:
            res = hdbscan_exact(
                X,
                min_pts=min_pts,
                min_cluster_size=min_cluster_size,
                metric=metric,
            )
            lab, sc = res.labels.astype(np.int64), res.scores
        return pd.DataFrame(
            {
                group_col: pdf[group_col].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                "label": lab,
                "glosh": sc,
            }
        )

    from pyspark.sql import functions as F

    return (
        df.select(group_col, id_col, features_col)
        # NULL-vector rows are excluded, same contract as the ANN
        # family (similarity.py): one NULL row must not np.stack-fail
        # an entire group's kernel
        .filter(F.col(features_col).isNotNull())
        .groupBy(group_col)
        .applyInPandas(fit, schema=out_schema)
    )
