"""Quality check against the paper's benchmark protocol
(BASELINE.md): ARI of the distributed DB-variant clustering on a
Gauss1-style synthetic mixture (10-D, 20 clusters; ResearchReport.pdf
p.12 table 1). Paper reference points: Gauss1 exact ARI 0.881,
bubbles-variant 0.864.

Usage: python tools/quality.py [n_points]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def gauss_mixture(n: int, d: int = 10, k: int = 20, seed: int = 42):
    """FIXTURES.md §3 generator: means on a seeded lattice, per-cluster
    σ ~ U(0.5, 1.5)."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-40, 40, size=(k, d))
    sigmas = rng.uniform(0.5, 1.5, size=k)
    sizes = rng.multinomial(n, np.ones(k) / k)
    X = np.vstack(
        [rng.normal(means[i], sigmas[i], size=(s, d)) for i, s in enumerate(sizes)]
    )
    y = np.repeat(np.arange(k), sizes)
    perm = rng.permutation(n)
    return X[perm], y[perm]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    from pyspark.sql import SparkSession

    from bubbles import MRHDBSCAN
    from tests.test_kernel import ari

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    X, y = gauss_mixture(n)
    import pyarrow as pa

    # Arrow table, not a python row list: row-pickle createDataFrame
    # measured minutes of driver CPU past ~1M points
    df = spark.createDataFrame(
        pa.table(
            {
                "point_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.astype(np.float64).ravel(), pa.float64()), X.shape[1]
                ).cast(pa.list_(pa.float64())),
            }
        )
    )
    t0 = time.time()
    model = MRHDBSCAN(
        min_pts=4,
        min_cluster_size=max(20, n // 2000),
        sample_fraction=0.1,
        max_local_size=4096,
        max_samples_per_subset=1024,
        seed=42,
        dim=10,
    ).fit(df)
    labels = model.labels.orderBy("point_id").toPandas()["label"].to_numpy()
    elapsed = time.time() - t0
    score = ari(labels, y)
    n_found = len(np.unique(labels[labels > 0]))
    print(
        json.dumps(
            {
                "n": n,
                "ari": round(float(score), 4),
                "clusters_found": int(n_found),
                "true_clusters": 20,
                "noise": int((labels == 0).sum()),
                "iterations": model.n_iterations,
                "seconds": round(elapsed, 1),
                "paper_gauss1_db_ari": 0.864,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
