"""Paper-protocol parameter sweep on Skin_NonSkin (BASELINE.md
table 2: RB 0.441 / RS 0.360 / DB 0.425).

The paper's ARI protocol (ResearchReport.pdf p.12 §5.2, quoted in
SURVEY.md §5) treats noise objects as SINGLETONS — each unclustered
point is its own group. Both scores are reported per cell:
``ari_noise_singletons`` (paper protocol, the comparable number) and
``ari_noise_one_group`` (the stricter variant rounds 1-4 reported).

Usage: python tools/skin_sweep.py [path] [out.json]
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, ".")

DEFAULT_PATH = "/root/reference/数据集/Skin_NonSkin.txt"


def ari_singleton_noise(labels, truth):
    """ARI with noise (label 0) expanded to one singleton group per
    point, per the paper's protocol."""
    import numpy as np

    from tests.test_kernel import ari

    labels = np.asarray(labels).copy()
    noise = labels == 0
    # unique negative ids -> every noise point its own cluster
    labels[noise] = -(np.arange(1, int(noise.sum()) + 1))
    return ari(labels, truth)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_PATH
    out = sys.argv[2] if len(sys.argv) > 2 else None
    if not os.path.exists(path):
        raise SystemExit(f"dataset not found: {path}")

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bubbles import MRHDBSCAN
    from tests.test_kernel import ari

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    cols = F.split(F.trim("value"), r"\s+")
    pts = lines.select(
        F.monotonically_increasing_id().alias("point_id"),
        F.slice(F.transform(cols, lambda s: s.cast("double")), 1, 3).alias("features"),
        F.element_at(cols, 4).cast("long").alias("true_label"),
    ).localCheckpoint()
    truth_df = pts.select("point_id", "true_label")

    grid = list(
        itertools.product(
            [int(x) for x in os.environ.get("SKIN_MPTS", "4,8,16").split(",")],
            [
                int(x)
                for x in os.environ.get(
                    "SKIN_MCS", "1000,2000,4000,8000,16000,32000"
                ).split(",")
            ],
        )
    )
    results = []
    for mpts, mcs in grid:
        t0 = time.time()
        model = MRHDBSCAN(
            min_pts=mpts,
            min_cluster_size=mcs,
            sample_fraction=float(os.environ.get("SKIN_K", "0.1")),
            max_local_size=4096,
            max_samples_per_subset=768,
            seed=42,
            dim=3,
        ).fit(pts.select("point_id", "features"))
        joined = truth_df.join(model.labels, on="point_id").toPandas()
        el = round(time.time() - t0, 2)
        labels = joined["label"].to_numpy()
        truth = joined["true_label"].to_numpy()
        row = {
            "min_pts": mpts,
            "min_cluster_size": mcs,
            "seconds": el,
            "ari_noise_singletons": round(float(ari_singleton_noise(labels, truth)), 4),
            "ari_noise_one_group": round(float(ari(labels, truth)), 4),
            "clusters_found": int(len(np.unique(labels[labels > 0]))),
            "noise": int((labels == 0).sum()),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    best = max(results, key=lambda r: r["ari_noise_singletons"])
    summary = {
        "dataset": "Skin_NonSkin",
        "n": int(pts.count()),
        "protocol": "ResearchReport.pdf p.12 §5.2 — ARI vs ground truth, noise as singletons",
        "paper": {"rb": 0.441, "rs": 0.360, "db": 0.425},
        "best": best,
        "sweep": results,
    }
    print(json.dumps({"best": best}))
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()


