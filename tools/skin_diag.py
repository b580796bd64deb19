"""Diagnose the Skin seed-42 anomaly (QUALITY_r5: chosen config at
local[16] scored ARI 0.40 with a spurious 3rd cluster while every
other seed found the 2 true classes).

Runs the chosen config for one seed in BOTH global modes — the
distributed contracted path and the driver full-collect oracle — on
identical inputs, then prints per-cluster sizes, the cluster tree
(birth/death/stability), and ARI for each, so the divergence (if
any) between the contracted global step and the exact global step is
visible directly.

Usage: python tools/skin_diag.py [seed] [cpus] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

DEFAULT_PATH = "/root/reference/数据集/Skin_NonSkin.txt"


def run(spark, pts, truth_df, seed: int, global_mode: str) -> dict:
    import numpy as np

    from bubbles import MRHDBSCAN
    from tools.skin_sweep import ari_singleton_noise

    t0 = time.time()
    model = MRHDBSCAN(
        min_pts=16,
        min_cluster_size=16000,
        sample_fraction=0.2,
        max_local_size=4096,
        max_samples_per_subset=1536,
        seed=seed,
        dim=3,
        global_mode=global_mode,
    ).fit(pts.select("point_id", "features"))
    joined = truth_df.join(model.labels, on="point_id").toPandas()
    el = round(time.time() - t0, 2)
    labels = joined["label"].to_numpy()
    truth = joined["true_label"].to_numpy()
    sizes = {
        int(lbl): int((labels == lbl).sum()) for lbl in np.unique(labels)
    }
    tree = [
        {
            k: (round(float(v), 6) if isinstance(v, float) else v)
            for k, v in r.asDict().items()
        }
        for r in model.cluster_tree.collect()
    ]
    return {
        "global_mode": global_mode,
        "seed": seed,
        "seconds": el,
        "ari_noise_singletons": round(float(ari_singleton_noise(labels, truth)), 4),
        "clusters_found": int(len(np.unique(labels[labels > 0]))),
        "cluster_sizes": sizes,
        "cluster_tree": tree,
    }


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    out = sys.argv[3] if len(sys.argv) > 3 else None
    path = DEFAULT_PATH
    if not os.path.exists(path):
        raise SystemExit(f"dataset not found: {path}")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
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

    results = [
        run(spark, pts, truth_df, seed, "contracted"),
        run(spark, pts, truth_df, seed, "driver"),
    ]
    for r in results:
        print(json.dumps(r), flush=True)
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
