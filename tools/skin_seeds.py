"""10-seed stability table for the chosen Skin config (QUALITY §seed
stability). Records ARI (paper protocol), clusters found, and the
EOM decision margin at the contested split so the seed-to-seed
variance has a pinned mechanical explanation.

Usage: python tools/skin_seeds.py [out.json] [cpus]
Env: SKIN_K (sample_fraction, default 0.2), SKIN_CAP
(max_samples_per_subset, default 1536).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

DEFAULT_PATH = "/root/reference/数据集/Skin_NonSkin.txt"
SEEDS = [1, 2, 3, 7, 13, 42, 99, 123, 777, 1234]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else None
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    if not os.path.exists(DEFAULT_PATH):
        raise SystemExit(f"dataset not found: {DEFAULT_PATH}")

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bubbles import MRHDBSCAN
    from tools.skin_sweep import ari_singleton_noise

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    lines = spark.read.text(DEFAULT_PATH).filter(F.length(F.trim("value")) > 0)
    cols = F.split(F.trim("value"), r"\s+")
    pts = lines.select(
        F.monotonically_increasing_id().alias("point_id"),
        F.slice(F.transform(cols, lambda s: s.cast("double")), 1, 3).alias("features"),
        F.element_at(cols, 4).cast("long").alias("true_label"),
    ).localCheckpoint()
    truth_df = pts.select("point_id", "true_label")

    rows = []
    for seed in SEEDS:
        t0 = time.time()
        model = MRHDBSCAN(
            min_pts=16,
            min_cluster_size=16000,
            sample_fraction=float(os.environ.get("SKIN_K", "0.2")),
            max_local_size=4096,
            max_samples_per_subset=int(os.environ.get("SKIN_CAP", "1536")),
            seed=seed,
            dim=3,
        ).fit(pts.select("point_id", "features"))
        joined = truth_df.join(model.labels, on="point_id").toPandas()
        el = round(time.time() - t0, 2)
        labels = joined["label"].to_numpy()
        truth = joined["true_label"].to_numpy()
        tree = sorted(
            (r.asDict() for r in model.cluster_tree.collect()),
            key=lambda r: r["label"],
        )
        # EOM decision margin at each internal split: sum(children
        # stabilities) - parent stability (positive -> children
        # selected). The contested Skin split is the one inside the
        # big (nonskin-side) branch.
        margins = []
        by_parent: dict[int, list[dict]] = {}
        for r in tree:
            by_parent.setdefault(r["parent"], []).append(r)
        for r in tree:
            kids = by_parent.get(r["label"], [])
            if kids and r["stability"] == r["stability"]:  # not NaN
                margins.append(
                    {
                        "parent": int(r["label"]),
                        "parent_stability": round(float(r["stability"]), 1),
                        "children_sum": round(
                            float(sum(k["stability"] for k in kids)), 1
                        ),
                        "margin": round(
                            float(sum(k["stability"] for k in kids) - r["stability"]),
                            1,
                        ),
                    }
                )
        row = {
            "seed": seed,
            "seconds": el,
            "ari_noise_singletons": round(float(ari_singleton_noise(labels, truth)), 4),
            "clusters_found": int(len(np.unique(labels[labels > 0]))),
            "noise": int((labels == 0).sum()),
            "eom_margins": margins,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    aris = [r["ari_noise_singletons"] for r in rows]
    summary = {
        "config": {
            "min_pts": 16,
            "min_cluster_size": 16000,
            "sample_fraction": float(os.environ.get("SKIN_K", "0.2")),
            "max_local_size": 4096,
            "max_samples_per_subset": int(os.environ.get("SKIN_CAP", "1536")),
        },
        "n_seeds": len(SEEDS),
        "mean_ari": round(float(np.mean(aris)), 4),
        "min_ari": round(float(np.min(aris)), 4),
        "max_ari": round(float(np.max(aris)), 4),
        "paper_db_ari": 0.425,
        "seeds_above_paper_db": int(sum(a >= 0.425 for a in aris)),
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
