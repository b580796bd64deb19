"""Scaling evidence for the GRAPH path: triangle_count and pagerank
at sf0.001 / sf0.01 / sf0.1 (lineitem 6k / 60k / 600k rows -> part
co-occurrence and customer-supplier graphs 10x apart in edges),
recording seconds into SCALEBENCH.json.

Same loop tools/pipeline_scale.py closes for the doc ops and
tools/cluster_scale.py for the fit loop: a super-linear regression in
wedge enumeration (the hub-skew risk triangle counting exists to
bound) or in the per-iteration rank join shows up as a number, not an
argument. Warmup rep at the smallest scale, then median-of-3 per
point.

Usage: python tools/graph_scale.py [sf_dirs ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import os

    only = set(filter(None, os.environ.get("GRAPH_OPS", "").split(",")))

    def kcore_q(spark, sf_dir):
        from pyspark.sql import functions as F

        from bubbles.operators.graph import k_core

        li = m._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        pairs = li.alias("x").join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        edges = pairs.select(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        # threshold scaled to the densifying graph: ~half the expected
        # mean degree so the peeling loop actually iterates
        n_li = li.count()
        return k_core(edges, k=max(4, n_li // 2000))

    qs = dict(m.all_queries())
    qs["k_core"] = kcore_q
    out: dict[str, dict[str, float]] = {}
    for name in ("triangle_count", "pagerank", "k_core"):
        if only and name not in only:
            continue
        q = qs[name]
        q(spark, sf_dirs[0]).count()  # warmup: JIT + codegen caches
        out[name] = {}
        for sf_dir in sf_dirs:
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            n = li.count()
            reps = []
            for _ in range(3):
                t0 = time.monotonic()
                q(spark, sf_dir).count()
                reps.append(time.monotonic() - t0)
            sec = round(statistics.median(reps), 2)
            out[name][str(n)] = sec
            print(f"{name} @ {sf_dir} (lineitem {n}): {sec}s  reps={reps}")

    sb = json.load(open("SCALEBENCH.json"))
    sb.update(out)
    json.dump(sb, open("SCALEBENCH.json", "w"), indent=1)
    print("SCALEBENCH.json updated")
    spark.stop()


if __name__ == "__main__":
    main()
