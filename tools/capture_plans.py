"""Capture .explain("formatted") output for bench headline queries into
plans/<round>/<query>_<tag>.txt (optimization-round evidence).

Usage: python tools/capture_plans.py <tag> [sf_dir] [only1,only2,...]
The round directory defaults to r12; override with SPARK_GRAFT_PLANS_ROUND.
Names in the only-list may be ANY catalog query (not just headline rows).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(outdir, exist_ok=True)

    # the bench headline rows that are plain catalog queries (the fit
    # headliners are iterative driver loops — their per-stage plans are
    # captured separately)
    names = [
        "q1_pricing_summary",
        "j2_model_lookup",
        "w1_topk_per_group",
        "dedup_exact",
        "dedup_minhash_lsh",
        "text_profile",
        "ann_cosine_topk",
        "events_sessionize",
        "x6_connected_components",
        "doc_fingerprint",
        "keyword_search",
        "kmv_overlap",
        "zorder_key",
        "ivf_ann_topk",
    ]
    qs = m.all_queries()
    if only:
        # allow capturing ANY catalog query, not just the headline rows
        names = [n for n in qs if n in only]
    for name in names:
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - capture tool
            txt = f"ERROR: {e}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        joins = [
            j
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
            if j in txt
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "MapInArrow")
            if p in txt
        ]
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
