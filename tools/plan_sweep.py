"""Catalog-wide physical-plan sweep: for every declared query, print
Exchange count, join strategies, python-boundary nodes, scan pushdown
and row-limit markers — the round-11 optimization checklist input.

Usage: python tools/plan_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = m.all_queries()
    print(f"{'query':34} {'ex':>3} {'scan':>4} {'py':>3}  joins/notes")
    for name in sorted(qs):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            p = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name:34} ERR {type(e).__name__}: {str(e)[:80]}")
            continue
        ex = p.count("Exchange")
        scans = p.count("Scan parquet")
        py = sum(
            p.count(x)
            for x in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "MapInArrow",
            )
        )
        joins = sorted(
            {
                j
                for j in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "CartesianProduct",
                    "BroadcastNestedLoopJoin",
                )
                if j in p
            }
        )
        el = time.time() - t0
        print(
            f"{name:34} {ex:>3} {scans:>4} {py:>3}  {','.join(joins)}"
            f"  [{el:.1f}s build]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
