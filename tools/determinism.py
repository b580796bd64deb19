"""Determinism sweep: every registered query runs in TWO separate
Spark sessions with different parallelism and shuffle widths
(local[4]/7 partitions vs local[16]/32 partitions) and the canonical
(sorted-columns, sorted-rows, rounded) results must be identical.

This catches the class of bug the DuckDB oracle CANNOT: results that
depend on partition count / task order — tie-breaks decided by which
partition arrives first, floating-point aggregation-order drift that
crosses the round-9 canonicalization, nondeterministic sampling, and
top-k cuts on untied scores. (Agg-order float drift BELOW 1e-9 is
tolerated by design — same tolerance the oracle gate uses.)

Usage:  python tools/determinism.py [sf_dir] [query ...]
Writes DETERMINISM.json {query: true/false} and exits nonzero on any
mismatch.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from check_oracle import canon  # noqa: E402  (same canonicalization as the gate)


def _run_all(master: str, shuffle: str, sf_dir: str, names):
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .appName(f"determinism-{master}")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.all_queries()
    out = {}
    for name in names:
        t0 = time.time()
        try:
            out[name] = canon(qs[name](spark, sf_dir).toPandas())
        except Exception as exc:  # keep sweeping; report at the end
            out[name] = f"ERROR: {type(exc).__name__}: {exc}"
        print(
            f"  [{master}/{shuffle}] {name}: {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    spark.stop()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    names = [n for n in entry_mod.all_queries() if not only or n in only]

    a = _run_all("local[4]", "7", sf_dir, names)
    b = _run_all("local[16]", "32", sf_dir, names)

    results: dict[str, bool] = {}
    for name in names:
        ra, rb = a[name], b[name]
        if isinstance(ra, str) or isinstance(rb, str):
            results[name] = False
            print(f"[ERROR    ] {name}: {ra if isinstance(ra, str) else rb}")
            continue
        ok = ra.shape == rb.shape and list(ra.columns) == list(rb.columns)
        if ok:
            ok = ra.equals(rb)
        results[name] = bool(ok)
        print(f"[{'OK' if ok else 'MISMATCH':<9}] {name}: {len(ra)} rows")

    # subset runs MERGE into the existing record instead of clobbering
    # the full-sweep results for the queries that didn't run
    if only:
        try:
            with open("DETERMINISM.json") as f:
                prior = json.load(f)
        except (FileNotFoundError, ValueError):
            prior = {}
        results = {**prior, **results}
    with open("DETERMINISM.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    bad = sorted(n for n, ok in results.items() if not ok)
    print(f"\n{len(results) - len(bad)}/{len(results)} deterministic."
          + (f" MISMATCHES: {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
