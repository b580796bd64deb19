"""Local replica of the driver's correctness gate: run every
queries() entry against its oracle_sql() twin at a given sf and
compare row-count + schema + sorted values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.all_queries()
    oracles = entry_mod.all_oracle_sql()
    failures = []
    import gc

    for name, fn in qs.items():
        if only and name not in only:
            continue
        # settle between queries (the bench's per-rep discipline,
        # bench.py): operators that localCheckpoint shared relations
        # leave storage blocks pinned until Python GC triggers the
        # async ContextCleaner; in this deliberately small local[8]
        # session ~100 accumulated queries' worth of stale blocks can
        # OOM a later memory-hungry row — free them synchronously.
        gc.collect()
        for r in spark.sparkContext._jsc.getPersistentRDDs().values():
            r.unpersist(True)
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"[FAIL-run ] {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows  {el:.1f}s")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"[FAIL-sql ] {name}: {str(e)[:200]}")
            continue
        g, e_ = canon(got), canon(exp)
        if list(g.columns) != list(e_.columns):
            failures.append(name)
            print(f"[FAIL-cols] {name}: spark={list(g.columns)} duck={list(e_.columns)}")
            continue
        if len(g) != len(e_):
            failures.append(name)
            print(f"[FAIL-rows] {name}: spark={len(g)} duck={len(e_)}  {el:.1f}s")
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c].to_numpy(), e_[c].to_numpy()
            if pd.api.types.is_float_dtype(g[c]):
                bad = ~(np.isclose(a, b, rtol=0, atol=1e-9) | (pd.isna(a) & pd.isna(b)))
            else:
                bad = a != b
            if bad.any():
                i = int(np.argmax(bad))
                mismatch = (c, a[i], b[i], int(bad.sum()))
                break
        if mismatch:
            failures.append(name)
            c, av, bv, nbad = mismatch
            print(f"[FAIL-vals] {name}: col={c} spark={av!r} duck={bv!r} nbad={nbad}  {el:.1f}s")
        else:
            print(f"[OK       ] {name}: {len(g)} rows  {el:.1f}s")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
