"""Data-layout operators: Z-order clustering keys and small-file
compaction planning — the table-maintenance half of running a
100 TB lakehouse (Delta/Iceberg OPTIMIZE ZORDER / bin-packing
compaction, re-expressed as plain deterministic DataFrame ops).

Z-ordering: interleaving the bits of two (min-max bucketed) columns
yields a 1-D sort key whose contiguous ranges are small rectangles in
(x, y) space, so files written in z-key order carry tight min/max
footer stats on BOTH columns — point/range predicates on either
column prune files, not just the one you sorted by. The key
computation is exact integer arithmetic (bucket via DECIMAL(38)
scaling, interleave via shift/mask), so the DuckDB twin reproduces it
bit-for-bit and the whole thing runs JVM-side in one projection over
a scan plus one 2-row-ish min/max broadcast.

Compaction planning: given a file inventory (relation of file id /
table-partition / size — metadata scale, i.e. millions of rows for a
100 TB table, NOT the data itself), assign each file to an output bin
so bins approach a target size: deterministic order within partition,
exclusive running sum, ``bin = cum_bytes div target``. One window per
table-partition over metadata-sized groups (a partition with 100k
small files is exactly the pathology compaction exists to fix — and
100k metadata rows per window partition is trivial).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ZBITS = 16  # per-dimension bucket bits; z-value uses 2*ZBITS <= 32 bits
ZMAX = (1 << ZBITS) - 1


def _bucket_expr(vcol: str, mincol: str, maxcol: str, zmax: int = ZMAX) -> "F.Column":
    """``(v - vmin) * zmax div max(vmax - vmin, 1)`` with DECIMAL(38)
    headroom — identical text semantics in Spark SQL and DuckDB.
    Column names are backtick-quoted: an unquoted name with a space,
    dash or keyword either fails to parse or — worse — parses as an
    arithmetic expression ('x-1' = x minus 1) and z-orders garbage."""
    v, lo, hi = (f"`{c}`" for c in (vcol, mincol, maxcol))
    return F.expr(
        f"CAST(CAST(({v} - {lo}) AS DECIMAL(38,0)) * {zmax}"
        f" div greatest({hi} - {lo}, 1) AS BIGINT)"
    )


def _interleave(buckets: list, bits: int) -> "F.Column":
    """Bit-interleave k ``bits``-wide buckets: column j's bit i lands
    at output position ``i*k + j`` (column order = significance order
    within each round). Unrolled shift/mask sum — one flat JVM-side
    expression, whole-stage-codegen friendly."""
    k = len(buckets)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z + F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (i * k + j)
            )
    return z


def zorder_key(
    df: DataFrame,
    *cols: str,
    out_col: str = "zval",
) -> DataFrame:
    """Append a Z-order (Morton) key over 2+ integral columns (what
    Delta/Iceberg ``OPTIMIZE ZORDER BY (c1, c2, ...)`` computes).

    Each column min-max buckets into ``min(16, 63 // k)`` bits (16
    at k=2 — 32-bit keys; 12 at k=5 — every dimension keeps
    predicate-pruning resolution while the key stays in a long). The
    normalization bounds come from one tiny global agg cross-joined
    back (1 row, broadcast by AQE) — no collect, no second pass over
    the data. NULL in any column yields a NULL key (they sort last;
    filter or impute upstream if that matters).

    Downstream layout recipe (what OPTIMIZE ZORDER does):
    ``df.repartitionByRange(n, out_col).sortWithinPartitions(out_col)
    .write.parquet(...)``. Covered volume per file is conserved under
    any ordering — the win is the SHAPE of the footer stats: a
    single-column sort leaves every file spanning the other columns'
    full ranges (predicates there prune nothing), while contiguous
    z-ranges bound EVERY extent near range/n_files^(1/k) (measured in
    tests/test_layout.py: mean y-extent shrinks >5x at 20k rows / 32
    buckets while x stays sqrt-bounded)."""
    if len(cols) < 2:
        raise ValueError(f"zorder_key needs >= 2 columns, got {list(cols)}")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns: {list(cols)}")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    k = len(cols)
    bits = min(ZBITS, 63 // k)
    zmax = (1 << bits) - 1
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(c).cast("long").alias(f"__min{i}"))
        aggs.append(F.max(c).cast("long").alias(f"__max{i}"))
    bounds = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(bounds))
    bks = [
        _bucket_expr(c, f"__min{i}", f"__max{i}", zmax)
        for i, c in enumerate(cols)
    ]
    drop = [f"__min{i}" for i in range(k)] + [f"__max{i}" for i in range(k)]
    return j.withColumn(out_col, _interleave(bks, bits)).drop(*drop)


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign files to compaction bins within each table partition.

    Files are taken in deterministic ``file_col`` order (stable
    re-planning: the same inventory always yields the same plan — a
    retryable maintenance job); each bin accumulates files until the
    EXCLUSIVE running size reaches ``target_bytes``, so every bin
    except possibly the last holds >= 1 file and < target + one file
    of overshoot (the classic next-fit bound: bins end in
    (target, target + max_file_size)).

    Output: (partition, file, size, bin_id, bin_offset) — bin_offset
    is the exclusive prefix size modulo target, i.e. where this
    file's bytes start relative to its bin's budget. Files are never
    split (parquet files are immutable units); a file larger than
    ``target_bytes`` keeps its whole size in the bin where its prefix
    starts, and the following file's ``bin_id`` jumps past the
    intervening multiples — bin ids are stable prefix positions, not
    necessarily contiguous."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    staged = files.select(
        F.col(partition_col),
        F.col(file_col),
        F.col(size_col).cast("long").alias(size_col),
        cum.alias("__cum"),
    )
    # integral `div`, not float /: exact at any byte count
    return staged.select(
        partition_col,
        file_col,
        size_col,
        F.expr(f"__cum div {target_bytes}").alias("bin_id"),
        F.pmod(F.col("__cum"), F.lit(target_bytes)).cast("long").alias("bin_offset"),
    )
