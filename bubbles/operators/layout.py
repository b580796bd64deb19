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


def _bucket_expr(vcol: str, mincol: str, maxcol: str) -> "F.Column":
    """``(v - vmin) * 65535 div max(vmax - vmin, 1)`` with DECIMAL(38)
    headroom — identical text semantics in Spark SQL and DuckDB."""
    return F.expr(
        f"CAST(CAST(({vcol} - {mincol}) AS DECIMAL(38,0)) * {ZMAX}"
        f" div greatest({maxcol} - {mincol}, 1) AS BIGINT)"
    )


def _interleave(xb: "F.Column", yb: "F.Column") -> "F.Column":
    """Bit-interleave two ZBITS-wide buckets: x takes even bit
    positions, y odd. Unrolled shift/mask sum — one flat JVM-side
    expression, whole-stage-codegen friendly."""
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        z = (
            z
            + F.shiftright(xb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(yb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    out_col: str = "zval",
) -> DataFrame:
    """Append a Z-order (Morton) key over two integral columns.

    The min/max normalization bounds come from one tiny global agg
    cross-joined back (1 row, broadcast by AQE) — no collect, no
    second pass over the data. NULLs in either column yield a NULL
    key (they sort last; filter or impute upstream if that matters).

    Downstream layout recipe (what OPTIMIZE ZORDER does):
    ``df.repartitionByRange(n, out_col).sortWithinPartitions(out_col)
    .write.parquet(...)``. Covered area per file is conserved under
    any ordering — the win is the SHAPE of the footer stats: a
    single-column sort leaves every file spanning the other column's
    full range (predicates there prune nothing), while contiguous
    z-ranges bound BOTH extents near range/sqrt(n_files) (measured in
    tests/test_layout.py: mean y-extent shrinks >5x at 20k rows / 32
    buckets while x stays sqrt-bounded)."""
    for c in (x_col, y_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    bounds = df.agg(
        F.min(x_col).cast("long").alias("__xmin"),
        F.max(x_col).cast("long").alias("__xmax"),
        F.min(y_col).cast("long").alias("__ymin"),
        F.max(y_col).cast("long").alias("__ymax"),
    )
    j = df.crossJoin(F.broadcast(bounds))
    xb = _bucket_expr(x_col, "__xmin", "__xmax")
    yb = _bucket_expr(y_col, "__ymin", "__ymax")
    return j.withColumn(out_col, _interleave(xb, yb)).drop(
        "__xmin", "__xmax", "__ymin", "__ymax"
    )


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
