"""Tests for the data-layout operators (operators/layout.py):
Z-order keys and the small-file compaction planner."""

import pytest
from pyspark.sql import Window, functions as F

from bubbles.operators.layout import ZMAX, compaction_plan, zorder_key


# ---------------------------------------------------------------- zorder


def _zorder_rows(spark, pts):
    """Helper: zval per (x, y) with the identity bucket mapping
    (span pinned to exactly [0, ZMAX] so bucket == value)."""
    anchor = [(0, 0), (ZMAX, ZMAX)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(anchor + list(pts))],
        "id long, x long, y long",
    )
    out = zorder_key(df, "x", "y")
    return {(r["x"], r["y"]): r["zval"] for r in out.collect()}


def test_zorder_known_morton_codes(spark):
    """With bucket == value, zval is the textbook Morton code."""
    z = _zorder_rows(spark, [(1, 0), (0, 1), (1, 1), (3, 5), (2, 2)])
    assert z[(0, 0)] == 0
    assert z[(1, 0)] == 1
    assert z[(0, 1)] == 2
    assert z[(1, 1)] == 3
    # x=3 -> bits at even positions: 1 + 4 = 5
    # y=5 (101) -> bits at odd positions 1 and 5: 2 + 32 = 34
    assert z[(3, 5)] == 39
    assert z[(2, 2)] == 4 + 8
    assert z[(ZMAX, ZMAX)] == (1 << 32) - 1


def test_zorder_null_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 10, None), (2, 0, 0), (3, 100, 100)], "id long, x long, y long"
    )
    out = {r["id"]: r["zval"] for r in zorder_key(df, "x", "y").collect()}
    assert out[1] is None and out[2] == 0
    with pytest.raises(ValueError):
        zorder_key(df, "x", "missing")
    with pytest.raises(ValueError):
        zorder_key(df.withColumn("zval", F.lit(1)), "x", "y")


def test_zorder_constant_column_degenerates_safely(spark):
    """A constant dimension (span 0) buckets to 0 everywhere: zval
    reduces to the interleave of the other column alone."""
    df = spark.createDataFrame(
        [(i, i, 7) for i in range(4)], "id long, x long, y long"
    )
    out = {r["x"]: r["zval"] for r in zorder_key(df, "x", "y").collect()}
    # x in 0..3 -> bucket x*ZMAX div 3 in {0, 21845, 43690, ZMAX}
    assert out[0] == 0
    assert len(set(out.values())) == 4  # still injective in x


def test_zorder_locality_bounds_both_dimensions(spark):
    """The point of z-ordering: bucket rows into 32 contiguous key
    ranges (as files would be written) and look at each bucket's
    min/max footer extents. Total covered area is conserved under ANY
    ordering — the win is the SHAPE: an x-sort leaves every bucket
    spanning the full y range (predicates on y prune nothing), while
    z-order bounds both extents near range/sqrt(nbuckets). Asserts
    the mean y-extent shrinks >= 4x vs the x-sort layout while the
    x-extent stays within sqrt-tradeoff bounds."""
    n, nbuckets = 20_000, 32
    base = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(1 << 16)).alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1 << 16)).alias("y"),
    )
    z = zorder_key(base, "x", "y")

    def mean_extents(df, key):
        g = (
            df.withColumn("b", F.ntile(nbuckets).over(Window.orderBy(key)))
            .groupBy("b")
            .agg(
                (F.max("x") - F.min("x")).alias("ex"),
                (F.max("y") - F.min("y")).alias("ey"),
            )
            .agg(F.avg("ex").alias("ex"), F.avg("ey").alias("ey"))
            .collect()[0]
        )
        return g["ex"], g["ey"]

    ex_x, ey_x = mean_extents(z, "x")      # single-column layout
    ex_z, ey_z = mean_extents(z, "zval")   # z-order layout
    assert ey_z * 4 < ey_x, (ey_z, ey_x)   # y becomes prunable
    # tradeoff stays sqrt-shaped: x-extent grows, but stays well
    # under the full range that y pays in the single-column layout
    assert ex_z < 0.5 * (1 << 16), (ex_z,)


# ------------------------------------------------------------ compaction


def test_compaction_plan_known_bins(spark):
    files = spark.createDataFrame(
        [("p", 1, 3000), ("p", 2, 3000), ("p", 3, 3000), ("p", 4, 3000)],
        "part string, f long, sz long",
    )
    rows = {
        r["f"]: r
        for r in compaction_plan(files, "part", "f", "sz", target_bytes=4096).collect()
    }
    # cum: 0, 3000, 6000, 9000 -> bins 0, 0, 1, 2
    assert [rows[i]["bin_id"] for i in (1, 2, 3, 4)] == [0, 0, 1, 2]
    assert rows[2]["bin_offset"] == 3000
    assert rows[3]["bin_offset"] == 6000 - 4096


def test_compaction_plan_oversized_file_not_split(spark):
    files = spark.createDataFrame(
        [("p", 1, 100), ("p", 2, 10_000), ("p", 3, 100)],
        "part string, f long, sz long",
    )
    rows = {
        r["f"]: r
        for r in compaction_plan(files, "part", "f", "sz", target_bytes=4096).collect()
    }
    # the big file's prefix starts in bin 0; the next file jumps to
    # bin 10100 div 4096 = 2 (bin 1 is skipped, ids are prefix
    # positions)
    assert rows[2]["bin_id"] == 0
    assert rows[3]["bin_id"] == 2


def test_compaction_plan_per_partition_and_deterministic(spark):
    import random

    rng = random.Random(7)
    data = [
        (f"p{rng.randrange(4)}", i, rng.randrange(1, 2000)) for i in range(400)
    ]
    files = spark.createDataFrame(data, "part string, f long, sz long")
    plan = compaction_plan(files, "part", "f", "sz", target_bytes=8192)
    a = sorted(map(tuple, plan.collect()))
    b = sorted(map(tuple, plan.collect()))
    assert a == b
    # every bin's total stays under target + max file size (next-fit
    # bound), and cumulative structure is consistent per partition
    bins = (
        plan.groupBy("part", "bin_id")
        .agg(F.sum("sz").alias("tot"))
        .collect()
    )
    assert all(r["tot"] < 8192 + 2000 for r in bins)
    with pytest.raises(ValueError):
        compaction_plan(files, "part", "f", "sz", target_bytes=0)


def test_zorder_three_columns(spark):
    """k=3: 63//3=21 -> capped at 16 bits/dim; with identity buckets
    the key is the textbook 3-D Morton code (x bit i at position 3i,
    y at 3i+1, z at 3i+2)."""
    from bubbles.operators.layout import ZMAX

    anchor = [(0, 0, 0), (ZMAX, ZMAX, ZMAX)]
    pts = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (3, 1, 2)]
    df = spark.createDataFrame(
        [(i,) + p for i, p in enumerate(anchor + pts)],
        "id long, x long, y long, z long",
    )
    out = {(r["x"], r["y"], r["z"]): r["zval"] for r in zorder_key(df, "x", "y", "z").collect()}
    assert out[(0, 0, 0)] == 0
    assert out[(1, 0, 0)] == 1
    assert out[(0, 1, 0)] == 2
    assert out[(0, 0, 1)] == 4
    # x=3 (bits 0,1 -> pos 0,3): 1+8=9; y=1 -> pos 1: 2; z=2 (bit 1 -> pos 5): 32
    assert out[(3, 1, 2)] == 9 + 2 + 32


def test_zorder_five_columns_bits_capped(spark):
    """k=5: 12 bits per dim, key fits a long, still injective on a
    small distinct grid."""
    import itertools

    rows = [
        (i,) + p
        for i, p in enumerate(itertools.product([0, 1, 2, 3], repeat=5))
    ]
    df = spark.createDataFrame(
        rows, "id long, a long, b long, c long, d long, e long"
    )
    out = zorder_key(df, "a", "b", "c", "d", "e").collect()
    zvals = [r["zval"] for r in out]
    assert len(set(zvals)) == len(zvals) == 4 ** 5
    assert all(0 <= z < (1 << 60) for z in zvals)


def test_zorder_validation_multi(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, "x")
    with pytest.raises(ValueError):
        zorder_key(df, "x", "x")
