"""Bucketed-table co-located join: the pay-the-shuffle-once storage
path (sources/bucketed.py). Asserts the PLAN property the 100 TB
story rests on — zero Exchange in a bucketed-bucketed equi-join —
and result parity with the plain shuffled join."""

import pytest
from pyspark.sql import functions as F

from bubbles.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture()
def warehouse(spark, tmp_path_factory):
    # session-level warehouse dir is fixed at session start; tables
    # get unique names instead so tests don't collide
    return spark


def _plan(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange_and_parity(spark):
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    dims = spark.range(0, 10_000, 7).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    write_bucketed(facts, "t_fact_b", "k", 8)
    write_bucketed(dims, "t_dim_b", "k", 8)
    try:
        joined = bucketed_join(spark, "t_fact_b", "t_dim_b", "k")
        # disable broadcast so the co-located SMJ path is what plans
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            p = _plan(bucketed_join(spark, "t_fact_b", "t_dim_b", "k"))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p
        # both scans read the stored bucketing (co-located zip);
        # the AQE plan string repeats Final + Initial plans
        assert p.count("Bucketed: true") >= 2, p
        # NOTE: the merge-join Sorts remain — since Spark 3.0 the
        # read side ignores the written sortBy order unless the
        # legacy conf spark.sql.legacy.bucketedTableScan.
        # outputOrdering is set (it forces one-file-per-bucket
        # reads). The shuffle elimination is the scale win; the
        # per-bucket in-memory sort is cheap and stays.
        want = sorted(map(tuple, facts.join(dims, on="k").collect()))
        got = sorted(map(tuple, joined.collect()))
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fact_b")
        spark.sql("DROP TABLE IF EXISTS t_dim_b")


def test_bucketed_aggregation_no_exchange(spark):
    """GroupBy on the bucket key also rides the stored partitioning:
    one hash aggregate, no shuffle."""
    df = spark.range(5_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_agg_b", "k", 8)
    try:
        agg = spark.table("t_agg_b").groupBy("k").agg(F.sum("v").alias("s"))
        p = _plan(agg)
        assert "Exchange" not in p, p
        want = {(r["k"], r["s"]) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
        got = {(r["k"], r["s"]) for r in agg.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg_b")


def test_write_bucketed_validation(spark):
    with pytest.raises(ValueError):
        write_bucketed(spark.range(1), "t_bad", "id", 0)
