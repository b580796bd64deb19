"""Tests for profile_columns (operators/profile.py), the KMV sketch
(operators/sketch.py), chunk_documents (operators/chunking.py),
merge_upsert (operators/cdc.py) and salted_join (operators/joins.py)."""

import math

import pytest
from pyspark.sql import functions as F

from bubbles.operators.cdc import merge_upsert
from bubbles.operators.chunking import chunk_documents
from bubbles.operators.joins import salted_join
from bubbles.operators.profile import profile_columns
from bubbles.operators.sketch import (
    kmv_distinct,
    kmv_merge,
    kmv_overlap,
    kmv_sketch_rows,
)


# ---------------------------------------------------------------- profile


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "id bigint, s string",
    )
    rows = {r["column"]: r for r in profile_columns(df, ["id", "s"]).collect()}
    assert rows["id"]["n_rows"] == 4
    assert rows["id"]["n_nulls"] == 1
    assert rows["id"]["n_distinct"] == 3
    assert rows["id"]["min_repr"] == "1" and rows["id"]["max_repr"] == "3"
    assert rows["id"]["total_len"] == 3
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_repr"] == "a" and rows["s"]["max_repr"] == "b"
    assert rows["s"]["total_len"] == 3


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1,), (2,)], "id bigint").withColumn(
        "v", F.lit(None).cast("string")
    )
    r = {x["column"]: x for x in profile_columns(df, ["v"]).collect()}["v"]
    assert r["n_nulls"] == 2 and r["n_distinct"] == 0
    assert r["min_repr"] is None and r["max_repr"] is None
    assert r["total_len"] == 0


def test_profile_single_aggregation_node(spark):
    """The whole profile is one agg: exactly one Expand and no more
    than the expand's pair of exchanges in the plan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"), F.lit("x").alias("s")
    )
    plan = profile_columns(df, ["id", "m", "s"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1


def test_profile_validation(spark):
    df = spark.range(5)
    with pytest.raises(ValueError):
        profile_columns(df, [])
    with pytest.raises(ValueError):
        profile_columns(df, ["id", "id"])
    with pytest.raises(ValueError):
        profile_columns(df, ["nope"])


# ---------------------------------------------------------------- sketch


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)] * 3, "g string, v string"
    )
    r = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert r["n_kept"] == 10 and r["est_distinct"] == 10


def test_kmv_estimate_accuracy(spark):
    """5000 distinct values, k=256: the KMV estimator's relative error
    should be well inside 5/sqrt(k-2) (~31%); typically ~6%."""
    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit("val"), F.col("id")).alias("v")
    )
    r = kmv_distinct(df, "g", "v", k=256).collect()[0]
    assert r["n_kept"] == 256
    rel = abs(r["est_distinct"] - n) / n
    assert rel < 5 / math.sqrt(254), f"relative error {rel:.3f} too large"


def test_kmv_merge_equals_whole(spark):
    """Sketching two shards independently and merging == sketching the
    union: the mergeability contract that makes KMV usable across
    independently-profiled corpus drops."""
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("w"), (F.col("id") % 700)).alias("v"),
    )
    whole = {
        r["g"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
        for r in kmv_distinct(df, "g", "v", k=32).collect()
    }
    shard_a = kmv_sketch_rows(df.filter(F.col("id") < 900), "g", "v", k=32)
    shard_b = kmv_sketch_rows(df.filter(F.col("id") >= 900), "g", "v", k=32)
    merged = {
        r["g"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
        for r in kmv_merge(shard_a.unionByName(shard_b), "g", k=32).collect()
    }
    assert whole == merged


def test_kmv_duplicates_do_not_move_estimate(spark):
    """KMV is a distinct sketch: replicating rows changes nothing."""
    base = spark.range(500).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    once = kmv_distinct(base, "g", "v", k=64).collect()[0]
    thrice = kmv_distinct(base.union(base).union(base), "g", "v", k=64).collect()[0]
    assert (once["kth_min"], once["est_distinct"]) == (
        thrice["kth_min"],
        thrice["est_distinct"],
    )


def test_kmv_validation(spark):
    with pytest.raises(ValueError):
        kmv_distinct(spark.range(1).selectExpr("'g' g", "'v' v"), "g", "v", k=1)


def test_kmv_overlap_exact_below_k(spark):
    """Unions smaller than k: every output number is exact, not an
    estimate — including one-sided groups."""
    a = spark.createDataFrame(
        [("g", str(i)) for i in range(10)] + [("only_a", "x")], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", str(i)) for i in range(5, 15)], "g string, v string"
    )
    rows = {r["g"]: r for r in kmv_overlap(a, b, "g", "v", k=64).collect()}
    g = rows["g"]
    assert g["est_a"] == 10 and g["est_b"] == 10
    assert g["est_union"] == 15 and g["k_intersect"] == 5
    assert g["est_intersect"] == 5
    assert g["jaccard_ppm"] == 1_000_000 * 5 // 15
    oa = rows["only_a"]
    assert oa["est_a"] == 1 and oa["est_b"] == 0 and oa["k_intersect"] == 0
    assert oa["jaccard_ppm"] == 0 and oa["est_intersect"] == 0


def test_kmv_overlap_estimate_accuracy(spark):
    """Estimated path (union >> k): Jaccard within ~4/sqrt(k-2) of
    truth for a 50% overlap of 4000-element sets."""
    a = spark.range(4000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    b = spark.range(2000, 6000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    r = kmv_overlap(a, b, "g", "v", k=256).collect()[0]
    true_j = 2000 / 6000
    tol = 4 / (254 ** 0.5)
    assert abs(r["jaccard_ppm"] / 1e6 - true_j) < tol
    assert abs(r["est_union"] - 6000) / 6000 < tol
    assert abs(r["est_intersect"] - 2000) / 2000 < 3 * tol


def test_kmv_overlap_disjoint_and_identical(spark):
    a = spark.range(1000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    b_disjoint = spark.range(10_000, 11_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    r = kmv_overlap(a, b_disjoint, "g", "v", k=128).collect()[0]
    assert r["k_intersect"] == 0 and r["jaccard_ppm"] == 0
    r2 = kmv_overlap(a, a, "g", "v", k=128).collect()[0]
    assert r2["jaccard_ppm"] == 1_000_000
    assert r2["est_intersect"] == r2["est_union"]


# ---------------------------------------------------------------- chunking


def test_chunk_windows_and_overlap(spark):
    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id bigint, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=8, overlap_tokens=4).collect(),
        key=lambda r: r["chunk_ord"],
    )
    # n=10, W=8, O=4 -> starts 0, 4 (start 8's previous chunk already
    # reaches the end)
    assert [r["start_token"] for r in rows] == [0, 4]
    assert rows[0]["chunk_text"] == " ".join(toks[0:8])
    assert rows[1]["chunk_text"] == " ".join(toks[4:10])
    assert rows[1]["n_chunk_tokens"] == 6
    # consecutive chunks share exactly the overlap
    assert rows[0]["chunk_text"].split()[-4:] == rows[1]["chunk_text"].split()[:4]


def test_chunk_covers_every_token(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(n)))
         for i, n in enumerate([1, 5, 16, 17, 33, 100])],
        "doc_id bigint, text string",
    )
    out = chunk_documents(df, chunk_tokens=16, overlap_tokens=4)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r["doc_id"], set()).update(r["chunk_text"].split())
    for i, n in enumerate([1, 5, 16, 17, 33, 100]):
        assert per_doc[i] == {f"w{i}_{j}" for j in range(n)}, f"doc {i}"


def test_chunk_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "one")],
        "doc_id bigint, text string",
    )
    rows = chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    assert {r["doc_id"] for r in rows} == {4}
    assert rows[0]["chunk_text"] == "one" and rows[0]["n_chunk_tokens"] == 1


def test_chunk_zero_overlap_partitions_tokens(spark):
    df = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(10)))], "doc_id bigint, text string"
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap_tokens=0).collect(),
        key=lambda r: r["chunk_ord"],
    )
    assert [r["chunk_text"] for r in rows] == ["0 1 2 3", "4 5 6 7", "8 9"]


def test_chunk_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap_tokens=8)


# ---------------------------------------------------------------- cdc


def _snap(spark):
    return spark.createDataFrame(
        [(1, "one", 10), (2, "two", 20), (3, "three", 30)],
        "doc_id bigint, text string, n bigint",
    )


def _ch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, n bigint, seq bigint, op string"
    )


def test_merge_upsert_update_delete_insert(spark):
    changes = _ch(
        spark,
        [
            (1, "one-v2", 11, 5, "upsert"),   # update
            (2, None, None, 5, "delete"),      # delete
            (9, "nine", 90, 5, "upsert"),      # insert
        ],
    )
    out = {r["doc_id"]: r for r in merge_upsert(_snap(spark), changes).collect()}
    assert set(out) == {1, 3, 9}
    assert out[1]["text"] == "one-v2" and out[1]["n"] == 11
    assert out[3]["text"] == "three"
    assert out[9]["text"] == "nine"


def test_merge_upsert_highest_seq_wins_and_idempotent(spark):
    changes = _ch(
        spark,
        [
            (1, "one-v2", 11, 5, "upsert"),
            (1, "one-v3", 12, 9, "upsert"),
            (1, None, None, 7, "delete"),  # superseded by seq 9
        ],
    )
    out = {r["doc_id"]: r for r in merge_upsert(_snap(spark), changes).collect()}
    assert out[1]["text"] == "one-v3"
    # duplicated log entries (at-least-once delivery) change nothing
    out2 = {
        r["doc_id"]: r
        for r in merge_upsert(_snap(spark), changes.union(changes)).collect()
    }
    assert {k: (v["text"], v["n"]) for k, v in out.items()} == {
        k: (v["text"], v["n"]) for k, v in out2.items()
    }


def test_merge_upsert_batches_compose(spark):
    """apply(B1) then apply(B2) == apply(B1 ∪ B2) when seqs are
    globally ordered across batches."""
    b1 = _ch(spark, [(1, "one-v2", 11, 5, "upsert"), (2, None, None, 6, "delete")])
    b2 = _ch(spark, [(1, None, None, 8, "delete"), (4, "four", 40, 9, "upsert")])
    two_step = merge_upsert(merge_upsert(_snap(spark), b1), b2)
    one_step = merge_upsert(_snap(spark), b1.union(b2))
    a = sorted((r["doc_id"], r["text"], r["n"]) for r in two_step.collect())
    b = sorted((r["doc_id"], r["text"], r["n"]) for r in one_step.collect())
    assert a == b == [(3, "three", 30), (4, "four", 40)]


def test_merge_upsert_validation(spark):
    with pytest.raises(ValueError):
        merge_upsert(_snap(spark), _snap(spark))  # missing seq/op


# ---------------------------------------------------------------- salted join


def test_salted_join_matches_plain_with_hot_key(spark):
    """Half the fact table shares one key (the skew case salting
    exists for): salted result == plain join result exactly."""
    fact = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(1500).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dval")
    )
    plain = fact.join(dim, "k").select("k", "payload", "dval")
    salted = salted_join(fact, dim, "k", n_salts=8).select("k", "payload", "dval")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    # 1000 hot-key rows match dim k=7, plus fact ids 1000..1499
    assert a == b and len(a) == 1500


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (99, "b"), (None, "c")], "k bigint, payload string"
    )
    dim = spark.createDataFrame([(1, "x")], "k bigint, dval string")
    out = sorted(
        (
            (r["k"] or -1, r["payload"], r["dval"])
            for r in salted_join(fact, dim, "k", n_salts=4, how="left").collect()
        ),
    )
    plain = sorted(
        (r["k"] or -1, r["payload"], r["dval"])
        for r in fact.join(dim, "k", "left").collect()
    )
    assert out == plain
    assert (99, "b", None) in out and (-1, "c", None) in out


def test_salted_join_validation(spark):
    fact = spark.createDataFrame([(1, "a")], "k bigint, v string")
    dim = spark.createDataFrame([(1, "b")], "k bigint, v string")
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k")  # ambiguous non-key column v
    with pytest.raises(ValueError):
        salted_join(fact, dim.selectExpr("k", "v dval"), "k", n_salts=0)
    with pytest.raises(ValueError):
        salted_join(fact, dim.selectExpr("k", "v dval"), "k", how="full")


def test_sampled_quantiles_exact_below_k(spark):
    from bubbles.operators.sketch import sampled_quantiles

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50])],
        "g string, id long, v double",
    )
    rows = {
        r["q_ppm"]: r
        for r in sampled_quantiles(
            df, "g", "id", "v", qs_ppm=[0, 500_000, 1_000_000], k=64
        ).collect()
    }
    # group smaller than k: sample == data, lower order statistic
    assert rows[0]["value"] == 10.0
    assert rows[500_000]["value"] == 30.0
    assert rows[1_000_000]["value"] == 50.0
    assert all(r["n_sample"] == 5 for r in rows.values())


def test_sampled_quantiles_accuracy_and_merge_invariance(spark):
    """20k uniform values: sampled p50/p90 within a few percent of
    truth; splitting the input into shards and unioning changes
    nothing (the hash sample is data-order independent)."""
    from bubbles.operators.sketch import sampled_quantiles

    df = spark.range(20_000).select(
        F.lit("g").alias("g"), F.col("id").alias("id"), F.col("id").cast("double").alias("v")
    )
    got = {
        r["q_ppm"]: r["value"]
        for r in sampled_quantiles(df, "g", "id", "v", k=1024).collect()
    }
    assert abs(got[500_000] - 10_000) / 20_000 < 0.05
    assert abs(got[900_000] - 18_000) / 20_000 < 0.05
    sharded = df.filter(F.col("id") % 2 == 0).unionByName(
        df.filter(F.col("id") % 2 == 1)
    ).repartition(13)
    got2 = {
        r["q_ppm"]: r["value"]
        for r in sampled_quantiles(sharded, "g", "id", "v", k=1024).collect()
    }
    assert got == got2


def test_sampled_quantiles_validation(spark):
    from bubbles.operators.sketch import sampled_quantiles

    df = spark.range(5).selectExpr("'g' g", "id", "CAST(id AS DOUBLE) v")
    with pytest.raises(ValueError):
        sampled_quantiles(df, "g", "id", "v", k=1)
    with pytest.raises(ValueError):
        sampled_quantiles(df, "g", "id", "v", qs_ppm=[2_000_000])
    with pytest.raises(ValueError):
        sampled_quantiles(df, "g", "id", "v", qs_ppm=[1, 1])


def test_key_skew_profile_hot_key(spark):
    """900 rows on one key + 100 spread over 100 keys: the ratio
    calls out the hot key."""
    from bubbles.operators.profile import key_skew_profile

    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id") % 100 + 1).alias("k")
    )
    r = key_skew_profile(df, "k").collect()[0]
    assert r["n_rows"] == 1000 and r["max_count"] == 900
    assert r["n_keys"] == 101
    # max/mean = 900 / (1000/101) = 90.9x
    assert r["skew_ratio_ppm"] == 900 * 101 * 1_000_000 // 1000
    assert r["p50_count"] == 1  # the long tail


def test_key_skew_profile_uniform(spark):
    from bubbles.operators.profile import key_skew_profile

    df = spark.range(1000).select((F.col("id") % 50).alias("k"))
    r = key_skew_profile(df, "k").collect()[0]
    assert r["skew_ratio_ppm"] == 1_000_000
    assert r["p50_count"] == 20 and r["p99_count"] == 20


def test_join_cardinality_exact_and_fanout(spark):
    from bubbles.operators.profile import join_cardinality

    a = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k long"
    )
    b = spark.createDataFrame([(1,), (1,), (2,), (9,)], "k long")
    r = join_cardinality(a, b, "k").collect()[0]
    # 1: 3*2=6, 2: 1*1=1; key 3 and 9 don't match
    assert r["join_rows"] == 7 == a.join(b, on="k").count()
    assert r["n_keys_common"] == 2
    # max_key is a STRING (round 7: a long cast NULLed non-numeric
    # keys, the common doc_id case, killing the tie-break)
    assert r["max_key_rows"] == 6 and r["max_key"] == "1"
    assert r["top_key_share_ppm"] == 6 * 1_000_000 // 7


def test_join_cardinality_saturates_at_i64max(spark):
    """Round-8 ADVICE: a >2^63 blowup must report int64 max (a
    documented saturation value), not a silent NULL from the non-ANSI
    decimal->long cast — tested through the split-out report
    projection with a fabricated >2^63 aggregate."""
    from bubbles.operators.profile import _cardinality_report

    agg = spark.sql(
        "SELECT CAST('99999999999999999999' AS DECIMAL(38,0)) AS join_rows,"
        " CAST(2 AS BIGINT) AS n_keys_common,"
        " named_struct('__c',"
        "   CAST('99999999999999999998' AS DECIMAL(38,0)),"
        "   '__k', 'hot') AS __m"
    )
    r = _cardinality_report(agg).collect()[0]
    assert r["join_rows"] == 9223372036854775807  # saturated, not NULL
    assert r["max_key_rows"] == 9223372036854775807
    assert r["max_key"] == "hot"
    # share stays exact: computed on the un-clamped decimals
    assert r["top_key_share_ppm"] == 999999


def test_join_cardinality_disjoint(spark):
    from bubbles.operators.profile import join_cardinality

    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    r = join_cardinality(a, b, "k").collect()[0]
    assert r["join_rows"] == 0 and r["n_keys_common"] == 0
    assert r["max_key_rows"] == 0 and r["top_key_share_ppm"] == 0
