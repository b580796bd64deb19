"""Tests for embedding quantization (operators/quantize.py) and
fixed-grid forward-fill resampling (operators/timeseries.py)."""

import math

import pytest
from pyspark.sql import functions as F

from bubbles.operators.quantize import dequantize_expr, quantize_embeddings
from bubbles.operators.timeseries import resample_ffill


def test_quantize_codes_and_error_bound(spark):
    vecs = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.001, 0.002, -0.003, 0.0005]),
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    q = quantize_embeddings(df)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[1]["scale"] == 1.0
    assert rows[1]["codes"] == [127, -64, 31, 0]  # floor(v*127/1.0)
    # reconstruction error bounded by scale/127 per component
    deq = q.select("vec_id", dequantize_expr(F.col("codes"), F.col("scale")).alias("d")).collect()
    for r in deq:
        orig = dict(vecs)[r["vec_id"]]
        s = rows[r["vec_id"]]["scale"]
        for a, b in zip(orig, r["d"]):
            assert abs(a - b) <= s / 127 + 1e-12


def test_quantize_zero_and_null_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None)], "vec_id bigint, embedding array<double>"
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["codes"] == [0, 0] and rows[1]["scale"] == 0.0
    assert rows[2]["codes"] is None


def test_quantize_preserves_cosine_ordering(spark):
    """int8 codes keep ANN-grade cosine ordering on real embeddings."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(50)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    q = quantize_embeddings(emb)
    joined = emb.join(q, "vec_id").select("vec_id", "embedding",
        dequantize_expr(F.col("codes"), F.col("scale")).alias("deq")).collect()
    base = {r["vec_id"]: r["embedding"] for r in joined}
    deq = {r["vec_id"]: r["deq"] for r in joined}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    ids = sorted(base)
    probe = ids[0]
    exact = sorted(ids[1:], key=lambda i: -cos(base[probe], base[i]))[:5]
    approx = sorted(ids[1:], key=lambda i: -cos(deq[probe], deq[i]))[:5]
    assert len(set(exact) & set(approx)) >= 4  # recall@5 >= 0.8


def test_quantize_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError):
        quantize_embeddings(df, bits=1)


# ---------------------------------------------------------------- resample

US = 1_000_000
STEP = 60 * US  # 1-minute grid for tests


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts_us bigint, value double")


def test_resample_grid_gaps_filled_forward(spark):
    ev = _ev(spark, [
        (1, 0 * STEP + 5, 10.0),        # bucket 0
        (1, 3 * STEP + 1, 30.0),        # bucket 3 (buckets 1-2 are gaps)
    ])
    out = {r["bucket"]: r["value"] for r in resample_ffill(ev, step_us=STEP).collect()}
    assert out == {0: 10.0, 1: 10.0, 2: 10.0, 3: 30.0}


def test_resample_last_in_bucket_wins(spark):
    ev = _ev(spark, [
        (1, 10, 1.0),
        (1, 20, 2.0),   # later in same bucket -> wins
        (1, 20, 5.0),   # tie on ts -> larger value wins (max struct)
    ])
    out = {r["bucket"]: r["value"] for r in resample_ffill(ev, step_us=STEP).collect()}
    assert out == {0: 5.0}


def test_resample_keys_independent_spans(spark):
    ev = _ev(spark, [
        (1, 0 * STEP, 1.0), (1, 2 * STEP, 2.0),
        (2, 5 * STEP, 9.0),
    ])
    rows = resample_ffill(ev, step_us=STEP).collect()
    per = {}
    for r in rows:
        per.setdefault(r["user_id"], {})[r["bucket"]] = r["value"]
    assert per[1] == {0: 1.0, 1: 1.0, 2: 2.0}
    assert per[2] == {5: 9.0}  # key 2 emits ONLY its own active range
    assert all(r["bucket_ts_us"] == r["bucket"] * STEP for r in rows)


def test_resample_validation(spark):
    with pytest.raises(ValueError):
        resample_ffill(_ev(spark, [(1, 0, 1.0)]), step_us=0)
