"""Relabel (J2) broadcast -> shuffle auto-switch (SCALE.md relabel
row): below _RELABEL_BROADCAST_MAX bubbles the per-iteration relabel
map ships as a broadcast hint; past it the hint is dropped and the
join shuffles on (subset_id, label). Forced here with a tiny ceiling:
the plan must lose its BroadcastHashJoin and the fit labels must not
change."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

import bubbles.plans.mrhdbscan as mr

from tests.test_contracted import _blobs, to_df


@contextmanager
def _no_auto_broadcast(spark):
    # disable Spark's own size-based broadcast selection so the plan
    # shows what the OPERATOR requested, not what AQE promoted
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_inputs(spark):
    bubble_labels = spark.createDataFrame(
        [(0, b, b % 3) for b in range(30)],
        "subset_id long, bubble_id long, label long",
    )
    map_df = spark.createDataFrame(
        [(0, l, 10 + l) for l in range(3)],
        "subset_id long, label long, new_subset_id long",
    )
    return bubble_labels, map_df


def test_small_mapping_broadcasts(spark):
    with _no_auto_broadcast(spark):
        bl, md = _mk_inputs(spark)
        joined = mr._relabel_join(bl, md, n_mapping=3)
        assert "BroadcastHashJoin" in _plan(joined)
        assert joined.count() == 30


def test_past_ceiling_shuffles_identically(spark, monkeypatch):
    monkeypatch.setattr(mr, "_RELABEL_BROADCAST_MAX", 0)
    with _no_auto_broadcast(spark):
        bl, md = _mk_inputs(spark)
        joined = mr._relabel_join(bl, md, n_mapping=3)
        plan = _plan(joined)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        rows = {(r["bubble_id"], r["new_subset_id"]) for r in joined.collect()}
    # same rows either way
    broadcast_rows = {
        (r["bubble_id"], r["new_subset_id"])
        for r in mr._relabel_join(bl, md, n_mapping=3).collect()
    }
    assert rows == broadcast_rows


def test_fit_labels_survive_shuffle_relabel(spark, monkeypatch):
    X = _blobs(n=420, seed=7)
    df = to_df(spark, X)
    params = dict(
        min_pts=4, min_cluster_size=5, max_local_size=64,
        max_samples_per_subset=16, seed=11,
    )
    base = mr.MRHDBSCAN(**params).fit(df)
    monkeypatch.setattr(mr, "_RELABEL_BROADCAST_MAX", 0)
    shuffled = mr.MRHDBSCAN(**params).fit(df)
    assert base.n_iterations == shuffled.n_iterations
    a = sorted((r["point_id"], r["label"]) for r in base.labels.collect())
    b = sorted((r["point_id"], r["label"]) for r in shuffled.labels.collect())
    assert a == b
