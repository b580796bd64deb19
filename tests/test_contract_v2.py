"""Chain-coalescing contraction (contract_kernel v2) differentials.

v2 (MRHDBSCAN(coalesce_chains=True)) coalesces runs of pure sub-mcl
attachments along PURE locally->=mcl spines (no cross-edge endpoint
anywhere in the subtree — the exactness condition) into chunks
carrying stability credits (kind 3) and per-point detach weights
(kind 0 w2). Its contract vs the per-event v1 kernel and the raw
hierarchy:

- flat labels: EXACTLY equal (cluster identity is decided at
  structural events, which v2 never coalesces)
- per-point noise levels: exactly equal (coalesced members carry
  their true detach weight; validity requires the spine side >= mcl
  at the event, which the kernel checks locally)
- cluster tree shape (birth, n_points, death): exactly equal
- stabilities: allclose (credit pre-aggregation regroups the float
  sum Σ m_i/w_i, so bit-equality is NOT the contract — that is why
  the mode is opt-in)
- retained rows: strictly fewer on spine-heavy inputs (the point)
"""

from __future__ import annotations

import numpy as np
import pytest

from bubbles.kernels import hdbscan_kernel as hk
from bubbles.kernels.contract_kernel import (
    contract_subset_edges,
    contract_subset_edges_v2,
)


def _blob_edges(n, seed, dims=3, n_blobs=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (n_blobs, dims))
    X = np.concatenate([rng.normal(c, 1.0, (n // n_blobs, dims)) for c in centers])
    ids = np.arange(len(X), dtype=np.int64) * 7 + 3  # non-contiguous ids
    core = hk.core_distances(X, 4, "euclidean")
    src, dst, w = hk.mst_edges(X, core, "euclidean", self_edges=True, ids=ids)
    return ids, src, dst, w


def _reduced_hierarchy(fn, src, dst, w, boundary, mcl, schema5):
    out = fn(src, dst, w, boundary, mcl)
    if schema5:
        k, a, b, ww, ww2 = out
    else:
        k, a, b, ww = out
        ww2 = np.full(len(k), np.nan)
    e = k == 1
    m2 = k == 2
    m3 = k == 3
    rverts = np.unique(np.concatenate([a[e], b[e], a[m2]]))
    ridx = {int(g): i for i, g in enumerate(rverts)}
    rlu = np.fromiter((ridx[int(x)] for x in a[e]), np.int64, int(e.sum()))
    rlv = np.fromiter((ridx[int(x)] for x in b[e]), np.int64, int(e.sum()))
    vw = np.ones(len(rverts))
    for aa, mm in zip(a[m2], ww[m2]):
        vw[ridx[int(aa)]] = mm
    credit = np.full(len(rverts), np.nan)
    for aa, cc in zip(a[m3], ww[m3]):
        credit[ridx[int(aa)]] = cc
    res = hk.build_hierarchy(
        rlu, rlv, ww[e], vw, mcl, vertex_credit=credit if m3.any() else None
    )
    m0 = k == 0
    memb = dict(zip(a[m0].astype(int), b[m0].astype(int)))
    det = dict(zip(a[m0].astype(int), ww2[m0]))
    return res, ridx, memb, det, int(e.sum() + m2.sum() + m3.sum())


def _expand(res, ridx, memb, ids, det=None):
    lab, nl = {}, {}
    for p in ids:
        j = ridx[memb[int(p)]]
        lab[int(p)] = int(res.labels[j])
        d = det.get(int(p), np.nan) if det is not None else np.nan
        nl[int(p)] = float(d) if d == d else float(res.noise_level[j])
    return lab, nl


def _canon(lab):
    m, out = {}, []
    for p in sorted(lab):
        val = lab[p]
        if val == 0:
            out.append(0)
            continue
        if val not in m:
            m[val] = len(m) + 1
        out.append(m[val])
    return out


def _tree_shape(res):
    return sorted(
        (
            round(c.birth, 9) if c.birth == c.birth else -1.0,
            c.n_points,
            round(c.death, 9) if c.death == c.death else -1.0,
        )
        for c in res.clusters.values()
    )


def _stabilities(res):
    return [
        c.stability
        for c in sorted(
            res.clusters.values(),
            key=lambda c: (
                c.birth if c.birth == c.birth else -1.0,
                c.n_points,
                c.death if c.death == c.death else -1.0,
            ),
        )
    ]


CASES = [
    # (n, mcl, n_boundary, seed) — mcl << n makes the >=mcl spine long
    # (the coalescible regime); mcl ~ n exercises the no-gain regime
    (900, 400, 2, 1),
    (900, 400, 0, 2),
    (1200, 50, 5, 3),
    (600, 300, 1, 4),
    (900, 800, 3, 5),
    (300, 10, 8, 6),
    (1500, 30, 2, 7),
    (2000, 100, 4, 8),
    (1500, 30, 0, 9),
    (2000, 100, 0, 10),
]


@pytest.mark.parametrize("n,mcl,nb,seed", CASES)
def test_v2_matches_v1_and_raw(n, mcl, nb, seed):
    ids, src, dst, w = _blob_edges(n, seed)
    rng = np.random.default_rng(seed + 1000)
    bidx = rng.choice(len(ids), size=nb, replace=False)
    bws = {
        int(ids[i]): tuple(
            sorted(rng.uniform(0.1, 5.0, size=2).tolist(), reverse=True)
        )
        for i in bidx
    }
    bset = frozenset(bws)

    verts = np.unique(np.concatenate([src, dst]))
    pos = {int(g): i for i, g in enumerate(verts)}
    lu = np.fromiter((pos[int(x)] for x in src), np.int64, len(src))
    lv = np.fromiter((pos[int(x)] for x in dst), np.int64, len(dst))
    raw = hk.build_hierarchy(lu, lv, w, np.ones(len(verts)), mcl)

    r1, i1, memb1, _, rows1 = _reduced_hierarchy(
        contract_subset_edges, src, dst, w, bset, mcl, schema5=False
    )
    r2, i2, memb2, det2, rows2 = _reduced_hierarchy(
        contract_subset_edges_v2, src, dst, w, bws, mcl, schema5=True
    )

    labr, nlr = _expand(raw, pos, {int(p): int(p) for p in ids}, ids)
    lab1, nl1 = _expand(r1, i1, memb1, ids)
    lab2, nl2 = _expand(r2, i2, memb2, ids, det2)

    assert _canon(labr) == _canon(lab1) == _canon(lab2)
    for p in nlr:
        assert abs(nlr[p] - nl1[p]) < 1e-12
        assert abs(nlr[p] - nl2[p]) < 1e-12
    assert _tree_shape(raw) == _tree_shape(r1) == _tree_shape(r2)
    sr, s1, s2 = _stabilities(raw), _stabilities(r1), _stabilities(r2)
    assert np.allclose(sr, s1, rtol=1e-9, equal_nan=True)
    assert np.allclose(sr, s2, rtol=1e-9, equal_nan=True)
    assert rows2 <= rows1 + 1, (rows1, rows2)
    if mcl <= n // 10 and nb == 0:
        # pure spine-heavy regime: the whole point of v2. With boundary
        # vertices the spine above each join is impure and stays
        # per-event (the exactness condition), so the reduction there
        # is partial (measured ~0.67x at nb=5) — not asserted.
        assert rows2 < rows1 * 0.2, (rows1, rows2)


def test_v2_duplicate_points_zero_weight_edges():
    # duplicate coordinates produce 0-weight MST edges; the chunk
    # credit Σ m_i/w_i then hits IEEE 1/0 = inf — the driver path
    # produces inf/NaN stabilities the same way (documented semantics)
    rng = np.random.default_rng(11)
    X = np.repeat(rng.normal(0, 5, (40, 2)), 5, axis=0)
    ids = np.arange(len(X), dtype=np.int64)
    core = hk.core_distances(X, 4, "euclidean")
    src, dst, w = hk.mst_edges(X, core, "euclidean", self_edges=True, ids=ids)
    mcl = 30
    verts = np.unique(np.concatenate([src, dst]))
    pos = {int(g): i for i, g in enumerate(verts)}
    raw = hk.build_hierarchy(
        np.fromiter((pos[int(x)] for x in src), np.int64, len(src)),
        np.fromiter((pos[int(x)] for x in dst), np.int64, len(dst)),
        w,
        np.ones(len(verts)),
        mcl,
    )
    r2, i2, memb2, det2, _ = _reduced_hierarchy(
        contract_subset_edges_v2, src, dst, w, {}, mcl, schema5=True
    )
    labr, nlr = _expand(raw, pos, {int(p): int(p) for p in ids}, ids)
    lab2, nl2 = _expand(r2, i2, memb2, ids, det2)
    assert _canon(labr) == _canon(lab2)
    for p in nlr:
        assert nlr[p] == nl2[p] or (nlr[p] != nlr[p] and nl2[p] != nl2[p])


def test_v2_single_point_subset():
    src = np.array([5], dtype=np.int64)
    dst = np.array([5], dtype=np.int64)
    w = np.array([1.5])
    k, a, b, ww, ww2 = contract_subset_edges_v2(src, dst, w, {}, 4)
    # one vertex-weight row, one self edge, one membership row
    assert list(k) == [2, 1, 0]
    assert a[2] == 5 and b[2] == 5  # membership: itself


# --- end-to-end: MRHDBSCAN(coalesce_chains=True) vs default ---------------

from bubbles.plans.mrhdbscan import MRHDBSCAN  # noqa: E402
from tests.test_contracted import (  # noqa: E402
    _assert_equivalent,
    _blobs,
    _lattice,
    to_df,
)


def _fit_pair(spark, X, **kw):
    params = dict(
        min_pts=4, min_cluster_size=5, max_local_size=64,
        max_samples_per_subset=16, seed=11,
    )
    params.update(kw)
    df = to_df(spark, X)
    m_v1 = MRHDBSCAN(global_mode="contracted", **params).fit(df)
    m_v2 = MRHDBSCAN(
        global_mode="contracted", coalesce_chains=True, **params
    ).fit(df)
    assert m_v1.n_iterations == m_v2.n_iterations
    return m_v1, m_v2


def test_fit_coalesce_matches_default_recursive(spark):
    m_v1, m_v2 = _fit_pair(spark, _blobs(n=420, seed=7))
    _assert_equivalent(m_v1, m_v2)


def test_fit_coalesce_matches_default_long_spine(spark):
    # one dense blob + sparse halo, mcl << n: the noise halo dribbles
    # onto a long >=mcl spine — the regime v2 coalesces
    rng = np.random.default_rng(23)
    X = np.vstack(
        [rng.normal(0, 0.8, (300, 2)), rng.uniform(-8, 8, (120, 2))]
    )
    m_v1, m_v2 = _fit_pair(
        spark, X, min_cluster_size=40, max_local_size=512,
        max_samples_per_subset=64,
    )
    _assert_equivalent(m_v1, m_v2)


def test_fit_coalesce_matches_default_lattice(spark):
    # duplicate-heavy integer lattice: 0-weight edges + tie groups
    m_v1, m_v2 = _fit_pair(spark, _lattice(seed=3))
    _assert_equivalent(m_v1, m_v2)


def test_fit_coalesce_constraints_falls_back(spark):
    # constraints force the per-event kernel — results must equal the
    # default path bit-for-bit (same kernel underneath)
    X = _blobs(n=300, seed=9)
    df_c = None
    from pyspark.sql import SparkSession  # noqa: F401

    df = to_df(spark, X)
    constraints = spark.createDataFrame(
        [(0, 1, "ml"), (2, 200, "cl")],
        schema="point_a long, point_b long, kind string",
    )
    params = dict(
        min_pts=4, min_cluster_size=5, max_local_size=64,
        max_samples_per_subset=16, seed=11,
    )
    m_v1 = MRHDBSCAN(global_mode="contracted", **params).fit(
        df, constraints=constraints
    )
    m_v2 = MRHDBSCAN(
        global_mode="contracted", coalesce_chains=True, **params
    ).fit(df, constraints=constraints)
    _assert_equivalent(m_v1, m_v2)


def test_fit_coalesce_hierarchy_levels_match(spark):
    # compact-mode per-level label matrix must be identical between the
    # default and coalescing paths: levels are cluster birth weights
    # (structural events), and chunks never straddle one — every chunk
    # member shares its representative's label at every listed level
    rng = np.random.default_rng(31)
    X = np.vstack(
        [rng.normal(0, 0.8, (260, 2)), rng.uniform(-8, 8, (100, 2))]
    )
    m_v1, m_v2 = _fit_pair(
        spark, X, min_cluster_size=30, max_local_size=256,
        max_samples_per_subset=48,
    )
    lv1 = {
        (round(float(r["level_weight"]), 9), int(r["point_id"])): int(r["label"])
        for r in m_v1.hierarchy_levels().collect()
    }
    lv2 = {
        (round(float(r["level_weight"]), 9), int(r["point_id"])): int(r["label"])
        for r in m_v2.hierarchy_levels().collect()
    }
    assert set(lv1) == set(lv2)
    fwd: dict = {}
    for key, l1 in lv1.items():
        l2 = lv2[key]
        assert (l1 == 0) == (l2 == 0)
        assert fwd.setdefault((key[0], l1), l2) == l2
