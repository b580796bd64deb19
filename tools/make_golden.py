"""Generate the golden-artifact oracles for the iterative
(non-SQL-expressible) queries, so the driver's correctness gate can
hash-check them like every other row:

- ``tests/golden/cluster_embeddings.parquet`` — labels under
  MRHDBSCAN(min_pts=4, min_cluster_size=10) of each testdata
  generation's ``embeddings[vec_id<1500]``
- ``tests/golden/glosh_outliers.parquet`` — GLOSH scores of
  ``embeddings[vec_id<1000]``, 6-dp HALF_UP (decimal arithmetic =
  Spark's BigDecimal rounding)
- ``tests/golden/cluster_predict.parquet`` — approximate_predict of
  ``embeddings[400<=vec_id<500]`` against the exact-kernel fit of
  ``embeddings[vec_id<400]`` via an independent numpy derivation of
  the membership rule (``predict_rule`` below), strength 6-dp HALF_UP
- ``tests/golden/cluster_hierarchy_cut.parquet`` — the multi-level
  dendrogram cut of the ``<400`` fit at three MST-weight order
  statistics, via an independent chain-walk derivation of the cut
  rule (``cut_rule`` below); labels canonicalized to the minimum
  member point_id per (level, cluster)

The goldens are SF-ADAPTIVE: each generation's rows carry an exact
integer fingerprint of its input frame
(``count + 31*sum(vec_id) + 131*sum(floor(first_component*1e6))`` —
order-independent, bit-identical in numpy and DuckDB), and the
oracle SQL joins on the same fingerprint computed from the
registered ``embeddings`` view, so the right golden rows are picked
whatever sf the gate runs at.

Provenance: the single-machine exact kernel (hdbscan_kernel.
hdbscan_exact), NOT the distributed query — and before writing, each
merge hierarchy is re-derived with the independent top-down
reference (tests/reference_slow.slow_hierarchy, the line-by-line
Java-semantics twin) and asserted equal (canon_tree + noise levels),
so a kernel regression cannot be silently baked into the golden.

Regenerate (and re-verify with tools/check_oracle.py) whenever the
driver testdata generation changes:

    python tools/make_golden.py [sf_dir ...]
"""

from __future__ import annotations

import decimal
import glob as globmod
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)

# mirrored in the oracle SQL (__spark_entry__.oracle_sql) — keep in sync
FP_SQL = (
    "count(*) + 31 * sum(vec_id) "
    "+ 131 * sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT))"
)


def input_fingerprint(vec_id: np.ndarray, X: np.ndarray) -> int:
    """Exact integer fingerprint of an input frame; the DuckDB twin is
    FP_SQL over the same filter. All-integer arithmetic on exact
    floor(double*1e6) values — order-independent and engine-exact."""
    return int(
        len(vec_id)
        + 31 * int(vec_id.astype(np.int64).sum())
        + 131 * int(np.floor(X[:, 0] * 1e6).astype(np.int64).sum())
    )


def round6_half_up(x: float) -> float:
    """Spark's F.round semantics: exact binary double -> decimal,
    HALF_UP at 6 places."""
    return float(
        decimal.Decimal(float(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def predict_rule(
    X_new: np.ndarray,
    ids_tr: np.ndarray,
    X_tr: np.ndarray,
    labels_tr: np.ndarray,
    core_tr: np.ndarray,
    tree: dict,
    min_pts: int = 4,
):
    """Independent numpy derivation of approximate_predict's membership
    rule (bubbles/plans/predict.py documents the semantics): nearest
    fitted point (distance ties -> smallest id), core_x = the
    (min_pts-1)-th nearest fitted-neighbor distance (equivalently the
    min_pts-th smallest after prepending a virtual self-0 — the rule
    that makes self-predict reproduce the fitted core distance), d_mr
    = max of the three, member iff d_mr <= birth_level of the
    neighbor's cluster, strength = the position inside the cluster's
    [death, birth] lifetime. Deliberately NOT imported from the
    engine."""
    out_label = np.zeros(len(X_new), dtype=np.int64)
    out_strength = np.zeros(len(X_new), dtype=np.float64)
    out_nearest = np.zeros(len(X_new), dtype=np.int64)
    for i, x in enumerate(X_new):
        d = np.sqrt(((X_tr - x) ** 2).sum(axis=1))
        j = int(np.lexsort((ids_tr, d))[0])
        out_nearest[i] = ids_tr[j]
        core_x = float(np.sort(d)[min_pts - 2]) if min_pts > 1 else 0.0
        d_mr = max(float(d[j]), float(core_tr[j]), core_x)
        lbl = int(labels_tr[j])
        if lbl == 0:
            continue
        b, dth = tree.get(lbl, (np.nan, np.nan))
        if not (np.isnan(b) or d_mr <= b):
            continue
        out_label[i] = lbl
        out_strength[i] = (
            1.0
            if (np.isnan(b) or np.isnan(dth) or b <= dth)
            else float(np.clip((b - d_mr) / (b - dth), 0.0, 1.0))
        )
    return out_label, out_strength, out_nearest


def cut_rule(clusters: dict, last_cluster, noise_level, eps: float):
    """Independent derivation of the dendrogram-cut label rule
    (MRHDBSCANModel.hierarchy_at documents the semantics): a point is
    noise once its noise level exceeds eps; otherwise its label is the
    deepest chain cluster, walking parents from its last (deepest)
    cluster, whose birth >= eps (the root, birth NaN, is active
    everywhere). Deliberately NOT imported from the engine
    (hdbscan_kernel.labels_at_level is the engine's copy of the rule);
    operates on the hierarchy that the slow top-down reference has
    already been asserted equal to."""
    parent_of = {lbl: c.parent for lbl, c in clusters.items()}
    birth_of = {lbl: c.birth for lbl, c in clusters.items()}
    n = len(last_cluster)
    labels = np.zeros(n, dtype=np.int64)
    for p in range(n):
        if noise_level[p] > eps:
            continue
        lbl = int(last_cluster[p])
        while lbl != 0:
            b = birth_of[lbl]
            if lbl == 1 or (not np.isnan(b) and b >= eps):
                labels[p] = lbl
                break
            lbl = parent_of[lbl]
    return labels


def derive_for_dir(sf_dir: str):
    """(cluster_rows, glosh_rows, predict_rows) for one testdata
    generation, slow-reference-verified."""
    from bubbles.kernels.hdbscan_kernel import (
        build_hierarchy,
        core_distances,
        hdbscan_exact,
        mst_edges,
    )
    from tests.reference_slow import slow_hierarchy
    from tests.test_kernel import canon_tree

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_id = np.asarray(t["vec_id"], dtype=np.int64)
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vec_id)
    vec_id, X = vec_id[order], X[order]

    out = []
    for bound, mode in ((1500, "labels"), (1000, "scores")):
        mask = vec_id < bound
        ids, Xs = vec_id[mask], X[mask]
        res = hdbscan_exact(Xs, min_pts=4, min_cluster_size=10)
        # independent-derivation gate: same MST, hierarchy re-built by
        # the slow top-down Java-semantics reference must agree exactly
        core = core_distances(Xs, 4)
        src, dst, w = mst_edges(Xs, core, self_edges=True)
        fast = build_hierarchy(src, dst, w, np.ones(len(Xs)), 10)
        slow_clusters, _, slow_noise = slow_hierarchy(
            src, dst, w, np.ones(len(Xs)), 10
        )
        assert canon_tree(fast.clusters) == canon_tree(slow_clusters), (
            f"fast/slow hierarchy mismatch on {sf_dir} (<{bound}) — "
            "kernel regression, refusing to write golden"
        )
        assert np.allclose(fast.noise_level, slow_noise)
        fp = input_fingerprint(ids, Xs)
        if mode == "labels":
            out.append((fp, ids, res.labels.astype(np.int64)))
        else:
            out.append(
                (fp, ids, np.array([round6_half_up(s) for s in res.scores]))
            )

    # cluster_predict golden: exact-kernel fit on vec_id<400, the
    # numpy membership rule for vec_id in [400,500) — bounds chosen
    # inside the smallest generation's 500 embeddings so every sf
    # yields predict rows. Keyed by the <500 frame fingerprint.
    mask_tr = vec_id < 400
    ids_tr, X_tr = vec_id[mask_tr], X[mask_tr]
    res = hdbscan_exact(X_tr, min_pts=4, min_cluster_size=10)
    core_tr = core_distances(X_tr, 4)
    src, dst, w = mst_edges(X_tr, core_tr, self_edges=True)
    fast = build_hierarchy(src, dst, w, np.ones(len(X_tr)), 10)
    slow_clusters, _, slow_noise = slow_hierarchy(
        src, dst, w, np.ones(len(X_tr)), 10
    )
    assert canon_tree(fast.clusters) == canon_tree(slow_clusters), (
        f"fast/slow hierarchy mismatch on {sf_dir} (<400) — "
        "kernel regression, refusing to write golden"
    )
    assert np.allclose(fast.noise_level, slow_noise)
    tree = {int(c.label): (float(c.birth), float(c.death)) for c in res.tree}
    mask_new = (vec_id >= 400) & (vec_id < 500)
    ids_new, X_new = vec_id[mask_new], X[mask_new]
    p_label, p_strength, p_nearest = predict_rule(
        X_new, ids_tr, X_tr, res.labels.astype(np.int64), core_tr, tree
    )
    mask_all = vec_id < 500
    pfp = input_fingerprint(vec_id[mask_all], X[mask_all])
    out.append(
        (
            pfp,
            ids_new,
            p_label,
            np.array([round6_half_up(s) for s in p_strength]),
            p_nearest,
        )
    )

    # cluster_hierarchy_cut golden (round 10): three data-derived
    # levels — MST-weight order statistics at q = 0.5/0.8/0.95,
    # reproduced identically by the query from model.mst_edges — cut
    # with the INDEPENDENT chain rule (cut_rule above) over the
    # slow-verified <400 hierarchy. Labels are canonicalized to the
    # minimum member point_id per (level, cluster) so the comparison
    # is label-numbering-invariant (the distributed fit's chain labels
    # need not share the kernel's internal ints).
    ws = np.sort(np.asarray(w, dtype=np.float64))
    # sorted-set dedupe mirrors the query (hierarchy_at collapses
    # duplicate levels, so the golden must too)
    eps_list = sorted({float(ws[int(q * (len(ws) - 1))]) for q in (0.5, 0.8, 0.95)})
    cut_lw, cut_pid, cut_lab = [], [], []
    for e in eps_list:
        labs = cut_rule(fast.clusters, fast.last_cluster, fast.noise_level, e)
        canon = np.zeros(len(labs), dtype=np.int64)
        for lbl in np.unique(labs):
            if lbl == 0:
                continue
            m = labs == lbl
            canon[m] = ids_tr[m].min()
        cut_lw.append(np.full(len(labs), round6_half_up(e)))
        cut_pid.append(ids_tr)
        cut_lab.append(canon)
    cfp400 = input_fingerprint(ids_tr, X_tr)
    out.append(
        (
            cfp400,
            np.concatenate(cut_lw),
            np.concatenate(cut_pid),
            np.concatenate(cut_lab),
        )
    )
    return out


def _write_deduped(tables, fname):
    # distinct fingerprints may repeat across generations with
    # identical content — dedupe whole frames by fp
    seen = set()
    keep = []
    for t in tables:
        fp = t["input_fp"][0].as_py()
        if fp not in seen:
            seen.add(fp)
            keep.append(t)
    pq.write_table(pa.concat_tables(keep), os.path.join(GOLDEN_DIR, fname))


def main():
    sf_dirs = sys.argv[1:] or sorted(globmod.glob("/root/testdata/sf*"))
    cl_tables, gl_tables, pr_tables, cut_tables = [], [], [], []
    for sf_dir in sf_dirs:
        (
            (cfp, cids, labels),
            (gfp, gids, scores),
            (pfp, pids, plabel, pstrength, pnearest),
            (cutfp, cut_lw, cut_pid, cut_lab),
        ) = derive_for_dir(sf_dir)
        cl_tables.append(
            pa.table(
                {
                    "input_fp": pa.array([cfp] * len(cids), pa.int64()),
                    "point_id": pa.array(cids, pa.int64()),
                    "label": pa.array(labels, pa.int64()),
                }
            )
        )
        gl_tables.append(
            pa.table(
                {
                    "input_fp": pa.array([gfp] * len(gids), pa.int64()),
                    "point_id": pa.array(gids, pa.int64()),
                    "score": pa.array(scores, pa.float64()),
                }
            )
        )
        pr_tables.append(
            pa.table(
                {
                    "input_fp": pa.array([pfp] * len(pids), pa.int64()),
                    "point_id": pa.array(pids, pa.int64()),
                    "label": pa.array(plabel, pa.int64()),
                    "strength": pa.array(pstrength, pa.float64()),
                    "nearest_fitted_id": pa.array(pnearest, pa.int64()),
                }
            )
        )
        cut_tables.append(
            pa.table(
                {
                    "input_fp": pa.array([cutfp] * len(cut_pid), pa.int64()),
                    "level_weight": pa.array(cut_lw, pa.float64()),
                    "point_id": pa.array(cut_pid, pa.int64()),
                    "label": pa.array(cut_lab, pa.int64()),
                }
            )
        )
        print(
            f"{sf_dir}: cluster fp={cfp} n={len(cids)}; glosh fp={gfp} "
            f"n={len(gids)}; predict fp={pfp} n={len(pids)}; "
            f"cut fp={cutfp} n={len(cut_pid)}"
        )

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    _write_deduped(cl_tables, "cluster_embeddings.parquet")
    _write_deduped(gl_tables, "glosh_outliers.parquet")
    _write_deduped(pr_tables, "cluster_predict.parquet")
    _write_deduped(cut_tables, "cluster_hierarchy_cut.parquet")
    print(
        f"wrote {GOLDEN_DIR}/cluster_embeddings.parquet, "
        f"glosh_outliers.parquet, cluster_predict.parquet, "
        f"cluster_hierarchy_cut.parquet"
    )


if __name__ == "__main__":
    main()
