"""Generate the golden-artifact oracles for the two iterative
(non-SQL-expressible) queries, so the driver's correctness gate can
hash-check them like every other row:

- ``tests/golden/cluster_embeddings_sf001.parquet`` — labels of the
  500 sf0.01 embeddings under MRHDBSCAN(min_pts=4, min_cluster_size=10)
- ``tests/golden/glosh_outliers_sf001.parquet`` — GLOSH scores,
  6-dp HALF_UP (decimal arithmetic = Spark's BigDecimal rounding)

Provenance: the single-machine exact kernel (hdbscan_kernel.
hdbscan_exact) on the same input, NOT the distributed query — and
before writing, the merge hierarchy is re-derived with the
independent top-down reference (tests/reference_slow.slow_hierarchy,
the line-by-line Java-semantics twin) and asserted equal
(canon_tree + noise levels), so a kernel regression cannot be
silently baked into the golden.

Regenerate (and re-verify with tools/check_oracle.py) whenever the
driver testdata generation changes:

    python tools/make_golden.py [sf_dir]
"""

from __future__ import annotations

import decimal
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def round6_half_up(x: float) -> float:
    """Spark's F.round semantics: exact binary double -> decimal,
    HALF_UP at 6 places."""
    return float(
        decimal.Decimal(float(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

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
    # the queries filter vec_id < 1500 / < 1000; sf0.01 holds 500 rows
    # so both see the same frame — guard anyway
    keep = vec_id < 1500
    vec_id, X = vec_id[keep], X[keep]

    res = hdbscan_exact(X, min_pts=4, min_cluster_size=10)

    # independent-derivation gate: same MST, hierarchy re-built by the
    # slow top-down Java-semantics reference must agree exactly
    core = core_distances(X, 4)
    src, dst, w = mst_edges(X, core, self_edges=True)
    fast = build_hierarchy(src, dst, w, np.ones(len(X)), 10)
    slow_clusters, _slow_last, slow_noise = slow_hierarchy(
        src, dst, w, np.ones(len(X)), 10
    )
    assert canon_tree(fast.clusters) == canon_tree(slow_clusters), (
        "fast/slow hierarchy mismatch — kernel regression, refusing to "
        "write golden"
    )
    assert np.allclose(fast.noise_level, slow_noise)

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "point_id": pa.array(vec_id, pa.int64()),
                "label": pa.array(res.labels.astype(np.int64), pa.int64()),
            }
        ),
        os.path.join(GOLDEN_DIR, "cluster_embeddings_sf001.parquet"),
    )
    # glosh_outliers fits on its own vec_id<1000 subset (identical at
    # sf0.01, not in general) — run the kernel on exactly that frame
    gmask = vec_id < 1000
    glosh_ids = vec_id[gmask]
    gres = (
        res
        if bool(gmask.all())
        else hdbscan_exact(X[gmask], min_pts=4, min_cluster_size=10)
    )
    glosh_scores = gres.scores
    pq.write_table(
        pa.table(
            {
                "point_id": pa.array(glosh_ids, pa.int64()),
                "score": pa.array(
                    [round6_half_up(s) for s in glosh_scores], pa.float64()
                ),
            }
        ),
        os.path.join(GOLDEN_DIR, "glosh_outliers_sf001.parquet"),
    )
    print(
        f"wrote {GOLDEN_DIR}: cluster_embeddings ({len(vec_id)} rows), "
        f"glosh_outliers ({len(glosh_ids)} rows); "
        f"clusters={sorted(int(x) for x in np.unique(res.labels[res.labels > 0]))}"
    )


if __name__ == "__main__":
    main()
