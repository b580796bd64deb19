"""Generate the golden-artifact oracles for the two iterative
(non-SQL-expressible) queries, so the driver's correctness gate can
hash-check them like every other row:

- ``tests/golden/cluster_embeddings.parquet`` — labels under
  MRHDBSCAN(min_pts=4, min_cluster_size=10) of each testdata
  generation's ``embeddings[vec_id<1500]``
- ``tests/golden/glosh_outliers.parquet`` — GLOSH scores of
  ``embeddings[vec_id<1000]``, 6-dp HALF_UP (decimal arithmetic =
  Spark's BigDecimal rounding)

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


def derive_for_dir(sf_dir: str):
    """(cluster_rows, glosh_rows) for one testdata generation, slow-
    reference-verified."""
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
    return out


def main():
    sf_dirs = sys.argv[1:] or sorted(globmod.glob("/root/testdata/sf*"))
    cl_tables, gl_tables = [], []
    for sf_dir in sf_dirs:
        (cfp, cids, labels), (gfp, gids, scores) = derive_for_dir(sf_dir)
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
        print(f"{sf_dir}: cluster fp={cfp} n={len(cids)}; glosh fp={gfp} n={len(gids)}")

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    # distinct fingerprints may repeat across generations with
    # identical content — dedupe whole frames by fp
    seen = set()
    keep = []
    for t in cl_tables:
        fp = t["input_fp"][0].as_py()
        if fp not in seen:
            seen.add(fp)
            keep.append(t)
    pq.write_table(
        pa.concat_tables(keep),
        os.path.join(GOLDEN_DIR, "cluster_embeddings.parquet"),
    )
    seen = set()
    keep = []
    for t in gl_tables:
        fp = t["input_fp"][0].as_py()
        if fp not in seen:
            seen.add(fp)
            keep.append(t)
    pq.write_table(
        pa.concat_tables(keep),
        os.path.join(GOLDEN_DIR, "glosh_outliers.parquet"),
    )
    print(f"wrote {GOLDEN_DIR}/cluster_embeddings.parquet, glosh_outliers.parquet")


if __name__ == "__main__":
    main()
