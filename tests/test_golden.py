"""The committed golden artifacts must stay derivable from the
current driver testdata — if the driver regenerates
embeddings.parquet, this fails fast at round start (then rerun
tools/make_golden.py and re-verify with tools/check_oracle.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="driver testdata absent")
def test_goldens_match_current_testdata():
    from bubbles.kernels.hdbscan_kernel import hdbscan_exact
    from tools.make_golden import round6_half_up

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    vec_id = np.asarray(t["vec_id"], dtype=np.int64)
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vec_id)
    vec_id, X = vec_id[order], X[order]

    res = hdbscan_exact(X[vec_id < 1500], min_pts=4, min_cluster_size=10)
    g = pq.read_table(f"{GOLDEN}/cluster_embeddings_sf001.parquet")
    gid = np.asarray(g["point_id"])
    assert (gid == vec_id[vec_id < 1500]).all()
    assert (np.asarray(g["label"]) == res.labels).all()

    gres = (
        res
        if bool((vec_id < 1000).all())
        else hdbscan_exact(X[vec_id < 1000], min_pts=4, min_cluster_size=10)
    )
    s = pq.read_table(f"{GOLDEN}/glosh_outliers_sf001.parquet")
    assert (np.asarray(s["point_id"]) == vec_id[vec_id < 1000]).all()
    want = np.array([round6_half_up(x) for x in gres.scores])
    assert (np.asarray(s["score"], dtype=np.float64) == want).all()
