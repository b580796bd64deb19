"""The committed golden artifacts must stay derivable from the
current driver testdata — if the driver regenerates
embeddings.parquet, this fails fast at round start (then rerun
tools/make_golden.py and re-verify with tools/check_oracle.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1") if os.path.exists(d)]


@pytest.mark.skipif(not SF_DIRS, reason="driver testdata absent")
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_goldens_match_current_testdata(sf_dir):
    from tools.make_golden import derive_for_dir

    (
        (cfp, cids, labels),
        (gfp, gids, scores),
        (pfp, pids, plabel, pstrength, pnearest),
        (cutfp, cut_lw, cut_pid, cut_lab),
    ) = derive_for_dir(sf_dir)

    g = pq.read_table(f"{GOLDEN}/cluster_embeddings.parquet").to_pandas()
    mine = g[g["input_fp"] == cfp].sort_values("point_id")
    assert len(mine) == len(cids), "fingerprint missing from golden — regenerate"
    assert (mine["point_id"].to_numpy() == cids).all()
    assert (mine["label"].to_numpy() == labels).all()

    s = pq.read_table(f"{GOLDEN}/glosh_outliers.parquet").to_pandas()
    mine = s[s["input_fp"] == gfp].sort_values("point_id")
    assert len(mine) == len(gids)
    assert (mine["point_id"].to_numpy() == gids).all()
    assert (mine["score"].to_numpy() == scores).all()

    p = pq.read_table(f"{GOLDEN}/cluster_predict.parquet").to_pandas()
    mine = p[p["input_fp"] == pfp].sort_values("point_id")
    assert len(mine) == len(pids)
    assert (mine["point_id"].to_numpy() == pids).all()
    assert (mine["label"].to_numpy() == plabel).all()
    assert (mine["strength"].to_numpy() == pstrength).all()
    assert (mine["nearest_fitted_id"].to_numpy() == pnearest).all()

    c = pq.read_table(f"{GOLDEN}/cluster_hierarchy_cut.parquet").to_pandas()
    mine = c[c["input_fp"] == cutfp].sort_values(["level_weight", "point_id"])
    assert len(mine) == len(cut_pid)
    order = np.lexsort((cut_pid, cut_lw))
    assert (mine["level_weight"].to_numpy() == cut_lw[order]).all()
    assert (mine["point_id"].to_numpy() == cut_pid[order]).all()
    assert (mine["label"].to_numpy() == cut_lab[order]).all()
