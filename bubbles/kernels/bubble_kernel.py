"""Data-Bubble local model kernel (numpy).

Runs per oversized subset inside ``applyInPandas``: bubble core
distances → bubble mutual-reachability MST → weighted cluster tree →
EOM flat partition → noise-bubble reattachment → inter-cluster edges.
Reference: 源代码/main/LocalModelReduceByKey.java:29-114 driving
源代码/databubbles/HdbscanDataBubbles.java (cited per function).

Deliberate fixes versus the reference (SURVEY.md §2.9):
  * bubble core distance uses float exponents (B2) and a well-defined
    kNN walk for small bubbles (the reference's index bookkeeping at
    HdbscanDataBubbles.java:124-143 is garbled by int division);
  * EOM selection uses the classic bottom-up excess-of-mass rule
    (Cluster.propagate semantics) rather than the reference's
    leaf-dropping iteration (HdbscanDataBubbles.java:421-471), which
    can never select leaf clusters;
  * noise reattachment picks the *nearest* labeled bubble — the
    reference's loop (HdbscanDataBubbles.java:485-502) short-circuits
    on the first labeled neighbor because it mutates flat[] mid-scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from bubbles.kernels.hdbscan_kernel import (
    ROW_DISTANCES,
    build_hierarchy,
    mst_edges,
)


def _label_weights(labels: np.ndarray, n_b: np.ndarray) -> dict:
    out: dict[int, float] = {}
    for lbl, w in zip(labels, n_b):
        out[int(lbl)] = out.get(int(lbl), 0.0) + float(w)
    return out


def bubble_distance_rows(
    rep: np.ndarray, extent: np.ndarray, nn_dist: np.ndarray, i: int, metric: str
) -> np.ndarray:
    """Row i of the bubble-to-bubble distance matrix (F6,
    HdbscanDataBubbles.java:592-600)."""
    d = ROW_DISTANCES[metric](rep, rep[i])
    gap = d - (extent + extent[i])
    return np.where(gap >= 0, gap + nn_dist + nn_dist[i], np.maximum(nn_dist, nn_dist[i]))


def bubble_core_distances(
    rep: np.ndarray,
    n_b: np.ndarray,
    extent: np.ndarray,
    nn_dist: np.ndarray,
    min_pts: int,
    metric: str = "euclidean",
) -> np.ndarray:
    """Estimated core distance per bubble (F11,
    HdbscanDataBubbles.java:75-146, paper formulas with B2 fixed).

    If the bubble itself holds ≥ minPts−1 points:
        core = ((minPts−1)/n)^(1/d) · extent
    else walk the nearest bubbles (by bubble distance) accumulating
    counts until minPts−1 points are covered; the core distance is the
    distance to that bubble plus the estimated within-bubble radius
    for the remaining points.
    """
    num_neighbors = min_pts - 1
    nb = rep.shape[0]
    d = float(rep.shape[1])
    core = np.zeros(nb)
    if min_pts <= 1:
        return core
    for i in range(nb):
        if n_b[i] >= num_neighbors:
            core[i] = (num_neighbors / n_b[i]) ** (1.0 / d) * extent[i]
            continue
        dist = bubble_distance_rows(rep, extent, nn_dist, i, metric)
        dist[i] = np.inf
        order = np.argsort(dist, kind="stable")
        need = num_neighbors - n_b[i]
        val = 0.0
        for j in order:
            if n_b[j] >= need:
                val = dist[j] + (need / n_b[j]) ** (1.0 / d) * extent[j]
                break
            need -= n_b[j]
        else:
            val = dist[order[-1]] if nb > 1 else extent[i]
        core[i] = val
    return core


@dataclass
class LocalModel:
    bubble_ids: np.ndarray  # global bubble ids (sample point ids)
    labels: np.ndarray  # flat label per bubble, noise reattached (>0)
    inter_src: np.ndarray  # inter-cluster MST edges (global ids)
    inter_dst: np.ndarray
    inter_w: np.ndarray
    n_clusters: int


def local_bubble_model(
    rep: np.ndarray,
    n_b: np.ndarray,
    extent: np.ndarray,
    nn_dist: np.ndarray,
    bubble_ids: np.ndarray,
    min_pts: int,
    min_cluster_size: int,
    metric: str = "euclidean",
    force_split: bool = True,
    max_subset_weight: float | None = None,
) -> LocalModel:
    """The per-subset local model (LocalModelReduceByKey.java:88-114).

    ``force_split`` + ``max_subset_weight``: flat clusters heavier
    than τ are re-cut along the bubble MST (capacity-constrained
    Kruskal) so the recursion always makes geometric progress — see
    inline comment below.
    """
    nb = rep.shape[0]
    bubble_ids = np.asarray(bubble_ids, dtype=np.int64)
    core = bubble_core_distances(rep, n_b, extent, nn_dist, min_pts, metric)

    row_distance = lambda i: bubble_distance_rows(rep, extent, nn_dist, i, metric)  # noqa: E731
    local_ids = np.arange(nb, dtype=np.int64)
    src, dst, w = mst_edges(
        rep, core, metric, self_edges=True, ids=local_ids, row_distance=row_distance
    )

    res = build_hierarchy(src, dst, w, n_b.astype(np.float64), min_cluster_size)
    labels = res.labels.copy()

    # noise reattachment to the nearest originally-labeled bubble
    # (intent of HdbscanDataBubbles.java:485-502)
    labeled = np.where(labels != 0)[0]
    if len(labeled):
        for i in np.where(labels == 0)[0]:
            dist = bubble_distance_rows(rep, extent, nn_dist, i, metric)
            j = labeled[int(np.argmin(dist[labeled]))]
            labels[i] = labels[j]

    if force_split and nb >= 2 and max_subset_weight is not None:
        # Capacity-constrained subdivision: any flat cluster heavier
        # than τ is re-cut along its own bubble-MST structure so every
        # emitted subset fits one local task next iteration. Kruskal
        # ascending, union only while (a) same flat cluster and
        # (b) combined point weight ≤ τ. Cut edges surface as
        # inter-cluster edges, so global connectivity is preserved and
        # the global dendrogram can re-merge the pieces. This bounds
        # the recursion depth at 2 passes for splittable data (the
        # reference re-samples until clusters shrink below τ on their
        # own and can loop unboundedly, Main.java:107-301).
        wsum = {i: float(n_b[i]) for i in range(nb)}
        over = any(
            s > max_subset_weight
            for s in _label_weights(labels, n_b).values()
        )
        if over:
            parent = list(range(nb))

            def find(a):
                while parent[a] != a:
                    parent[a] = parent[parent[a]]
                    a = parent[a]
                return a

            real = src != dst
            order = np.argsort(w[real], kind="stable")
            rs, rd, rw = src[real], dst[real], w[real]
            for e in order:
                a, b = find(int(rs[e])), find(int(rd[e]))
                if a == b or labels[rs[e]] != labels[rd[e]]:
                    continue
                if wsum[a] + wsum[b] <= max_subset_weight:
                    parent[b] = a
                    wsum[a] += wsum[b]
            comp = np.fromiter((find(i) for i in range(nb)), np.int64, nb)
            _, labels = np.unique(comp, return_inverse=True)
            labels = labels + 1

    # inter-cluster edges: MST edges whose endpoints carry different
    # flat labels (X11, HdbscanDataBubbles.java:506-527)
    cross = labels[src] != labels[dst]
    return LocalModel(
        bubble_ids=bubble_ids,
        labels=labels,
        inter_src=bubble_ids[src[cross]],
        inter_dst=bubble_ids[dst[cross]],
        inter_w=w[cross],
        n_clusters=int(len(np.unique(labels[labels > 0]))),
    )
