"""Slow differential oracle mimicking the reference's *top-down*
hierarchy semantics edge-for-edge (源代码/databubbles/
HdbscanDataBubbles.java:256-375 / hdbscanstar/HDBSCANStar.java:208-492):
iterate tie groups of equal weight from the max down, remove edges,
BFS the affected components, detach noise / split clusters, accumulate
stability via (1/level − 1/birth).

Used only in tests to validate the fast bottom-up kernel
(bubbles.kernels.hdbscan_kernel.build_hierarchy) on adversarial
inputs (ties, duplicates, weighted vertices).
"""

from __future__ import annotations

import numpy as np


class SlowCluster:
    def __init__(self, label, parent, birth, n_points):
        self.label = label
        self.parent = parent
        self.birth = birth
        self.death = np.nan
        self.stability = 0.0
        self.n_points = n_points  # decremented on detach (Java semantics)
        self.n_at_birth = n_points
        self.children = []

    def detach(self, weight, level):
        self.n_points -= weight
        self.stability += weight * (np.float64(1.0) / np.float64(level) - np.float64(1.0) / np.float64(self.birth))
        if self.n_points == 0:
            self.death = level


def slow_hierarchy(u, v, w, vertex_weights, mcl):
    """Returns (clusters dict, last_cluster, noise_level) with the same
    contract as build_hierarchy (before EOM selection)."""
    from collections import Counter

    n = len(vertex_weights)
    vw = np.asarray(vertex_weights, float)
    # multiset adjacency: the Java UndirectedGraph keeps parallel edges
    # as duplicate list entries and removes one occurrence at a time
    adj = [Counter() for _ in range(n)]
    edges = sorted(range(len(w)), key=lambda e: w[e])
    for e in edges:
        if u[e] != v[e]:
            adj[u[e]][v[e]] += 1
            adj[v[e]][u[e]] += 1
    # self-loop presence only affects "anyEdges", never membership;
    # track separately
    label_of = np.ones(n, dtype=int)
    clusters = {1: SlowCluster(1, 0, np.nan, vw.sum())}
    next_label = 2
    last_cluster = np.zeros(n, dtype=int)
    noise_level = np.zeros(n, dtype=float)

    i = len(edges) - 1
    while i >= 0:
        W = w[edges[i]]
        affected_by_label = {}
        while i >= 0 and w[edges[i]] == W:
            e = edges[i]
            a, b = u[e], v[e]
            if a != b:
                adj[a][b] -= 1
                adj[b][a] -= 1
                if adj[a][b] <= 0:
                    del adj[a][b]
                    del adj[b][a]
            i -= 1
            if label_of[a] == 0:
                continue
            affected_by_label.setdefault(label_of[a], set()).update((a, b))
        for parent_label, verts in affected_by_label.items():
            candidates = []
            verts = set(verts)
            while verts:
                root = verts.pop()
                comp = {root}
                queue = [root]
                while queue:
                    x = queue.pop()
                    for y in adj[x]:
                        if y not in comp:
                            comp.add(y)
                            queue.append(y)
                verts -= comp
                members = sum(vw[x] for x in comp)
                if members >= mcl:
                    candidates.append((comp, members))
                else:
                    for x in comp:
                        label_of[x] = 0
                        noise_level[x] = W
                        last_cluster[x] = parent_label
                    clusters[parent_label].detach(members, W)
            if len(candidates) >= 2:
                for comp, members in candidates:
                    cl = SlowCluster(next_label, parent_label, W, members)
                    clusters[next_label] = cl
                    clusters[parent_label].children.append(next_label)
                    clusters[parent_label].detach(members, W)
                    for x in comp:
                        label_of[x] = next_label
                    next_label += 1
    for x in range(n):
        if label_of[x] != 0:
            last_cluster[x] = label_of[x]
    return clusters, last_cluster, noise_level
