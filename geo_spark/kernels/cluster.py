"""Clustering / outlier kernels (local, numpy) — the per-cell workers behind
the distributed operators in operators/cluster.py.

- ``dbscan_labels``: DBSCAN over a point set, semantics matching the
  reference (``geo/src/algorithm/dbscan.rs:113-174``): epsilon is an
  inclusive euclidean radius, ``min_samples`` counts the point itself, noise
  → label -1, border points join the first core cluster that reaches them
  (BFS expansion order over ascending point index — deterministic).
- ``lof_scores``: Local Outlier Factor (``outlier_detection.rs:26``):
  k-distance / reachability-distance / lrd formulation.
"""

from __future__ import annotations

import numpy as np


def dbscan_labels(
    coords: np.ndarray, epsilon: float, min_samples: int, return_core: bool = False
) -> np.ndarray:
    """Cluster labels (int64): -1 noise, else 0..k in first-core-seen order.

    With ``return_core`` also returns the boolean core mask (|N_eps(p)| >=
    min_samples, counting p itself) — the expansion loop already computes
    every point's neighborhood, so this is free.
    """
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    labels = np.full(n, -2, dtype=np.int64)  # -2 = unvisited
    core = np.zeros(n, dtype=bool)
    if n == 0:
        return (labels, core) if return_core else labels
    eps2 = epsilon * epsilon

    # neighbor lists via chunked pairwise distances (fine for per-cell sizes)
    def neighbors(i: int) -> np.ndarray:
        d2 = (coords[:, 0] - coords[i, 0]) ** 2 + (coords[:, 1] - coords[i, 1]) ** 2
        return np.flatnonzero(d2 <= eps2)

    cluster = 0
    for i in range(n):
        if labels[i] != -2:
            continue
        nbrs = neighbors(i)
        if len(nbrs) < min_samples:
            labels[i] = -1
            continue
        core[i] = True
        labels[i] = cluster
        seeds = list(nbrs[nbrs != i])
        k = 0
        while k < len(seeds):
            j = seeds[k]
            k += 1
            if labels[j] == -1:
                labels[j] = cluster  # border point
            if labels[j] != -2:
                continue
            labels[j] = cluster
            nbrs_j = neighbors(j)
            if len(nbrs_j) >= min_samples:
                core[j] = True
                seeds.extend(nbrs_j[labels[nbrs_j] == -2])
        cluster += 1
    return (labels, core) if return_core else labels


def lof_scores(coords: np.ndarray, k: int) -> np.ndarray:
    """Local Outlier Factor per point (k nearest, excluding self)."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 1:
        return np.ones(n, dtype=np.float64)
    k = min(k, n - 1)
    dx = coords[:, 0][:, None] - coords[:, 0][None, :]
    dy = coords[:, 1][:, None] - coords[:, 1][None, :]
    d = np.hypot(dx, dy)
    np.fill_diagonal(d, np.inf)
    knn_idx = np.argsort(d, axis=1, kind="mergesort")[:, :k]
    knn_dist = np.take_along_axis(d, knn_idx, axis=1)
    k_dist = knn_dist[:, -1]  # k-distance of each point
    # reachability distance: max(k_dist[neighbor], actual distance)
    reach = np.maximum(k_dist[knn_idx], knn_dist)
    lrd = 1.0 / np.maximum(reach.mean(axis=1), 1e-300)
    lof = (lrd[knn_idx].mean(axis=1)) / lrd
    return lof
