"""Skeleton-graph adjacency construction for the ST-GCN key encoder.

Pure-numpy (host-side, build-once) re-derivation of ``Net/GCN.py:150-278``:
hop distances via boolean matrix powers, symmetric degree normalisation, and
the three partition strategies (uniform / distance / spatial).  The lower net
uses ``distance`` over the 15-joint ``kinect_upper`` layout, giving A of shape
(2, 15, 15) (checkpoint key ``keyEncoder.gcn.A``).
"""

from __future__ import annotations

import numpy as np

from mmego_tpu.config import KINECT_UPPER_GRAPH

NUM_NODES = 15
CENTER = 2  # chest joint, used only by the 'spatial' strategy (GCN.py:194)


def hop_distance(num_node: int, edges, max_hop: int = 1) -> np.ndarray:
    """Shortest-hop distance matrix, inf beyond max_hop (GCN.py:244-256)."""
    a = np.zeros((num_node, num_node))
    for i, j in edges:
        a[j, i] = 1
        a[i, j] = 1
    hop_dis = np.full((num_node, num_node), np.inf)
    powers = [np.linalg.matrix_power(a, d) for d in range(max_hop + 1)]
    arrive = np.stack(powers) > 0
    for d in range(max_hop, -1, -1):
        hop_dis[arrive[d]] = d
    return hop_dis


def normalize_undigraph(a: np.ndarray) -> np.ndarray:
    """Symmetric D^-1/2 A D^-1/2 normalisation (GCN.py:270-278)."""
    deg = a.sum(axis=0)
    dn = np.zeros_like(a)
    nz = deg > 0
    dn[np.diag_indices_from(dn)] = np.where(nz, deg ** -0.5, 0.0)
    return dn @ a @ dn


def build_adjacency(strategy: str = "distance", max_hop: int = 1,
                    dilation: int = 1) -> np.ndarray:
    """Adjacency stack for the kinect_upper layout (GCN.py:188-241).

    Returns:
      (K, 15, 15) float32 with K = 1 ('uniform'), hops ('distance'), or the
      spatial partition count ('spatial').
    """
    self_link = [(i, i) for i in range(NUM_NODES)]
    edges = self_link + list(KINECT_UPPER_GRAPH)
    hop = hop_distance(NUM_NODES, edges, max_hop=max_hop)
    valid_hop = range(0, max_hop + 1, dilation)

    adjacency = np.zeros((NUM_NODES, NUM_NODES))
    for h in valid_hop:
        adjacency[hop == h] = 1
    norm_adj = normalize_undigraph(adjacency)

    if strategy == "uniform":
        return norm_adj[None].astype(np.float32)
    if strategy == "distance":
        a = np.zeros((len(list(valid_hop)), NUM_NODES, NUM_NODES))
        for i, h in enumerate(valid_hop):
            a[i][hop == h] = norm_adj[hop == h]
        return a.astype(np.float32)
    if strategy == "spatial":
        parts = []
        for h in valid_hop:
            a_root = np.zeros((NUM_NODES, NUM_NODES))
            a_close = np.zeros((NUM_NODES, NUM_NODES))
            a_further = np.zeros((NUM_NODES, NUM_NODES))
            for i in range(NUM_NODES):
                for j in range(NUM_NODES):
                    if hop[j, i] == h:
                        if hop[j, CENTER] == hop[i, CENTER]:
                            a_root[j, i] = norm_adj[j, i]
                        elif hop[j, CENTER] > hop[i, CENTER]:
                            a_close[j, i] = norm_adj[j, i]
                        else:
                            a_further[j, i] = norm_adj[j, i]
            if h == 0:
                parts.append(a_root)
            else:
                parts.append(a_root + a_close)
                parts.append(a_further)
        return np.stack(parts).astype(np.float32)
    raise ValueError(f"unknown strategy: {strategy!r}")
