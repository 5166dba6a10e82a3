"""Dense per-molecule batches for the MAT transformer — parity with
fs_mol/data/mat.py:21-93 (which converts molecules to dense node-feature
/ adjacency / distance matrices via the MAT submodule's collate).

Graphs become [G, max_atoms, F] node features plus [G, A, A] adjacency
(edge types collapsed; MAT's molecule attention uses connectivity) and a
distance channel. The reference computes 3D distances with RDKit
conformers at featurization time; the training path here uses the
shortest-path proxy when explicit distances are absent (RDKit is a
preprocessing-only dependency, SURVEY.md §2.9 item 7).
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

from adkf_ift_tpu.data.task import NUM_NODE_FEATURES, MoleculeDatapoint


class DenseMolBatch(NamedTuple):
    node_features: np.ndarray  # [G, A, F] f32
    adjacency: np.ndarray  # [G, A, A] f32 (any-bond connectivity)
    distance: np.ndarray  # [G, A, A] f32 (hop distance; 0 on diagonal)
    atom_mask: np.ndarray  # [G, A] f32
    labels: np.ndarray  # [G] 0/1 f32
    graph_mask: np.ndarray  # [G] f32

    @property
    def max_atoms(self) -> int:
        return self.node_features.shape[1]


def _hop_distance(adj: np.ndarray, max_hops: int = 8) -> np.ndarray:
    """Shortest-path hop counts by repeated boolean matmul (capped)."""
    a = adj > 0
    n = adj.shape[0]
    dist = np.full((n, n), float(max_hops), np.float32)
    np.fill_diagonal(dist, 0.0)
    reach = np.eye(n, dtype=bool)
    for hop in range(1, max_hops):
        reach = reach @ a | reach
        newly = reach & (dist > hop)
        dist[newly] = hop
    return dist


def pack_dense_molecules(
    samples: List[MoleculeDatapoint], num_graphs: int, max_atoms: int = 64
) -> DenseMolBatch:
    g = num_graphs
    feats = np.zeros((g, max_atoms, NUM_NODE_FEATURES), np.float32)
    adj = np.zeros((g, max_atoms, max_atoms), np.float32)
    dist = np.zeros((g, max_atoms, max_atoms), np.float32)
    amask = np.zeros((g, max_atoms), np.float32)
    labels = np.zeros((g,), np.float32)
    gmask = np.zeros((g,), np.float32)
    for i, s in enumerate(samples[:g]):
        v = min(s.graph.num_nodes, max_atoms)
        feats[i, :v] = s.graph.node_features[:v]
        a = np.zeros((v, v), np.float32)
        for edges in s.graph.adjacency_lists:
            for src, tgt in np.asarray(edges):
                if src < v and tgt < v:
                    a[src, tgt] = 1.0
                    a[tgt, src] = 1.0
        adj[i, :v, :v] = a
        dist[i, :v, :v] = _hop_distance(a)
        amask[i, :v] = 1.0
        labels[i] = 1.0 if s.bool_label else 0.0
        gmask[i] = 1.0
    return DenseMolBatch(feats, adj, dist, amask, labels, gmask)
