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


# ---------------------------------------------------------------------------
# Published-checkpoint featurization (pretrained MAT import path)
# ---------------------------------------------------------------------------

# 28 = 11 atom types + 6 degrees + 5 H-counts + 3 formal charges + ring +
# aromatic + the dummy-node indicator column.
MAT_ATOM_FDIM = 28
_MAT_DUMMY_DISTANCE = 1e6


def _one_hot(value, choices):
    return [1.0 if value == c else 0.0 for c in choices]


def mat_atom_features(atom, one_hot_formal_charge: bool = True) -> np.ndarray:
    """The published MAT atom featurization (the third_party featurizer
    the reference feeds its pretrained checkpoint through,
    fs_mol/data/mat.py:18,33-42 with one_hot_formal_charge=True):
    atomic-number one-hot over {B,C,N,O,F,P,S,Cl,Br,I,other}, degree
    one-hot 0-5, total-H one-hot 0-4, formal-charge one-hot {-1,0,1},
    in-ring, aromatic — 27 dims before the dummy-node column."""
    attributes = _one_hot(
        atom.GetAtomicNum(), [5, 6, 7, 8, 9, 15, 16, 17, 35, 53, 999]
    )
    if attributes[:10] == [0.0] * 10 and atom.GetAtomicNum() != 999:
        attributes[-1] = 1.0  # "other" bucket
    attributes += _one_hot(len(atom.GetNeighbors()), [0, 1, 2, 3, 4, 5])
    attributes += _one_hot(atom.GetTotalNumHs(), [0, 1, 2, 3, 4])
    if one_hot_formal_charge:
        attributes += _one_hot(atom.GetFormalCharge(), [-1, 0, 1])
    else:
        attributes.append(float(atom.GetFormalCharge()))
    attributes.append(1.0 if atom.IsInRing() else 0.0)
    attributes.append(1.0 if atom.GetIsAromatic() else 0.0)
    return np.asarray(attributes, np.float32)


def featurize_smiles_mat(smiles: str, add_dummy_node: bool = True):
    """(node_features [A, 28], adjacency [A, A], distance [A, A]) for one
    molecule in the published pretrained-MAT convention: 3D conformer
    distances (ETKDG embed + UFF optimize, 2D-coordinate fallback), bond
    adjacency WITHOUT self-loops, and a prepended dummy node whose only
    feature is column 0 and whose distances are 1e6. RDKit-gated."""
    from rdkit import Chem
    from rdkit.Chem import AllChem

    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        raise ValueError(f"unparseable SMILES {smiles!r}")
    try:
        molh = Chem.AddHs(mol)
        if AllChem.EmbedMolecule(molh, maxAttempts=5000) != 0:
            raise ValueError("embed failed")
        AllChem.UFFOptimizeMolecule(molh)
        mol = Chem.RemoveHs(molh)
    except Exception:  # noqa: BLE001 — published fallback path
        AllChem.Compute2DCoords(mol)

    feats = np.stack([mat_atom_features(a) for a in mol.GetAtoms()])
    n = mol.GetNumAtoms()
    adj = np.zeros((n, n), np.float32)
    for bond in mol.GetBonds():
        i, j = bond.GetBeginAtom().GetIdx(), bond.GetEndAtom().GetIdx()
        adj[i, j] = adj[j, i] = 1.0
    conf = mol.GetConformer()
    pos = np.asarray(
        [[conf.GetAtomPosition(k).x, conf.GetAtomPosition(k).y, conf.GetAtomPosition(k).z]
         for k in range(n)],
        np.float32,
    )
    dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1).astype(np.float32)

    if add_dummy_node:
        f = np.zeros((n + 1, feats.shape[1] + 1), np.float32)
        f[1:, 1:] = feats
        f[0, 0] = 1.0
        a = np.zeros((n + 1, n + 1), np.float32)
        a[1:, 1:] = adj
        d = np.full((n + 1, n + 1), _MAT_DUMMY_DISTANCE, np.float32)
        d[1:, 1:] = dist
        feats, adj, dist = f, a, d
    return feats, adj, dist


def pack_dense_mat_features(
    mols: List[tuple], labels: List[float], num_graphs: int, max_atoms: int = 64
) -> DenseMolBatch:
    """Stack featurize_smiles_mat outputs into a padded DenseMolBatch
    (the pretrained-import twin of pack_dense_molecules)."""
    g = num_graphs
    fdim = mols[0][0].shape[1] if mols else MAT_ATOM_FDIM
    feats = np.zeros((g, max_atoms, fdim), np.float32)
    adj = np.zeros((g, max_atoms, max_atoms), np.float32)
    dist = np.full((g, max_atoms, max_atoms), _MAT_DUMMY_DISTANCE, np.float32)
    amask = np.zeros((g, max_atoms), np.float32)
    lab = np.zeros((g,), np.float32)
    gmask = np.zeros((g,), np.float32)
    for i, ((f, a, d), y) in enumerate(zip(mols[:g], labels[:g])):
        v = min(f.shape[0], max_atoms)
        feats[i, :v] = f[:v]
        adj[i, :v, :v] = a[:v, :v]
        dist[i, :v, :v] = d[:v, :v]
        amask[i, :v] = 1.0
        lab[i] = float(y)
        gmask[i] = 1.0
    return DenseMolBatch(feats, adj, dist, amask, lab, gmask)
