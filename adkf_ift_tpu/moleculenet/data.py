"""MoleculeNet data model: categorical-feature molecular graphs packed to
static shapes (reference MoleculeNet/chem_lib/datasets/loader.py, which
wraps torch-geometric MoleculeDataset; here a torch-free equivalent).

Atom features are the Hu et al. pretrained-GNN vocabulary: atomic number
index and chirality tag index; bonds carry bond-type and direction
indices. The raw-CSV loader (tox21.csv etc.: one SMILES column + one
column per task with 0/1/blank labels) is RDKit-gated.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import numpy as np

NUM_ATOM_TYPES = 120  # atomic number vocabulary (Hu et al.)
NUM_CHIRALITY = 4
NUM_BOND_TYPES = 5  # single, double, triple, aromatic + self-loop slot
NUM_BOND_DIRS = 3


class MolNetGraph(NamedTuple):
    atom_type: np.ndarray  # [V] i32
    chirality: np.ndarray  # [V] i32
    edge_index: np.ndarray  # [E, 2] i32 (bidirectional)
    bond_type: np.ndarray  # [E] i32
    bond_dir: np.ndarray  # [E] i32


class PackedMolNetGraphs(NamedTuple):
    """Disconnected padded mega-graph of categorical molecules."""

    atom_type: np.ndarray  # [node_budget] i32
    chirality: np.ndarray  # [node_budget] i32
    node_to_graph: np.ndarray  # [node_budget] i32
    node_mask: np.ndarray  # [node_budget] f32
    edge_sources: np.ndarray  # [edge_budget] i32
    edge_targets: np.ndarray  # [edge_budget] i32
    bond_type: np.ndarray  # [edge_budget] i32
    bond_dir: np.ndarray  # [edge_budget] i32
    edge_mask: np.ndarray  # [edge_budget] f32
    graph_mask: np.ndarray  # [num_graphs] f32

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]


class MolNetEpisode(NamedTuple):
    support: PackedMolNetGraphs
    support_labels: np.ndarray  # [S] ±1 f32
    query: PackedMolNetGraphs
    query_labels: np.ndarray  # [Q] ±1 f32


def pack_molnet_graphs(
    graphs: List[MolNetGraph], num_graphs: int, nodes_per_graph: int = 40, edges_per_graph: int = 88
) -> PackedMolNetGraphs:
    node_budget = ((num_graphs * nodes_per_graph + 127) // 128) * 128
    edge_budget = ((num_graphs * edges_per_graph + 127) // 128) * 128
    dummy = node_budget - 1

    atom_type = np.zeros((node_budget,), np.int32)
    chirality = np.zeros((node_budget,), np.int32)
    node_to_graph = np.full((node_budget,), num_graphs, np.int32)
    node_mask = np.zeros((node_budget,), np.float32)
    edge_sources = np.full((edge_budget,), dummy, np.int32)
    edge_targets = np.full((edge_budget,), dummy, np.int32)
    bond_type = np.zeros((edge_budget,), np.int32)
    bond_dir = np.zeros((edge_budget,), np.int32)
    edge_mask = np.zeros((edge_budget,), np.float32)
    graph_mask = np.zeros((num_graphs,), np.float32)

    no, eo = 0, 0
    for gi, g in enumerate(graphs[:num_graphs]):
        v = len(g.atom_type)
        if no + v > node_budget - 1:
            raise ValueError("node budget exceeded")
        atom_type[no : no + v] = g.atom_type
        chirality[no : no + v] = g.chirality
        node_to_graph[no : no + v] = gi
        node_mask[no : no + v] = 1.0
        e = len(g.edge_index)
        if eo + e > edge_budget:
            raise ValueError("edge budget exceeded")
        edge_sources[eo : eo + e] = g.edge_index[:, 0] + no
        edge_targets[eo : eo + e] = g.edge_index[:, 1] + no
        bond_type[eo : eo + e] = g.bond_type
        bond_dir[eo : eo + e] = g.bond_dir
        edge_mask[eo : eo + e] = 1.0
        graph_mask[gi] = 1.0
        no += v
        eo += e

    return PackedMolNetGraphs(
        atom_type, chirality, node_to_graph, node_mask,
        edge_sources, edge_targets, bond_type, bond_dir, edge_mask, graph_mask,
    )


def smiles_to_molnet_graph(smiles: str) -> Optional[MolNetGraph]:
    """RDKit SMILES -> categorical graph (loader.py mol_to_graph_data_obj)."""
    try:
        from rdkit import Chem
    except ImportError as e:  # pragma: no cover
        raise ImportError("RDKit required to parse MoleculeNet raw CSVs.") from e

    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    atom_type = np.asarray(
        [min(a.GetAtomicNum(), NUM_ATOM_TYPES - 1) for a in mol.GetAtoms()], np.int32
    )
    chirality = np.asarray(
        [min(int(a.GetChiralTag()), NUM_CHIRALITY - 1) for a in mol.GetAtoms()], np.int32
    )
    bond_map = {
        Chem.BondType.SINGLE: 0, Chem.BondType.DOUBLE: 1,
        Chem.BondType.TRIPLE: 2, Chem.BondType.AROMATIC: 3,
    }
    edges, btypes, bdirs = [], [], []
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        t = bond_map.get(b.GetBondType(), 0)
        d = min(int(b.GetBondDir()), NUM_BOND_DIRS - 1)
        edges.extend([[i, j], [j, i]])
        btypes.extend([t, t])
        bdirs.extend([d, d])
    edge_index = (
        np.asarray(edges, np.int32) if edges else np.zeros((0, 2), np.int32)
    )
    return MolNetGraph(
        atom_type, chirality, edge_index,
        np.asarray(btypes, np.int32), np.asarray(bdirs, np.int32),
    )


@dataclass
class MolNetTask:
    """One (dataset, label-column) binary task."""

    name: str
    graphs: List[MolNetGraph]
    labels: np.ndarray  # 0/1


def load_moleculenet_csv(csv_path: str, smiles_col: str = "smiles") -> List[MolNetTask]:
    """Raw MoleculeNet CSV (tox21/sider/muv style: one column per task)
    -> list of binary tasks (loader.py:98+ semantics; blank labels drop)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    task_cols = [c for c in df.columns if c not in (smiles_col, "mol_id")]
    graphs_by_row = {}
    tasks: List[MolNetTask] = []
    for col in task_cols:
        sub = df[~df[col].isna()]
        graphs, labels = [], []
        for idx, row in sub.iterrows():
            if idx not in graphs_by_row:
                graphs_by_row[idx] = smiles_to_molnet_graph(str(row[smiles_col]))
            g = graphs_by_row[idx]
            if g is None:
                continue
            graphs.append(g)
            labels.append(1.0 if float(row[col]) > 0 else 0.0)
        if graphs:
            tasks.append(MolNetTask(col, graphs, np.asarray(labels, np.float32)))
    return tasks


def sample_episode(
    task: MolNetTask,
    n_shot: int = 10,
    query_size: int = 32,
    seed: int = 0,
    nodes_per_graph: int = 40,
    edges_per_graph: int = 88,
) -> MolNetEpisode:
    """2-class n-shot episode (adkfift_trainer.py protocol: n_shot per
    class support, rest as query, padded static shapes)."""
    rng = np.random.RandomState(seed)
    pos = np.where(task.labels > 0)[0]
    neg = np.where(task.labels <= 0)[0]
    if len(pos) < n_shot + 1 or len(neg) < n_shot + 1:
        raise ValueError(f"task {task.name} too small for {n_shot}-shot episodes")
    pos, neg = rng.permutation(pos), rng.permutation(neg)
    support_idx = np.concatenate([pos[:n_shot], neg[:n_shot]])
    rest = np.concatenate([pos[n_shot:], neg[n_shot:]])
    rng.shuffle(rest)
    query_idx = rest[:query_size]

    def pack(idxs, budget):
        graphs = [task.graphs[i] for i in idxs]
        packed = pack_molnet_graphs(graphs, budget, nodes_per_graph, edges_per_graph)
        labels = np.zeros((budget,), np.float32)
        labels[: len(idxs)] = 2.0 * task.labels[idxs] - 1.0  # ±1
        return packed, labels

    support, s_labels = pack(support_idx, 2 * n_shot)
    query, q_labels = pack(query_idx, query_size)
    return MolNetEpisode(support, s_labels, query, q_labels)
