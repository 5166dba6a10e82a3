"""FS-Mol task and molecule schema + on-disk JSONL(.gz) codec.

Capability parity with the reference data model
(fs_mol/data/fsmol_task.py:19-176): a molecule is a SMILES string, a
typed-edge graph, a 2048-d ECFP count fingerprint, 42 phys-chem
descriptors and bool/numeric labels; a task is a named list of
molecules stored as one gzipped JSONL file per ChEMBL assay
(README.md:132-159). The wire format is identical, so real FS-Mol data
drops in unchanged.

Host-side only (numpy): device-ready episodes are built by
adkf_ift_tpu.data.episodes.
"""

from __future__ import annotations

import gzip
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

NUM_EDGE_TYPES = 3  # single, double, triple bond (fs_mol/data/fsmol_dataset.py:21)
NUM_NODE_FEATURES = 32
FINGERPRINT_DIM = 2048
DESCRIPTOR_DIM = 42


def task_name_from_path(path: str) -> str:
    name = os.path.basename(path)
    if name.endswith(".jsonl.gz"):
        name = name[: -len(".jsonl.gz")]
    elif name.endswith(".jsonl"):
        name = name[: -len(".jsonl")]
    return name


@dataclass
class GraphData:
    """Typed-edge molecular graph.

    node_features: [V, NUM_NODE_FEATURES] float32
    adjacency_lists: per edge type, [E_t, 2] int arrays of (src, tgt).
    """

    node_features: np.ndarray
    adjacency_lists: List[np.ndarray]
    edge_features: List[np.ndarray] = field(default_factory=list)

    @property
    def num_nodes(self) -> int:
        return self.node_features.shape[0]

    @property
    def num_edges(self) -> int:
        return sum(a.shape[0] for a in self.adjacency_lists)


@dataclass(frozen=True)
class MoleculeDatapoint:
    """One labelled molecule (fs_mol/data/fsmol_task.py:35-81)."""

    task_name: str
    smiles: str
    graph: GraphData
    numeric_label: float
    bool_label: bool
    fingerprint: Optional[np.ndarray]
    descriptors: Optional[np.ndarray]

    def get_fingerprint(self) -> np.ndarray:
        """Stored fingerprint, or a lazy RDKit recompute (the reference's
        fallback, fsmol_task.py:59-81; RDKit is optional here)."""
        if self.fingerprint is not None:
            return self.fingerprint
        try:
            from rdkit import Chem

            from adkf_ift_tpu.preprocessing.featurise import morgan_count_fingerprint

            mol = Chem.MolFromSmiles(self.smiles)
            if mol is not None:
                object.__setattr__(self, "fingerprint", morgan_count_fingerprint(mol))
                return self.fingerprint
        except ImportError:
            pass
        raise ValueError(
            f"Datapoint {self.smiles} has no stored fingerprint and RDKit is "
            "unavailable for on-the-fly recompute."
        )

    def get_descriptors(self) -> np.ndarray:
        if self.descriptors is not None:
            return self.descriptors
        try:
            from rdkit import Chem

            from adkf_ift_tpu.preprocessing.featurise import phys_chem_descriptors

            mol = Chem.MolFromSmiles(self.smiles)
            if mol is not None:
                object.__setattr__(self, "descriptors", phys_chem_descriptors(mol))
                return self.descriptors
        except ImportError:
            pass
        raise ValueError(f"Datapoint {self.smiles} has no stored descriptors.")


@dataclass(frozen=True)
class Task:
    """A named few-shot task (assay) — fs_mol/data/fsmol_task.py:84-144."""

    name: str
    samples: List[MoleculeDatapoint]

    def get_pos_neg_separated(self) -> Tuple[List[MoleculeDatapoint], List[MoleculeDatapoint]]:
        pos = [s for s in self.samples if s.bool_label]
        neg = [s for s in self.samples if not s.bool_label]
        return pos, neg

    @staticmethod
    def load_from_file(path: str) -> "Task":
        name = task_name_from_path(path)
        samples = []
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                samples.append(_parse_sample(json.loads(line), name))
        return Task(name, samples)

    def save_to_file(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "wt") as f:
            for s in self.samples:
                f.write(json.dumps(_serialize_sample(s)) + "\n")


def _parse_sample(raw: dict, task_name: str) -> MoleculeDatapoint:
    graph_data = raw.get("graph", {})
    fingerprint = raw.get("fingerprints")
    if fingerprint is not None:
        fingerprint = np.asarray(fingerprint, dtype=np.int32)
    descriptors = raw.get("descriptors")
    if descriptors is not None:
        descriptors = np.asarray(descriptors, dtype=np.float32)

    adjacency_lists = []
    for adj in graph_data.get("adjacency_lists", []):
        if len(adj) > 0:
            adjacency_lists.append(np.asarray(adj, dtype=np.int32))
        else:
            adjacency_lists.append(np.zeros((0, 2), dtype=np.int32))

    return MoleculeDatapoint(
        task_name=task_name,
        smiles=raw["SMILES"],
        bool_label=bool(float(raw["Property"])),
        numeric_label=float(raw.get("RegressionProperty") or "nan"),
        fingerprint=fingerprint,
        descriptors=descriptors,
        graph=GraphData(
            node_features=np.asarray(graph_data.get("node_features", []), dtype=np.float32),
            adjacency_lists=adjacency_lists,
            edge_features=[
                np.asarray(ef, dtype=np.float32)
                for ef in (graph_data.get("edge_features") or [])
            ],
        ),
    )


def _serialize_sample(s: MoleculeDatapoint) -> dict:
    return {
        "SMILES": s.smiles,
        "Property": "1.0" if s.bool_label else "0.0",
        "RegressionProperty": str(s.numeric_label),
        "graph": {
            "node_features": s.graph.node_features.tolist(),
            "adjacency_lists": [a.tolist() for a in s.graph.adjacency_lists],
        },
        "fingerprints": None if s.fingerprint is None else s.fingerprint.tolist(),
        "descriptors": None if s.descriptors is None else s.descriptors.tolist(),
    }


@dataclass(frozen=True)
class TaskSample:
    """Support/valid/query split of one task (fsmol_task.py:147-176)."""

    name: str
    train_samples: List[MoleculeDatapoint]
    valid_samples: List[MoleculeDatapoint]
    test_samples: List[MoleculeDatapoint]

    @staticmethod
    def _pos_fraction(samples: List[MoleculeDatapoint]) -> float:
        return sum(s.bool_label for s in samples) / len(samples)

    @property
    def train_pos_label_ratio(self) -> float:
        return self._pos_fraction(self.train_samples)

    @property
    def test_pos_label_ratio(self) -> float:
        return self._pos_fraction(self.test_samples)
