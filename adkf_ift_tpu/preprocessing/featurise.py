"""SMILES -> FS-Mol graph featurisation — parity with
fs_mol/preprocessing/featurisers/** (featurisers.py:29-368,
molgraph_utils.py:81-209): metadata-driven atom feature extractors so the
feature space is FIXED across datasets, typed-edge adjacency by bond
order, Morgan count fingerprints and phys-chem descriptors, and the
train/valid/test JSONL-gz writer (save_utils.py).

Metadata here is a plain JSON vocabulary ({feature: values}) instead of
the reference's pickled extractor objects — functionally identical
(unknown values map to slot 0) and robust to library versions. RDKit is
gated at call time.
"""

from __future__ import annotations

import gzip
import json
import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

# The FS-Mol atom feature layout (32 dims total, NUM_NODE_FEATURES):
# one-hot atom type vocabulary + scalar/one-hot chemistry features.
DEFAULT_ATOM_TYPES = [
    "UNK", "C", "N", "O", "S", "F", "Cl", "Br", "I", "P",
    "B", "Si", "Se", "Na", "K", "Li", "Ca", "Mg", "Zn", "Al",
]


def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401

        return Chem
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "RDKit is required for featurisation (preprocessing only)."
        ) from e


@dataclass
class FeaturisationMetadata:
    """Fixed vocabularies for categorical atom features."""

    atom_types: List[str] = field(default_factory=lambda: list(DEFAULT_ATOM_TYPES))
    max_degree: int = 5
    charges: List[int] = field(default_factory=lambda: [-1, 0, 1])

    @property
    def feature_dim(self) -> int:
        # type onehot + degree onehot (0..max) + charge onehot + radical,
        # isotope, mass, valence, numH, aromatic, in-ring
        return len(self.atom_types) + (self.max_degree + 1) + len(self.charges) + 7

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {"atom_types": self.atom_types, "max_degree": self.max_degree, "charges": self.charges},
                f,
            )

    @staticmethod
    def load(path: str) -> "FeaturisationMetadata":
        with open(path) as f:
            d = json.load(f)
        return FeaturisationMetadata(d["atom_types"], d["max_degree"], d["charges"])

    @staticmethod
    def prepare_from_smiles(smiles_list: List[str]) -> "FeaturisationMetadata":
        """Build vocabularies from training data (the reference's
        prepare_metadata pass over all training atoms)."""
        Chem = _require_rdkit()
        seen = set()
        for smi in smiles_list:
            mol = Chem.MolFromSmiles(smi)
            if mol is None:
                continue
            for atom in mol.GetAtoms():
                seen.add(atom.GetSymbol())
        types = ["UNK"] + sorted(seen)
        return FeaturisationMetadata(atom_types=types)


def featurise_atom(atom, meta: FeaturisationMetadata) -> np.ndarray:
    out = np.zeros((meta.feature_dim,), np.float32)
    i = 0
    sym = atom.GetSymbol()
    idx = meta.atom_types.index(sym) if sym in meta.atom_types else 0
    out[i + idx] = 1.0
    i += len(meta.atom_types)
    deg = min(atom.GetDegree(), meta.max_degree)
    out[i + deg] = 1.0
    i += meta.max_degree + 1
    charge = atom.GetFormalCharge()
    if charge in meta.charges:
        out[i + meta.charges.index(charge)] = 1.0
    i += len(meta.charges)
    out[i] = float(atom.GetNumRadicalElectrons())
    out[i + 1] = float(atom.GetIsotope() > 0)
    out[i + 2] = atom.GetMass() / 100.0
    out[i + 3] = float(atom.GetTotalValence()) / 8.0
    out[i + 4] = float(atom.GetTotalNumHs()) / 8.0
    out[i + 5] = float(atom.GetIsAromatic())
    out[i + 6] = float(atom.IsInRing())
    return out


def molecule_to_graph(mol, meta: FeaturisationMetadata) -> Dict:
    """RDKit mol -> {node_features, adjacency_lists} with 3 edge types
    (single/aromatic, double, triple — molgraph_utils.py:81-209)."""
    from rdkit import Chem

    node_features = [featurise_atom(a, meta).tolist() for a in mol.GetAtoms()]
    adjacency: List[List[List[int]]] = [[], [], []]
    order_to_type = {
        Chem.BondType.SINGLE: 0,
        Chem.BondType.AROMATIC: 0,
        Chem.BondType.DOUBLE: 1,
        Chem.BondType.TRIPLE: 2,
    }
    for bond in mol.GetBonds():
        t = order_to_type.get(bond.GetBondType(), 0)
        adjacency[t].append([bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()])
    return {"node_features": node_features, "adjacency_lists": adjacency}


def morgan_count_fingerprint(mol, dim: int = 2048, radius: int = 2) -> np.ndarray:
    from rdkit.Chem import rdFingerprintGenerator

    gen = rdFingerprintGenerator.GetMorganGenerator(radius=radius, fpSize=dim)
    counts = gen.GetCountFingerprint(mol)
    out = np.zeros((dim,), np.int32)
    for idx, c in counts.GetNonzeroElements().items():
        out[idx % dim] = c
    return out


# 42 phys-chem descriptors (FS-Mol's descriptor block, DESCRIPTOR_DIM=42).
PHYS_CHEM_DESCRIPTORS = [
    "MolWt", "HeavyAtomMolWt", "ExactMolWt", "NumValenceElectrons",
    "FractionCSP3", "HeavyAtomCount", "NHOHCount", "NOCount",
    "NumAliphaticCarbocycles", "NumAliphaticHeterocycles", "NumAliphaticRings",
    "NumAromaticCarbocycles", "NumAromaticHeterocycles", "NumAromaticRings",
    "NumHAcceptors", "NumHDonors", "NumHeteroatoms", "NumRotatableBonds",
    "NumSaturatedCarbocycles", "NumSaturatedHeterocycles", "NumSaturatedRings",
    "RingCount", "MolLogP", "MolMR", "TPSA", "LabuteASA",
    "BalabanJ", "BertzCT", "Chi0", "Chi0n", "Chi0v", "Chi1", "Chi1n", "Chi1v",
    "Chi2n", "Chi2v", "Chi3n", "Chi3v", "Chi4n", "Chi4v",
    "HallKierAlpha", "Kappa1",
]


def phys_chem_descriptors(mol) -> np.ndarray:
    from rdkit.Chem import Descriptors

    table = dict(Descriptors._descList)
    out = np.zeros((len(PHYS_CHEM_DESCRIPTORS),), np.float32)
    for i, name in enumerate(PHYS_CHEM_DESCRIPTORS):
        fn = table.get(name)
        if fn is not None:
            try:
                out[i] = float(fn(mol))
            except Exception:  # noqa: BLE001
                out[i] = 0.0
    return out


def featurise_smiles(
    smiles: str,
    meta: FeaturisationMetadata,
    activity: float,
    regression_property: Optional[float] = None,
) -> Optional[dict]:
    """One molecule -> FS-Mol JSONL record (the wire format of
    fs_mol/data/fsmol_task.py, identical to the reference's store)."""
    Chem = _require_rdkit()
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    return {
        "SMILES": smiles,
        "Property": str(float(activity)),
        "RegressionProperty": str(
            regression_property if regression_property is not None else float("nan")
        ),
        "graph": molecule_to_graph(mol, meta),
        "fingerprints": morgan_count_fingerprint(mol).tolist(),
        "descriptors": phys_chem_descriptors(mol).tolist(),
    }


def featurise_assay_df(
    df,
    meta: FeaturisationMetadata,
    out_path: str,
    smiles_col: str = "canonical_smiles",
    activity_col: str = "activity",
    regression_col: str = "log_standard_value",
) -> int:
    """Cleaned assay dataframe -> one gzipped JSONL task file."""
    written = 0
    with gzip.open(out_path, "wt") as f:
        for _, row in df.iterrows():
            rec = featurise_smiles(
                row[smiles_col], meta, row[activity_col],
                row.get(regression_col) if hasattr(row, "get") else row[regression_col],
            )
            if rec is None:
                continue
            f.write(json.dumps(rec) + "\n")
            written += 1
    return written


def featurise_directory(
    cleaned_dir: str,
    out_root: str,
    meta: Optional[FeaturisationMetadata] = None,
    fold_fn=None,
) -> Dict[str, int]:
    """Featurise every cleaned assay CSV into {out_root}/{fold}/{name}.jsonl.gz.
    fold_fn(task_name) -> 'train' | 'valid' | 'test' (default: all train)."""
    import pandas as pd

    names = sorted(f for f in os.listdir(cleaned_dir) if f.endswith(".csv") and f != "summary.csv")
    if meta is None:
        all_smiles: List[str] = []
        for n in names:
            all_smiles.extend(pd.read_csv(os.path.join(cleaned_dir, n))["canonical_smiles"])
        meta = FeaturisationMetadata.prepare_from_smiles(all_smiles)
    os.makedirs(out_root, exist_ok=True)
    meta.save(os.path.join(out_root, "featurisation_metadata.json"))

    counts: Dict[str, int] = {}
    for n in names:
        task_name = os.path.splitext(n)[0]
        fold = fold_fn(task_name) if fold_fn else "train"
        fold_dir = os.path.join(out_root, fold)
        os.makedirs(fold_dir, exist_ok=True)
        df = pd.read_csv(os.path.join(cleaned_dir, n))
        counts[task_name] = featurise_assay_df(
            df, meta, os.path.join(fold_dir, f"{task_name}.jsonl.gz")
        )
    return counts
