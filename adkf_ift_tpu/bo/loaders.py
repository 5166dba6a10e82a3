"""Design-task dataset loaders — parity with bayes_opt/bo_utils.py:73-323:
antibiotics (Stokes et al. xlsx), COVID moonshot, dockstring-ESR2, and
CEP organic photovoltaics, each loaded into an FS-Mol `Task` with graphs,
count fingerprints and descriptors. RDKit-gated (featurisation happens at
load time, like the reference)."""

from __future__ import annotations

import logging
import math
from typing import List, Optional

import numpy as np

from adkf_ift_tpu.data.task import GraphData, MoleculeDatapoint, Task
from adkf_ift_tpu.preprocessing.featurise import (
    FeaturisationMetadata,
    _require_rdkit,
    molecule_to_graph,
    morgan_count_fingerprint,
    phys_chem_descriptors,
)

logger = logging.getLogger(__name__)


def unit_factor(unit: str) -> float:
    units = ["mm", "um", "nm", "pm"]
    pos = units.index(unit.lower()) + 1
    return 10 ** -(pos * 3)


def pic50(ic50: float, unit: str = "um") -> float:
    """pIC50 from IC50 (bo_utils.py:65-71)."""
    if unit is not None:
        ic50 *= unit_factor(unit)
    return float(-math.log10(ic50))


def _smiles_to_datapoint(
    task_name: str,
    smiles: str,
    numeric_label: float,
    bool_label: bool,
    meta: FeaturisationMetadata,
) -> Optional[MoleculeDatapoint]:
    Chem = _require_rdkit()
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    smiles = Chem.MolToSmiles(mol)
    g = molecule_to_graph(mol, meta)
    adjacency = [
        np.asarray(a, np.int32) if len(a) else np.zeros((0, 2), np.int32)
        for a in g["adjacency_lists"]
    ]
    return MoleculeDatapoint(
        task_name=task_name,
        smiles=smiles,
        graph=GraphData(
            node_features=np.asarray(g["node_features"], np.float32),
            adjacency_lists=adjacency,
        ),
        numeric_label=float(numeric_label),
        bool_label=bool(bool_label),
        fingerprint=morgan_count_fingerprint(mol),
        descriptors=phys_chem_descriptors(mol),
    )


def _build_task(name: str, rows, meta: Optional[FeaturisationMetadata]) -> Task:
    meta = meta or FeaturisationMetadata()
    samples: List[MoleculeDatapoint] = []
    for smiles, numeric, boolean in rows:
        dp = _smiles_to_datapoint(name, smiles, numeric, boolean, meta)
        if dp is not None:
            samples.append(dp)
    logger.info("%s: %d molecules featurised", name, len(samples))
    return Task(name, samples)


def load_antibiotics_dataset(xlsx_file: str, meta=None) -> Task:
    """Stokes et al. antibiotics growth-inhibition screen (sheet S1B;
    bo_utils.py:73-129). Lower mean inhibition = more active."""
    import pandas as pd

    df = pd.read_excel(xlsx_file, sheet_name="S1B", header=1)
    rows = [
        (str(r["SMILES"]).strip(), float(r["Mean_Inhibition"]), r["Activity"] == "Active")
        for _, r in df.iterrows()
    ]
    return _build_task("antibiotics", rows, meta)


def load_covid_moonshot_dataset(csv_file: str, meta=None) -> Task:
    """COVID moonshot SARS-CoV-2 Mpro IC50s -> pIC50 (bo_utils.py:131-195)."""
    import pandas as pd

    df = pd.read_csv(csv_file)
    rows = []
    for _, r in df.iterrows():
        ic50 = r.get("f_avg_IC50")
        if ic50 is None or (isinstance(ic50, float) and math.isnan(ic50)):
            continue
        value = pic50(float(ic50), unit="um")
        rows.append((str(r["SMILES"]).strip(), value, value > 5.0))
    return _build_task("covid_moonshot", rows, meta)


def load_dockstring_dataset(csv_file: str, meta=None, target: str = "ESR2") -> Task:
    """Dockstring docking scores for a target column (bo_utils.py:197-258);
    lower score = better."""
    import pandas as pd

    df = pd.read_csv(csv_file)
    rows = []
    for _, r in df.iterrows():
        score = r.get(target)
        if score is None or (isinstance(score, float) and math.isnan(score)):
            continue
        rows.append((str(r["smiles"]).strip(), float(score), float(score) < -7.0))
    return _build_task(f"dockstring_{target}", rows, meta)


def load_cep_dataset(csv_file: str, meta=None) -> Task:
    """CEP organic-photovoltaics PCE values (bo_utils.py:260-323);
    higher PCE = better (the BO loop minimizes -PCE)."""
    import pandas as pd

    df = pd.read_csv(csv_file)
    smiles_col = "smiles" if "smiles" in df.columns else "SMILES"
    value_col = "PCE" if "PCE" in df.columns else "pce"
    rows = [
        (str(r[smiles_col]).strip(), float(r[value_col]), float(r[value_col]) > 5.0)
        for _, r in df.iterrows()
        if not math.isnan(float(r[value_col]))
    ]
    return _build_task("cep", rows, meta)
