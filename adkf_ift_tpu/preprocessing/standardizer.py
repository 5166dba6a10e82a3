"""Molecule standardizer — parity with
fs_mol/preprocessing/utils/standardizer.py:41-244 (RDKit-based: sanitize,
strip salts to the largest fragment, neutralize charges, canonicalize
tautomers, re-canonicalize SMILES). RDKit is optional: `make_standardizer`
raises a clear ImportError when it is absent."""

from __future__ import annotations

import logging
from typing import Callable, Optional

logger = logging.getLogger(__name__)


def make_standardizer(
    canonicalize_tautomer: bool = True,
    max_atoms: int = 100,
) -> Callable[[str], Optional[str]]:
    """Returns smiles -> standardized canonical smiles (or None on failure)."""
    try:
        from rdkit import Chem
        from rdkit.Chem.MolStandardize import rdMolStandardize
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "RDKit is required for molecule standardization (preprocessing "
            "only; the training path reads preprocessed JSONL)."
        ) from e

    fragment_chooser = rdMolStandardize.LargestFragmentChooser()
    uncharger = rdMolStandardize.Uncharger()
    tautomer_enumerator = rdMolStandardize.TautomerEnumerator() if canonicalize_tautomer else None

    def standardize(smiles: str) -> Optional[str]:
        try:
            mol = Chem.MolFromSmiles(smiles)
            if mol is None:
                return None
            mol = rdMolStandardize.Cleanup(mol)
            mol = fragment_chooser.choose(mol)
            mol = uncharger.uncharge(mol)
            if mol.GetNumAtoms() > max_atoms:
                return None
            if tautomer_enumerator is not None:
                mol = tautomer_enumerator.Canonicalize(mol)
            return Chem.MolToSmiles(mol)
        except Exception:  # noqa: BLE001 — RDKit raises many C++ error types
            logger.debug("standardization failed for %s", smiles)
            return None

    return standardize
