"""Molecule standardizer — parity with
fs_mol/preprocessing/utils/standardizer.py:41-244 (the Paolo Tosco
Standardizer): the full charge_parent sequence (RemoveHs with isotope
tracking -> optional MetalDisconnector -> Normalizer -> Sanitize ->
Reionizer -> AssignStereochemistry -> LargestFragmentChooser ->
Uncharger -> Sanitize -> AddHs/RemoveHs round-trip) followed by optional
tautomer canonicalization under the reference's CleanupParameters
(maxTautomers/maxTransforms 100, maxRestarts 200, preferOrganic,
tautomerRemoveSp3Stereo=False). RDKit is optional: `make_standardizer`
raises a clear ImportError when it is absent."""

from __future__ import annotations

import logging
from typing import Callable, Optional, Tuple

logger = logging.getLogger(__name__)

MAX_TAUTOMERS = 100
MAX_TRANSFORMS = 100
MAX_RESTARTS = 200
PREFER_ORGANIC = True


class Standardizer:
    """Stateful standardizer mirroring the reference's operation sequence
    (standardizer.py:101-176). Heavy RDKit helper objects build lazily and
    are reused across molecules."""

    def __init__(self, metal_disconnect: bool = False, canon_taut: bool = False):
        try:
            from rdkit import Chem, RDLogger  # noqa: F401
            from rdkit.Chem.MolStandardize import rdMolStandardize  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError(
                "RDKit is required for molecule standardization (preprocessing "
                "only; the training path reads preprocessed JSONL)."
            ) from e
        self._Chem = Chem
        self._rms = rdMolStandardize
        RDLogger.logger().setLevel(RDLogger.CRITICAL)
        self.metal_disconnect = metal_disconnect
        self.canon_taut = canon_taut
        self._params = None
        self._cache: dict = {}

    @property
    def params(self):
        """The reference's CleanupParameters (standardizer.py:86-97)."""
        if self._params is None:
            p = self._rms.CleanupParameters()
            p.maxTautomers = MAX_TAUTOMERS
            p.maxTransforms = MAX_TRANSFORMS
            p.maxRestarts = MAX_RESTARTS
            p.preferOrganic = PREFER_ORGANIC
            p.tautomerRemoveSp3Stereo = False
            self._params = p
        return self._params

    def _tool(self, name):
        if name not in self._cache:
            rms = self._rms
            builders = {
                "taut": lambda: rms.TautomerEnumerator(self.params),
                "uncharger": lambda: rms.Uncharger(),
                "lfrag": lambda: rms.LargestFragmentChooser(self.params.preferOrganic),
                "metal": lambda: rms.MetalDisconnector(),
                "normalizer": lambda: rms.Normalizer(
                    self.params.normalizationsFile, self.params.maxRestarts
                ),
                "reionizer": lambda: rms.Reionizer(self.params.acidbaseFile),
            }
            self._cache[name] = builders[name]()
        return self._cache[name]

    def charge_parent(self, mol):
        """Metal-disconnect -> normalize -> reionize -> largest fragment ->
        uncharge; returns a desalted, normalized, neutral molecule with
        implicit Hs (standardizer.py:152-176)."""
        Chem = self._Chem
        params = Chem.RemoveHsParameters()
        params.removeAndTrackIsotopes = True
        mol = Chem.RemoveHs(mol, params, sanitize=False)
        if self.metal_disconnect:
            mol = self._tool("metal").Disconnect(mol)
        normalized = self._tool("normalizer").normalize(mol)
        Chem.SanitizeMol(normalized)
        normalized = self._tool("reionizer").reionize(normalized)
        Chem.AssignStereochemistry(normalized)
        normalized = self._tool("lfrag").choose(normalized)
        normalized = self._tool("uncharger").uncharge(normalized)
        # Reassess aromaticity (cyclopentadienyl, tropylium, azolium, ...).
        Chem.SanitizeMol(normalized)
        return Chem.RemoveHs(Chem.AddHs(normalized))

    def standardize_mol(self, mol) -> Tuple[Optional[object], object]:
        """(standardized Mol, n_tautomers) on success — n_tautomers
        negative if enumeration hit a limit — or (None, error message)
        (standardizer.py:177-244)."""
        n_tautomers = 0
        try:
            mol_out = self.charge_parent(mol)
        except Exception as e:  # noqa: BLE001 — RDKit raises many C++ types
            return None, f"charge_parent FAILED: {str(e).strip()}"
        if self.canon_taut:
            try:
                res = self._tool("taut").Enumerate(mol_out, False)
            except TypeError:
                res = self._tool("taut").Enumerate(mol_out)
            except Exception as e:  # noqa: BLE001
                return None, f"canon_taut FAILED: {str(e).strip()}"
            n_tautomers = len(res)
            completed = (
                res.status == self._rms.TautomerEnumeratorStatus.Completed
                if hasattr(res, "status")
                else len(res) < 1000
            )
            if not completed:
                n_tautomers = -n_tautomers
            try:
                mol_out = self._tool("taut").PickCanonical(res)
            except Exception as e:  # noqa: BLE001
                return None, f"canon_taut FAILED: {str(e).strip()}"
        return mol_out, n_tautomers


def make_standardizer(
    canonicalize_tautomer: bool = True,
    max_atoms: int = 100,
    metal_disconnect: bool = True,
) -> Callable[[str], Optional[str]]:
    """Returns smiles -> standardized canonical smiles (or None on
    failure) over the full reference operation sequence."""
    std = Standardizer(metal_disconnect=metal_disconnect, canon_taut=canonicalize_tautomer)
    Chem = std._Chem

    def standardize(smiles: str) -> Optional[str]:
        try:
            mol = Chem.MolFromSmiles(smiles)
            if mol is None:
                return None
            mol_out, info = std.standardize_mol(mol)
            if mol_out is None:
                logger.debug("standardization failed for %s: %s", smiles, info)
                return None
            if mol_out.GetNumAtoms() > max_atoms:
                return None
            return Chem.MolToSmiles(mol_out)
        except Exception:  # noqa: BLE001
            logger.debug("standardization failed for %s", smiles)
            return None

    return standardize
