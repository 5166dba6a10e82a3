"""GOLDEN tests against the reference's checked-in real-data fixtures:
our cleaning pipeline must reproduce the reference's cleaned outputs
EXACTLY (rows kept, activity labels, log values, threshold) on the two
real ChEMBL assays shipped in fs_mol/preprocessing/test/datasets."""

import os

import numpy as np
import pandas as pd
import pytest

from adkf_ift_tpu.preprocessing.cleaning import CleaningConfig, clean_assay

_FIXTURES = "/root/reference/fs_mol/preprocessing/test/datasets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_FIXTURES), reason="reference fixtures not mounted"
)

_WIDE = CleaningConfig(min_size=1, balance_limits=(0.0, 100.0))


def _compare(raw_path: str, golden_path: str):
    raw = pd.read_csv(raw_path)
    golden = pd.read_csv(golden_path)
    ours = clean_assay(raw, _WIDE)
    assert ours is not None
    assert len(ours) == len(golden), (len(ours), len(golden))
    np.testing.assert_allclose(
        ours.attrs["threshold"], golden["threshold"].iloc[0], rtol=1e-12
    )
    ours_rows = sorted(
        zip(ours["canonical_smiles"], ours["activity"], ours["log_standard_value"].round(9))
    )
    golden_rows = sorted(
        zip(golden["canonical_smiles"], golden["activity"], golden["log_standard_value"].round(9))
    )
    assert ours_rows == golden_rows


def test_chembl1001235_golden():
    _compare(
        os.path.join(_FIXTURES, "raw", "CHEMBL1001235.csv"),
        os.path.join(_FIXTURES, "cleaned", "CHEMBL1001235.csv"),
    )


def test_chembl1002396_golden():
    _compare(
        os.path.join(_FIXTURES, "CHEMBL1002396_raw.csv"),
        os.path.join(_FIXTURES, "CHEMBL1002396_processed.csv"),
    )
