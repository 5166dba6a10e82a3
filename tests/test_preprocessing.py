"""Cleaning-pipeline tests (preprocessing/cleaning.py) — the reference's
only first-party test area (fs_mol/preprocessing/test/), rebuilt against
synthetic assay frames."""

import numpy as np
import pandas as pd
import pytest

from adkf_ift_tpu.preprocessing.cleaning import (
    CleaningConfig,
    activity_label,
    autothreshold,
    clean_assay,
    fixedthreshold,
    inhibition_label,
    log_standard_value,
    process_all_assays,
    remove_far_duplicates,
)


def _assay_df(n=60, seed=0, units="nM"):
    rng = np.random.RandomState(seed)
    # standard_value in nM; log_standard spans ~4-8 pXC
    values = 10 ** rng.uniform(1, 5, size=n)  # 10 nM .. 100 uM
    return pd.DataFrame(
        {
            "canonical_smiles": [f"C{i}" for i in range(n)],
            "standard_value": values,
            "standard_units": [units] * n,
            "standard_relation": ["="] * n,
        }
    )


def test_log_standard_value():
    assert abs(log_standard_value(1.0) - 9.0) < 1e-9  # 1 nM -> pXC 9
    assert abs(log_standard_value(1000.0) - 6.0) < 1e-9
    assert np.isnan(log_standard_value(float("nan")))
    assert np.isnan(log_standard_value(0.0))


def test_activity_label_buffer_zone_semantics():
    # Well above threshold: active regardless of relation.
    assert activity_label(6.0, "=", 5.0) == "active"
    # In upper buffer: '<' relations promote to active, '=' stays weak.
    assert activity_label(5.3, "<", 5.0) == "active"
    assert activity_label(5.3, "=", 5.0) == "weak active"
    assert activity_label(5.3, ">", 5.0) == "weak active"
    # In lower buffer: '>' demotes to inactive, '=' weak inactive.
    assert activity_label(4.8, ">", 5.0) == "inactive"
    assert activity_label(4.8, "=", 5.0) == "weak inactive"
    assert activity_label(4.0, "=", 5.0) == "inactive"


def test_inhibition_label_mirrored_relations():
    assert inhibition_label(80.0, "=", 50.0) == "active"
    assert inhibition_label(52.0, ">", 50.0) == "active"
    assert inhibition_label(52.0, "<", 50.0) == "weak active"
    assert inhibition_label(48.0, "<", 50.0) == "inactive"
    assert inhibition_label(48.0, ">", 50.0) == "weak inactive"
    assert inhibition_label(10.0, "=", 50.0) == "inactive"


def test_autothreshold_uses_median_within_limits():
    df = _assay_df()
    df["log_standard_value"] = df["standard_value"].map(log_standard_value)
    out, threshold = autothreshold(df)
    median = df["log_standard_value"].median()
    if 4 <= median <= 6:
        assert abs(threshold - median) < 1e-9
    assert set(out["activity_string"].dropna()) <= {
        "active", "weak active", "weak inactive", "inactive"
    }


def test_autothreshold_enzyme_limits():
    df = _assay_df(seed=1)
    df["log_standard_value"] = df["standard_value"].map(log_standard_value)
    df["protein_class_desc"] = "protein kinase"  # 'ase' => enzyme limits (5,7)
    median = df["log_standard_value"].median()
    _, threshold = autothreshold(df)
    expected = median if 5 <= median <= 7 else 5.0
    assert abs(threshold - expected) < 1e-9


def test_fixedthreshold():
    df = _assay_df()
    df["log_standard_value"] = df["standard_value"].map(log_standard_value)
    _, threshold = fixedthreshold(df)
    assert threshold == 5.0
    dfp = _assay_df(units="%")
    _, tp = fixedthreshold(dfp)
    assert tp == 50.0


def test_remove_far_duplicates_drops_contradictions_keeps_consistent():
    df = pd.DataFrame(
        {
            "canonical_smiles": ["A", "A", "B", "B", "C"],
            "standard_units": ["nM"] * 5,
            "standard_value": [10.0, 10.0, 10.0, 10.0, 10.0],
            "log_standard_value": [8.0, 6.5, 7.0, 7.2, 5.0],  # A contradicts (>1 apart)
            "standard_relation": ["="] * 5,
        }
    )
    out = remove_far_duplicates(df)
    smiles = set(out["canonical_smiles"])
    assert "A" not in smiles  # contradictory duplicates all dropped
    assert smiles == {"B", "C"}
    # Consistent duplicates are ALL kept (golden-verified reference
    # semantics; exact value duplicates are removed earlier in clean_assay).
    assert len(out[out["canonical_smiles"] == "B"]) == 2


def test_clean_assay_end_to_end_and_filters():
    df = _assay_df(n=80, seed=3)
    out = clean_assay(df, CleaningConfig(min_size=32, balance_limits=(1.0, 99.0)))
    assert out is not None
    assert {"activity", "activity_string", "log_standard_value"} <= set(out.columns)
    assert out.attrs["threshold"] > 0
    # Too-small assay rejected.
    assert clean_assay(df.iloc[:10], CleaningConfig(min_size=32)) is None
    # Disallowed units rejected.
    bad = df.copy()
    bad["standard_units"] = "mg/kg"
    assert clean_assay(bad) is None


def test_process_all_assays_writes_cleaned_csvs_and_summary(tmp_path):
    in_dir = tmp_path / "raw"
    in_dir.mkdir()
    for i in range(3):
        _assay_df(n=64, seed=i).to_csv(in_dir / f"CHEMBL{i}.csv", index=False)
    out_dir = tmp_path / "cleaned"
    summary = process_all_assays(
        str(in_dir), str(out_dir), CleaningConfig(min_size=32, balance_limits=(1.0, 99.0))
    )
    assert len(summary) >= 1
    assert (out_dir / "summary.csv").exists()
    for _, row in summary.iterrows():
        assert (out_dir / f"{row.chembl_id}.csv").exists()
        assert row.num_datapoints >= 32


def test_featurisation_golden_reference_fixture(tmp_path):
    """Featurise the reference's checked-in cleaned assay fixture
    (fs_mol/preprocessing/test/datasets/cleaned/CHEMBL1001235.csv) and
    check the invariants its golden test asserts
    (test_featurisation.py:48-70): all 21 datapoints featurise, with the
    FS-Mol wire schema (2048-d count fingerprints, 42 descriptors,
    adjacency by bond type) loadable as a Task. RDKit-gated."""
    import pytest

    pytest.importorskip("rdkit")
    import gzip
    import json
    import os

    import pandas as pd

    from adkf_ift_tpu.data.task import Task
    from adkf_ift_tpu.preprocessing.featurise import (
        FeaturisationMetadata,
        featurise_assay_df,
    )

    fixture = (
        "/root/reference/fs_mol/preprocessing/test/datasets/cleaned/CHEMBL1001235.csv"
    )
    if not os.path.exists(fixture):
        pytest.skip("reference fixture not present")
    df = pd.read_csv(fixture)
    assert len(df) == 21  # the reference's len_train_data assertion
    meta = FeaturisationMetadata.prepare_from_smiles(list(df["canonical_smiles"]))
    out = str(tmp_path / "CHEMBL1001235.jsonl.gz")
    written = featurise_assay_df(df, meta, out)
    assert written == 21

    with gzip.open(out, "rt") as f:
        records = [json.loads(line) for line in f]
    assert len(records) == 21
    for rec in records:
        assert len(rec["fingerprints"]) == 2048
        assert len(rec["descriptors"]) == 42
        assert len(rec["graph"]["adjacency_lists"]) >= 1
        assert rec["Property"] in ("0.0", "1.0")

    # The produced file round-trips through the training data layer.
    task = Task.load_from_file(out)
    assert len(task.samples) == 21
    assert {s.bool_label for s in task.samples} == {True, False}
