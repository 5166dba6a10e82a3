"""Assay cleaning — behavioral parity with
fs_mol/preprocessing/utils/cleaning_utils.py and clean.py.

Stages per assay CSV (ChEMBL export):
  1. unit/value filters (permitted units nM / uM / %);
  2. -log10 molar transform of standard values;
  3. contradictory-duplicate removal (same molecule, measurements more
     than 1 pXC unit — or 5% inhibition — apart are ALL dropped; close
     duplicates keep the first);
  4. auto or fixed activity thresholding with a buffer zone producing
     four-class activity strings (active / weak active / weak inactive /
     inactive); "weak" rows are the reference's buffer-zone "hard"
     labels;
  5. size/balance filters.

Pure pandas/numpy — no RDKit needed (molecule standardization lives in
preprocessing.standardizer and runs only when RDKit is available).
"""

from __future__ import annotations

import logging
import math
import os
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

STANDARD_UNIT_SET = {"nM", "%", "uM"}

RELATION_LESS = {"<", "<="}
RELATION_MORE = {">", ">="}
RELATION_EQUALS = {"=", "~"}


def has_permitted_units(units: str) -> bool:
    return units in STANDARD_UNIT_SET


def log_standard_value(value: float) -> float:
    """-log10([C] in M) from a nM standard value (cleaning_utils.py:40-46)."""
    if value is None or np.isnan(value) or value < 1e-13:
        return float("nan")
    return -1.0 * math.log10(value * 1e-9)


def activity_label(
    log_value: float, relation: str, threshold: float, buffer: float = 0.5
) -> Optional[str]:
    """Four-class label for pXC measurements (activity_threshold,
    cleaning_utils.py:54-88); relations resolve the buffer zone."""
    v = log_value
    if v >= threshold + buffer:
        return "active"
    if threshold < v < threshold + buffer:
        return "active" if relation in RELATION_LESS else "weak active"
    if threshold - buffer < v <= threshold:
        return "weak inactive" if relation in (RELATION_LESS | RELATION_EQUALS) else "inactive"
    if v <= threshold - buffer:
        return "inactive"
    return None


def inhibition_label(
    value: float, relation: str, threshold: float, buffer: float = 5.0
) -> Optional[str]:
    """Four-class label for % inhibition (inhibition_threshold,
    cleaning_utils.py:91-122) — note relations act on the raw value and
    the buffer-zone arms are mirrored vs the activity case."""
    v = value
    if v >= threshold + buffer:
        return "active"
    if threshold < v < threshold + buffer:
        return "active" if relation in RELATION_MORE else "weak active"
    if threshold - buffer < v <= threshold:
        return "weak inactive" if relation in (RELATION_MORE | RELATION_EQUALS) else "inactive"
    if v <= threshold - buffer:
        return "inactive"
    return None


def autothreshold(df: pd.DataFrame) -> Tuple[pd.DataFrame, float]:
    """Median-based threshold selection with sanity ranges
    (cleaning_utils.py:125-186): % inhibition uses median if >= 50 else
    50; activities use the median if within [5,7] for enzymes (by
    protein_class_desc) or [4,6] otherwise, else pXC 5.0. Buffer =
    std/10 of the thresholded quantity."""
    df = df.copy()
    if df.iloc[0]["standard_units"] == "%":
        median = df["standard_value"].median()
        threshold = median if median >= 50.0 else 50.0
        buffer = df["standard_value"].std() / 10
        df["activity_string"] = [
            inhibition_label(v, r, threshold, buffer)
            for v, r in zip(df["standard_value"], df["standard_relation"])
        ]
        return df, threshold

    median = df["log_standard_value"].median()
    limits = (4, 6)
    if "protein_class_desc" in df.columns:
        descs = [str(x) for x in df["protein_class_desc"].values]
        if any(("enzyme" in x) or ("ase" in x) for x in descs):
            limits = (5, 7)
    threshold = median if limits[0] <= median <= limits[1] else 5.0
    buffer = df["log_standard_value"].std() / 10
    df["activity_string"] = [
        activity_label(v, r, threshold, buffer)
        for v, r in zip(df["log_standard_value"], df["standard_relation"])
    ]
    return df, threshold


def fixedthreshold(df: pd.DataFrame) -> Tuple[pd.DataFrame, float]:
    """Fixed pXC 5.0 / 50% thresholds (cleaning_utils.py:189-208)."""
    df = df.copy()
    if df.iloc[0]["standard_units"] == "%":
        threshold = 50.0
        df["activity_string"] = [
            inhibition_label(v, r, threshold)
            for v, r in zip(df["standard_value"], df["standard_relation"])
        ]
    else:
        threshold = 5.0
        df["activity_string"] = [
            activity_label(v, r, threshold)
            for v, r in zip(df["log_standard_value"], df["standard_relation"])
        ]
    return df, threshold


def _contradictory(r1, r2) -> bool:
    """Same molecule, measurements too far apart (cleaning_utils.py:281-300):
    > 1.0 pXC units, or > 5% inhibition."""
    if r1["canonical_smiles"] != r2["canonical_smiles"]:
        return False
    if r1["standard_units"] == "%":
        return abs(r1["standard_value"] - r2["standard_value"]) > 5.0
    return abs(r1["log_standard_value"] - r2["log_standard_value"]) > 1.0


def remove_far_duplicates(df: pd.DataFrame) -> pd.DataFrame:
    """Drop every row belonging to a contradictory-duplicate cluster.

    Exact semantics of the reference (cleaning_utils.py:211-316 +
    drop_duplicates(keep=False)): within a molecule, rows more than
    1 pXC unit (or 5% inhibition) apart are linked; the TRANSITIVE
    CLOSURE of linked rows forms a partition, and all partitions of
    size > 1 are dropped entirely. Consistent duplicate measurements
    (close values) are all KEPT. Verified against the checked-in
    CHEMBL1001235 golden fixture."""
    keep_rows = []
    for _, group in df.groupby("canonical_smiles", sort=False):
        idxs = list(group.index)
        parent = {i: i for i in idxs}

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                if _contradictory(df.loc[idxs[a]], df.loc[idxs[b]]):
                    ra, rb = find(idxs[a]), find(idxs[b])
                    if ra != rb:
                        parent[ra] = rb
        from collections import Counter

        sizes = Counter(find(i) for i in idxs)
        keep_rows.extend(i for i in idxs if sizes[find(i)] == 1)
    return df.loc[sorted(keep_rows)]


@dataclass(frozen=True)
class CleaningConfig:
    use_fixed_threshold: bool = False
    min_size: int = 32
    max_size: Optional[int] = None
    balance_limits: Tuple[float, float] = (30.0, 70.0)
    hard_only: bool = False  # drop buffer-zone ("weak") measurements


def clean_assay(
    df: pd.DataFrame,
    config: CleaningConfig = CleaningConfig(),
    standardize_fn: Optional[Callable[[str], Optional[str]]] = None,
) -> Optional[pd.DataFrame]:
    """Full cleaning pipeline for one assay dataframe. Returns None if the
    assay is rejected (too small / too imbalanced / single unit check)."""
    df = df.copy()
    # canonical_smiles comes from the RDKit standardizer when available;
    # otherwise the raw SMILES column stands in (clean.py runs the
    # standardizer in an earlier pass).
    if "canonical_smiles" not in df.columns:
        df["canonical_smiles"] = df["smiles"]
    if standardize_fn is not None:
        df["canonical_smiles"] = df["canonical_smiles"].map(standardize_fn)
        df = df[~df["canonical_smiles"].isna()]
        if len(df) == 0:
            return None

    # 1. unit/value filters (clean.py:63,99)
    df = df[df["standard_units"].map(has_permitted_units)]
    df = df[~df["standard_value"].isna()]
    if len(df) == 0:
        return None

    # exact-duplicate measurements: keep first (clean.py:106)
    df = df.drop_duplicates(subset=["canonical_smiles", "standard_value"], keep="first")

    # uM -> nM unit conversion (clean.py:111-112)
    um = df["standard_units"] == "uM"
    df.loc[um, "standard_value"] = df.loc[um, "standard_value"] * 1000.0
    df.loc[um, "standard_units"] = "nM"
    if df["standard_units"].nunique() > 1:
        # only nM and % can remain; the reference treats an assay as one
        # measurement kind — keep the majority kind
        major = df["standard_units"].mode().iloc[0]
        df = df[df["standard_units"] == major]

    # 2. log transform (clean.py:114-118; % rows carry NaN)
    if df.iloc[0]["standard_units"] != "%":
        df["log_standard_value"] = df["standard_value"].map(log_standard_value)
        df = df[~df["log_standard_value"].isna()]
    else:
        df["log_standard_value"] = float("nan")
    if len(df) == 0:
        return None

    df["standard_relation"] = df["standard_relation"].fillna("=").map(
        lambda r: str(r).strip("'")
    )

    # 3. contradictory duplicates
    df = remove_far_duplicates(df)
    if len(df) == 0:
        return None

    # 4. thresholding
    threshold_fn = fixedthreshold if config.use_fixed_threshold else autothreshold
    df, threshold = threshold_fn(df)
    df = df[~df["activity_string"].isna()]
    if config.hard_only:
        df = df[df["activity_string"].isin(["active", "inactive"])]
    df["activity"] = df["activity_string"].map(
        {"active": 1.0, "weak active": 1.0, "weak inactive": 0.0, "inactive": 0.0}
    )
    df.attrs["threshold"] = threshold

    # 5. size / balance filters
    if len(df) < config.min_size:
        return None
    if config.max_size is not None and len(df) > config.max_size:
        df = df.iloc[: config.max_size]
    frac_active = 100.0 * df["activity"].mean()
    lo, hi = config.balance_limits
    if not (lo <= frac_active <= hi):
        return None
    return df


def process_assay_csv(
    in_path: str,
    out_dir: str,
    config: CleaningConfig = CleaningConfig(),
    standardize_fn=None,
) -> Optional[dict]:
    """Clean one assay CSV -> cleaned CSV + summary dict (clean.py:342-427)."""
    try:
        df = pd.read_csv(in_path)
    except Exception:  # noqa: BLE001
        logger.exception("unreadable assay csv %s", in_path)
        return None
    cleaned = clean_assay(df, config, standardize_fn)
    if cleaned is None:
        return None
    name = os.path.splitext(os.path.basename(in_path))[0]
    out_path = os.path.join(out_dir, f"{name}.csv")
    cleaned.to_csv(out_path, index=False)
    return {
        "chembl_id": name,
        "num_datapoints": len(cleaned),
        "threshold": cleaned.attrs.get("threshold"),
        "percentage_pos": 100.0 * cleaned["activity"].mean(),
    }


def process_all_assays(
    in_dir: str,
    out_dir: str,
    config: CleaningConfig = CleaningConfig(),
    num_processes: int = 0,
    standardize_fn=None,
) -> pd.DataFrame:
    """Map the cleaner over a directory of assay CSVs, optionally with a
    process pool (the reference's multiprocessing map, clean.py:342+);
    num_processes=0 runs in-process (SequentialWorkerPool equivalent)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".csv")
    )
    if num_processes and num_processes > 0:
        import multiprocessing as mp

        with mp.Pool(num_processes) as pool:
            summaries = pool.starmap(
                process_assay_csv, [(p, out_dir, config, standardize_fn) for p in paths]
            )
    else:
        summaries = [process_assay_csv(p, out_dir, config, standardize_fn) for p in paths]
    summaries = [s for s in summaries if s is not None]
    summary_df = pd.DataFrame(summaries)
    summary_df.to_csv(os.path.join(out_dir, "summary.csv"), index=False)
    return summary_df
