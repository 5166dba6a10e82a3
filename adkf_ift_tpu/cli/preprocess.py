"""Preprocessing pipeline CLIs — the reference's fs_mol/preprocessing
clean.py / featurize.py entry points (README.preprocess.md stages 2-3)."""

from __future__ import annotations

import argparse
import logging

from adkf_ift_tpu.preprocessing.cleaning import CleaningConfig, process_all_assays
from adkf_ift_tpu.utils.logging import set_up_logging

logger = logging.getLogger(__name__)


def clean_main(argv=None):
    parser = argparse.ArgumentParser(
        description="Clean raw ChEMBL assay CSVs (reference clean.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("INPUT_DIR", type=str, help="Directory of raw assay CSVs.")
    parser.add_argument("OUTPUT_DIR", type=str, help="Where cleaned CSVs + summary.csv go.")
    parser.add_argument("--fixed-threshold", action="store_true",
                        help="pXC 5.0 / 50%% instead of autothresholding.")
    parser.add_argument("--min-size", type=int, default=32)
    parser.add_argument("--max-size", type=int, default=None)
    parser.add_argument("--balance-min", type=float, default=30.0)
    parser.add_argument("--balance-max", type=float, default=70.0)
    parser.add_argument("--hard-only", action="store_true",
                        help="Drop buffer-zone ('weak') measurements.")
    parser.add_argument("--num-processes", type=int, default=0)
    parser.add_argument("--standardize", action="store_true",
                        help="RDKit molecule standardization (tautomers etc.).")
    args = parser.parse_args(argv)

    set_up_logging()
    standardize_fn = None
    if args.standardize:
        from adkf_ift_tpu.preprocessing.standardizer import make_standardizer

        standardize_fn = make_standardizer()
    config = CleaningConfig(
        use_fixed_threshold=args.fixed_threshold,
        min_size=args.min_size,
        max_size=args.max_size,
        balance_limits=(args.balance_min, args.balance_max),
        hard_only=args.hard_only,
    )
    summary = process_all_assays(
        args.INPUT_DIR, args.OUTPUT_DIR, config,
        num_processes=args.num_processes, standardize_fn=standardize_fn,
    )
    logger.info("cleaned %d assays -> %s", len(summary), args.OUTPUT_DIR)


def featurize_main(argv=None):
    parser = argparse.ArgumentParser(
        description="Featurise cleaned assay CSVs into FS-Mol JSONL.gz tasks "
        "(reference featurize.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("CLEANED_DIR", type=str)
    parser.add_argument("OUTPUT_DIR", type=str)
    parser.add_argument("--metadata", type=str, default=None,
                        help="Existing featurisation_metadata.json (fixes the "
                        "feature space across datasets).")
    parser.add_argument("--fold-json", type=str, default=None,
                        help="JSON {train: [...], valid: [...], test: [...]} "
                        "task split; default puts everything in train/.")
    args = parser.parse_args(argv)

    set_up_logging()
    from adkf_ift_tpu.preprocessing.featurise import (
        FeaturisationMetadata,
        featurise_directory,
    )

    meta = FeaturisationMetadata.load(args.metadata) if args.metadata else None
    fold_fn = None
    if args.fold_json:
        import json

        with open(args.fold_json) as f:
            folds = json.load(f)
        name_to_fold = {n: fold for fold, names in folds.items() for n in names}
        fold_fn = lambda name: name_to_fold.get(name, "train")
    counts = featurise_directory(args.CLEANED_DIR, args.OUTPUT_DIR, meta, fold_fn)
    logger.info("featurised %d tasks (%d molecules)", len(counts), sum(counts.values()))


if __name__ == "__main__":
    clean_main()
