"""Dataset statistics — the reference's compute_stats.py: per-fold task
counts, sample counts, positive fractions, numeric-label summaries,
written to a JSON file. SMILES canonicalization uses RDKit when
available and falls back to raw SMILES otherwise (RDKit is only a
preprocessing-time dependency, SURVEY.md §2.9 item 7)."""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

from adkf_ift_tpu.cli.cli_utils import add_data_cli_args, set_seed
from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset

logger = logging.getLogger(__name__)

try:  # pragma: no cover - environment dependent
    from rdkit import Chem

    def _canonical(smiles: str) -> str:
        mol = Chem.MolFromSmiles(smiles)
        return Chem.MolToSmiles(mol) if mol is not None else smiles

except ImportError:  # rdkit not installed

    def _canonical(smiles: str) -> str:
        return smiles


def parse_command_line(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute simple dataset statistics.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_data_cli_args(parser)
    parser.add_argument("OUTPUT_PATH", type=str, help="JSON dictionary file to save stats.")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    set_seed(args.seed)
    dataset = FSMolDataset.from_directory(args.DATA_PATH, task_list_file=args.task_list_file)

    stats = {}
    all_smiles = set()
    for fold in DataFold:
        fold_stats = []
        for task in dataset.get_task_reading_iterable(fold):
            smiles = [_canonical(s.smiles) for s in task.samples]
            all_smiles.update(smiles)
            labels = np.asarray([s.numeric_label for s in task.samples], np.float64)
            fold_stats.append(
                {
                    "task_name": task.name,
                    "num_samples": len(task.samples),
                    "frac_positive": float(
                        np.mean([s.bool_label for s in task.samples])
                    ),
                    "numeric_label_mean": float(np.nanmean(labels)) if len(labels) else None,
                    "numeric_label_std": float(np.nanstd(labels)) if len(labels) else None,
                }
            )
        stats[fold.name.lower()] = {
            "num_tasks": len(fold_stats),
            "num_samples": int(sum(t["num_samples"] for t in fold_stats)),
            "tasks": fold_stats,
        }
    stats["num_unique_molecules"] = len(all_smiles)

    with open(args.OUTPUT_PATH, "w") as f:
        json.dump(stats, f, indent=2)
    logger.info("wrote stats to %s", args.OUTPUT_PATH)


if __name__ == "__main__":
    main()
