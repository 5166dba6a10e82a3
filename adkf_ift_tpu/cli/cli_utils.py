"""Shared CLI plumbing — parity with fs_mol/utils/cli_utils.py:23-115
and fs_mol/utils/test_utils.py:49-162.

Configs remain frozen dataclasses assembled from flags and ride inside
checkpoints (self-describing, like the reference); there are no config
files.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import random
import time
from typing import Optional, Tuple

import numpy as np

from adkf_ift_tpu.data.dataset import FSMolDataset
from adkf_ift_tpu.utils.logging import set_up_logging

logger = logging.getLogger(__name__)


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def set_seed(seed: int) -> None:
    """Seed python/numpy (device randomness flows through explicit
    jax.random keys derived from the same seed)."""
    random.seed(seed)
    np.random.seed(seed)


def add_train_cli_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "DATA_PATH",
        type=str,
        help="Directory containing the task data in train/valid/test subdirectories.",
    )
    parser.add_argument(
        "--task-list-file",
        default=None,
        type=str,
        help="JSON file listing the tasks per fold (datasets/fsmol-0.1.json style).",
    )
    parser.add_argument(
        "--save-dir",
        type=str,
        default="outputs",
        help="Path in which to store results and logs.",
    )
    parser.add_argument("--seed", type=int, default=0, help="Random seed to use.")


def add_data_cli_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "DATA_PATH",
        type=str,
        help=(
            "Directory containing the test data (with a test/ subdirectory),"
            " filtered by --task-list-file if given."
        ),
    )
    parser.add_argument(
        "--task-list-file",
        default=None,
        type=str,
        help="JSON file listing the tasks per fold.",
    )


def add_eval_cli_args(parser: argparse.ArgumentParser) -> None:
    add_data_cli_args(parser)
    parser.add_argument(
        "--save-dir", type=str, default="outputs", help="Where to store eval CSVs and logs."
    )
    parser.add_argument(
        "--num-runs", type=int, default=10, help="Number of runs with different data splits."
    )
    parser.add_argument("--seed", type=int, default=0, help="Random seed to use.")
    parser.add_argument(
        "--train-sizes",
        type=json.loads,
        default=[16, 32, 64, 128, 256],
        help="JSON list of support-set sizes to sample.",
    )
    parser.add_argument(
        "--test-size",
        type=int,
        default=None,
        help="Number of query samples; default = all remaining after the support split.",
    )
    parser.add_argument(
        "--reuse-run-dir",
        type=str,
        default=None,
        help="Resume a partial eval: write into this existing run directory "
        "and skip tasks whose per-task CSV is already present (crash "
        "tolerance for long sweeps; capability the reference lacks).",
    )


def add_walltime_cli_args(parser: argparse.ArgumentParser) -> None:
    from adkf_ift_tpu.cli._episodic import add_layout_args

    add_data_cli_args(parser)
    parser.add_argument("--save-dir", type=str, default="outputs")
    parser.add_argument("--num-runs", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--train-sizes", type=json.loads, default=[64])
    parser.add_argument("--test-size", type=int, default=None)
    parser.add_argument("--query-budget", type=int, default=256)
    add_layout_args(parser)


def set_up_run(
    model_name: str,
    kind: str,
    args: argparse.Namespace,
) -> Tuple[str, FSMolDataset]:
    """Seed, output dir, logging, dataset (set_up_train_run /
    set_up_test_run, cli_utils.py:56-84 / test_utils.py:146-162)."""
    set_seed(args.seed)
    reuse = getattr(args, "reuse_run_dir", None)
    if reuse:
        out_dir = reuse
        run_name = os.path.basename(os.path.normpath(out_dir))
    else:
        run_name = f"FSMol_{kind}_{model_name}__{time.strftime('%Y-%m-%d_%H-%M-%S')}"
        out_dir = os.path.join(args.save_dir, run_name)
    os.makedirs(out_dir, exist_ok=True)
    set_up_logging(os.path.join(out_dir, f"{kind}.log"))
    logger.info("Run %s, output in %s", run_name, out_dir)

    dataset = FSMolDataset.from_directory(
        args.DATA_PATH, task_list_file=args.task_list_file
    )
    return out_dir, dataset


def set_up_train_run(model_name: str, args) -> Tuple[str, FSMolDataset]:
    return set_up_run(model_name, "train", args)


def set_up_test_run(model_name: str, args) -> Tuple[str, FSMolDataset]:
    return set_up_run(model_name, "eval", args)


def resolve_model_file(trained_model: Optional[str], out_dir: str) -> Optional[str]:
    if trained_model is None:
        return None
    if not os.path.exists(trained_model):
        raise FileNotFoundError(f"model checkpoint {trained_model} not found")
    return trained_model
