"""Walltime benchmark of ADKF-IFT test-time adaptation — the reference's
adaptive_dkt_walltime.py:100-115 (perf_counter around per-episode
inner fit + posterior)."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_walltime_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import run_episodic_walltime


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Time ADKF-IFT per-episode adaptation.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("TRAINED_MODEL", type=str, help="Checkpoint directory.")
    add_walltime_cli_args(parser)
    parser.add_argument("--use-numeric-labels", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("ADKFModel_walltime", args)
    run_episodic_walltime("adkf", args, out_dir, dataset, regression=args.use_numeric_labels)


if __name__ == "__main__":
    main()
