"""GP-ST: single-task exact Tanimoto-kernel GP on binary fingerprints —
the reference's gpst_test.py:37-116 (no encoder, per-task L-BFGS fit)."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import run_episodic_test
from adkf_ift_tpu.models import gpst


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test the single-task Tanimoto-GP baseline on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_eval_cli_args(parser)
    parser.add_argument("--use-numeric-labels", action="store_true")
    parser.add_argument("--query-budget", type=int, default=256)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("GPSTModel", args)
    args.TRAINED_MODEL = None
    args.use_fresh_param_init = True
    run_episodic_test(
        "gpst",
        args,
        out_dir,
        dataset,
        default_config=gpst.GPSTConfig(use_numeric_labels=args.use_numeric_labels),
        init_params_fn=None,
        regression=args.use_numeric_labels,
    )


if __name__ == "__main__":
    main()
