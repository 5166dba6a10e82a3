"""Few-shot test of a trained CNP — the reference's cnp_test.py."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import add_episodic_test_args, run_episodic_test
from adkf_ift_tpu.models import cnp


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test a CNP model on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_episodic_test_args(parser)
    add_eval_cli_args(parser)
    parser.add_argument("--use-numeric-labels", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("CNPModel", args)
    run_episodic_test(
        "cnp",
        args,
        out_dir,
        dataset,
        default_config=cnp.CNPConfig(use_numeric_labels=args.use_numeric_labels),
        init_params_fn=cnp.init_params,
        regression=args.use_numeric_labels,
    )


if __name__ == "__main__":
    main()
