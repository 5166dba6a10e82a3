"""DKL single-task baseline — the reference's dkl_test.py (no train
script exists upstream either: DKL fits encoder+GP from scratch per
task, dkl_utils.py:56-121)."""

from __future__ import annotations

import argparse

import jax

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import run_episodic_test
from adkf_ift_tpu.models import dkl


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test the from-scratch DKL baseline on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_eval_cli_args(parser)
    add_encoder_cli_args(parser)
    parser.add_argument(
        "--kernel-type", type=str, default="matern",
        choices=["matern", "rbf", "linear", "poli1", "poli2", "cossim"],
    )
    parser.add_argument("--use-ard", action="store_true")
    parser.add_argument("--use-numeric-labels", action="store_true")
    parser.add_argument("--num-train-steps", type=int, default=50,
                        help="Per-task Adam steps on the support MLL (dkl_test.py:55).")
    parser.add_argument("--task-lr", type=float, default=1e-3)
    parser.add_argument("--query-budget", type=int, default=256)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("DKLModel", args)
    config = dkl.DKLConfig(
        features=encoder_config_from_args(args, normalize_output=args.kernel_type == "cossim"),
        gp_kernel=args.kernel_type,
        use_ard=args.use_ard,
        use_numeric_labels=args.use_numeric_labels,
        num_train_steps=args.num_train_steps,
        learning_rate=args.task_lr,
    )
    args.TRAINED_MODEL = None
    args.use_fresh_param_init = True
    run_episodic_test(
        "dkl",
        args,
        out_dir,
        dataset,
        default_config=config,
        init_params_fn=lambda cfg, rng, probe: dkl.init_params(cfg, rng, probe.support),
        regression=args.use_numeric_labels,
    )


if __name__ == "__main__":
    main()
