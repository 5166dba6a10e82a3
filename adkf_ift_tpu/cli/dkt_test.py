"""Few-shot test of a trained DKT model — the reference's dkt_test.py."""

from __future__ import annotations

import argparse
from dataclasses import replace

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import add_episodic_test_args, run_episodic_test
from adkf_ift_tpu.models import dkt
from adkf_ift_tpu.utils.checkpoints import load_checkpoint


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test a DKT model on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_episodic_test_args(parser)
    add_eval_cli_args(parser)
    parser.add_argument("--use-numeric-labels", action="store_true")
    parser.add_argument(
        "--test-time-adaptation", action="store_true",
        help="Refit GP hyperparameters on each support set before predicting "
        "(models/dkt.py:152-166).",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("DKTModel", args)
    if args.test_time_adaptation and args.TRAINED_MODEL and not args.use_fresh_param_init:
        # Flip the flag on the stored config before evaluating.
        config, params, _, _ = load_checkpoint(args.TRAINED_MODEL)
        from adkf_ift_tpu.train.evaluation import eval_model
        from adkf_ift_tpu.train.evaluators import make_evaluator

        config = replace(config, test_time_adaptation=True)
        evaluator = make_evaluator("dkt", config, params, regression=args.use_numeric_labels)
        eval_model(
            evaluator, dataset,
            support_sizes=args.train_sizes, num_samples=args.num_runs,
            test_size_or_ratio=args.test_size, out_dir=out_dir, seed=args.seed,
            filter_numeric_labels=args.use_numeric_labels, query_budget=args.query_budget,
            skip_existing=bool(getattr(args, "reuse_run_dir", None)),
        )
        return
    run_episodic_test(
        "dkt",
        args,
        out_dir,
        dataset,
        default_config=dkt.DKTModelConfig(use_numeric_labels=args.use_numeric_labels),
        init_params_fn=lambda cfg, rng, probe: dkt.init_params(cfg, rng, probe.support),
        regression=args.use_numeric_labels,
    )


if __name__ == "__main__":
    main()
