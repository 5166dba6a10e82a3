"""Few-shot test of a trained ADKT-VGP model — the reference's
adaptive_dkt_vgp_test.py.

Note: the VGP's inducing count is static per support size; the stored
config is re-specialized to each evaluated support size.
"""

from __future__ import annotations

import argparse
from dataclasses import replace

import numpy as np

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import add_episodic_test_args, _log_aggregate
from adkf_ift_tpu.train.evaluation import eval_model
from adkf_ift_tpu.train.evaluators import make_evaluator
from adkf_ift_tpu.utils.checkpoints import load_checkpoint


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test an ADKT-VGP model on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_episodic_test_args(parser)
    add_eval_cli_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("ADKTVGPModel", args)
    config, params, _, _ = load_checkpoint(args.TRAINED_MODEL)

    import os

    from adkf_ift_tpu.train.evaluation import write_csv_summary

    all_results = {}
    for train_size in args.train_sizes:
        sized = replace(config, support_size=train_size)
        evaluator = make_evaluator("adkf_vgp", sized, params)
        results = eval_model(
            evaluator,
            dataset,
            support_sizes=[train_size],
            num_samples=args.num_runs,
            test_size_or_ratio=args.test_size,
            out_dir=None,  # CSVs written once below, all sizes per task
            seed=args.seed,
            query_budget=args.query_budget,
        )
        for name, rs in results.items():
            all_results.setdefault(name, []).extend(rs)
    for name, rs in all_results.items():
        write_csv_summary(os.path.join(out_dir, f"{name}_eval_results.csv"), rs)
    _log_aggregate(all_results, regression=False)
    return all_results


if __name__ == "__main__":
    main()
