"""Few-shot test of a pretrained multitask GNN via per-task head
fine-tuning — the reference's multitask_test.py
(eval_model_by_finetuning_on_task, abstract_torch_fsmol_model.py:442-541)."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import add_episodic_test_args, run_episodic_test
from adkf_ift_tpu.models import gnn_multitask


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test a multitask GNN by per-task fine-tuning.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_episodic_test_args(parser)
    add_eval_cli_args(parser)
    parser.add_argument(
        "--from-scratch", action="store_true",
        help="GNN-ST baseline: no pretrained encoder, train the whole "
        "single-task model on each support set from random init.",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    if args.from_scratch:
        args.use_fresh_param_init = True
        args.TRAINED_MODEL = None
    out_dir, dataset = set_up_test_run(
        "GNNSingleTask" if args.from_scratch else "GNNMultitask", args
    )
    run_episodic_test(
        "multitask",
        args,
        out_dir,
        dataset,
        default_config=gnn_multitask.GNNMultitaskConfig(),
        init_params_fn=lambda cfg, rng, probe: gnn_multitask.init_params(cfg, rng, probe.support),
    )


if __name__ == "__main__":
    main()
