"""Train GNN-MAML — the reference's maml_train.py (TensorFlow there;
pure-JAX here: the inner SGD adaptation is a differentiable function,
so the second-order meta-gradient is just jax.grad of the query loss)."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_train_cli_args, set_up_train_run
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import add_episodic_train_args, run_episodic_training
from adkf_ift_tpu.models import maml


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Meta-train a GNN with MAML (reference maml_train.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_train_cli_args(parser)
    add_encoder_cli_args(parser)
    add_episodic_train_args(parser, defaults={"tasks_per_batch": 16, "support": 16})
    parser.add_argument("--max-num-inner-train-steps", type=int, default=1,
                        help="Inner SGD steps per episode (maml_train.py:87).")
    parser.add_argument("--outer-loop-rate-scale", type=float, default=0.1)
    parser.add_argument("--first-order", action="store_true", help="FOMAML ablation.")
    parser.add_argument("--apply-anil", action="store_true",
                        help="Inner loop adapts heads only (metalearning_...py).")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_train_run("MAMLModel", args)
    config = maml.MAMLConfig(
        graph_config=encoder_config_from_args(args).graph_config,
        inner_steps=args.max_num_inner_train_steps,
        outer_loop_rate_scale=args.outer_loop_rate_scale,
        first_order=args.first_order,
        apply_anil=args.apply_anil,
    )
    run_episodic_training(
        "maml",
        config,
        lambda cfg, rng, probe: maml.init_params(cfg, rng, probe.support),
        maml.episode_loss,
        args,
        out_dir,
        dataset,
        optimizer_factory=lambda params: maml.make_outer_optimizer(config, params),
    )


if __name__ == "__main__":
    main()
