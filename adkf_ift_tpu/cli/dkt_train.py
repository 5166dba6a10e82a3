"""Train DKT (deep kernel transfer, joint encoder+GP training) —
the reference's dkt_train.py. Pass --use-lengthscale-prior for DKT+."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_train_cli_args, set_up_train_run
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import add_episodic_train_args, run_episodic_training
from adkf_ift_tpu.models import dkt


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train a DKT model on molecules (reference dkt_train.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_train_cli_args(parser)
    add_encoder_cli_args(parser)
    add_episodic_train_args(parser, defaults={"lr": 1e-3})
    parser.add_argument(
        "--kernel-type", type=str, default="matern",
        choices=["matern", "rbf", "linear", "poli1", "poli2", "cossim"],
    )
    parser.add_argument("--use-ard", action="store_true")
    parser.add_argument("--use-numeric-labels", action="store_true")
    parser.add_argument(
        "--use-lengthscale-prior", action="store_true",
        help="DKT+ ablation: LogNormal(0, 0.25) lengthscale prior.",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_train_run("DKTModel", args)
    config = dkt.DKTModelConfig(
        features=encoder_config_from_args(args, normalize_output=args.kernel_type == "cossim"),
        gp_kernel=args.kernel_type,
        use_ard=args.use_ard,
        use_numeric_labels=args.use_numeric_labels,
        use_lengthscale_prior=args.use_lengthscale_prior,
    )
    run_episodic_training(
        "dkt",
        config,
        lambda cfg, rng, probe: dkt.init_params(cfg, rng, probe.support),
        dkt.episode_loss,
        args,
        out_dir,
        dataset,
        regression=args.use_numeric_labels,
        batch_loss_fn=dkt.batch_loss,
    )


if __name__ == "__main__":
    main()
