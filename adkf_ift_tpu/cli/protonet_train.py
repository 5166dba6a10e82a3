"""Train a Prototypical Network — the reference's protonet_train.py."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_train_cli_args, set_up_train_run
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import add_episodic_train_args, run_episodic_training
from adkf_ift_tpu.models import protonet


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train a ProtoNet model on molecules (reference protonet_train.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_train_cli_args(parser)
    add_encoder_cli_args(parser)
    add_episodic_train_args(parser, defaults={"lr": 1e-3})
    parser.add_argument(
        "--distance-metric", type=str, default="mahalanobis",
        choices=["mahalanobis", "euclidean"],
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_train_run("PrototypicalNetwork", args)
    config = protonet.ProtoNetConfig(
        features=encoder_config_from_args(args),
        distance_metric=args.distance_metric,
    )
    run_episodic_training(
        "protonet",
        config,
        lambda cfg, rng, probe: protonet.init_params(cfg, rng, probe.support),
        protonet.episode_loss,
        args,
        out_dir,
        dataset,
    )


if __name__ == "__main__":
    main()
