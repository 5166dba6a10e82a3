"""Train a Conditional Neural Process — the reference's cnp_train.py."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_train_cli_args, set_up_train_run
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import add_episodic_train_args, run_episodic_training
from adkf_ift_tpu.models import cnp


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train a CNP model on molecules (reference cnp_train.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_train_cli_args(parser)
    add_encoder_cli_args(parser)
    add_episodic_train_args(parser, defaults={"lr": 1e-3})
    parser.add_argument("--use-numeric-labels", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_train_run("CNPModel", args)
    config = cnp.CNPConfig(
        features=encoder_config_from_args(args),
        use_numeric_labels=args.use_numeric_labels,
    )
    run_episodic_training(
        "cnp",
        config,
        cnp.init_params,
        cnp.episode_loss,
        args,
        out_dir,
        dataset,
        regression=args.use_numeric_labels,
    )


if __name__ == "__main__":
    main()
