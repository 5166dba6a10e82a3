"""Train ADKT-VGP (variational-GP ADKF for classification) — the
reference's adaptive_dkt_vgp_train.py."""

from __future__ import annotations

import argparse
from dataclasses import replace

from adkf_ift_tpu.cli.cli_utils import add_train_cli_args, set_up_train_run, str2bool
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import add_episodic_train_args, run_episodic_training
from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.models import adkf_vgp


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train an ADKT-VGP model on molecules (reference adaptive_dkt_vgp_train.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_train_cli_args(parser)
    add_encoder_cli_args(parser)
    add_episodic_train_args(parser)
    parser.add_argument(
        "--kernel-type", type=str, default="matern",
        choices=["matern", "rbf", "linear", "poli1", "poli2", "cossim"],
    )
    parser.add_argument("--use-ard", action="store_true")
    parser.add_argument("--use-lengthscale-prior", type=str2bool, default=True)
    parser.add_argument("--ignore-grad-correction", action="store_true")
    parser.add_argument("--inner-max-iters", type=int, default=64)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_train_run("ADKTVGPModel", args)

    feats = encoder_config_from_args(args, normalize_output=args.kernel_type == "cossim")
    # VGP encoder: FC head is in -> 1024 -> readout dim (adaptive_dkt_vgp.py:60-65).
    feats = replace(
        feats,
        fc_hidden_dim=1024,
        fc_out_dim=feats.graph_config.readout_config.output_dim,
    )
    config = adkf_vgp.ADKTVGPModelConfig(
        features=feats,
        gp_kernel=args.kernel_type,
        use_ard=args.use_ard,
        use_lengthscale_prior=args.use_lengthscale_prior,
        ignore_grad_correction=args.ignore_grad_correction,
        inner_optimizer=LBFGSConfig(max_iters=args.inner_max_iters),
        support_size=args.support_set_size,
    )
    run_episodic_training(
        "adkf_vgp",
        config,
        lambda cfg, rng, probe: adkf_vgp.init_encoder_params(cfg, rng, probe.support),
        adkf_vgp.episode_outer_loss,
        args,
        out_dir,
        dataset,
    )


if __name__ == "__main__":
    main()
