"""Train ADKF-IFT on FS-Mol — the reference's adaptive_dkt_train.py.

Example:
    adkf-train /path/to/fs-mol-data --support_set_size 64 --lr 0.0001
"""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_train_cli_args, set_up_train_run, str2bool
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import add_episodic_train_args, run_episodic_training
from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.models import adkf


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train an ADKF-IFT model on molecules (reference adaptive_dkt_train.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_train_cli_args(parser)
    add_encoder_cli_args(parser)
    add_episodic_train_args(parser)
    parser.add_argument(
        "--kernel-type",
        type=str,
        default="matern",
        choices=["matern", "rbf", "linear", "poli1", "poli2", "cossim"],
        help="GP kernel (reference --kernel_type, default Matern-5/2).",
    )
    parser.add_argument("--use-ard", action="store_true", help="Per-dimension lengthscales.")
    parser.add_argument(
        "--use-numeric-labels",
        action="store_true",
        help="Regression mode: train on standardized log numeric labels.",
    )
    parser.add_argument(
        "--use-lengthscale-prior",
        type=str2bool,
        default=True,
        help="LogNormal lengthscale prior with median-heuristic mode. "
        "(The reference's flag inverts via store_false — here it's an explicit bool.)",
    )
    parser.add_argument(
        "--ignore-grad-correction",
        action="store_true",
        help="Drop the IFT correction term (the first-order 'ADKF' ablation).",
    )
    parser.add_argument(
        "--feature-diversity-reg",
        type=float,
        default=0.0,
        help="Coefficient on the effective-rank (von-Neumann-entropy) "
        "feature-diversity penalty added to the outer loss — the "
        "anti-collapse lever for low-task-diversity training regimes "
        "(.zoo2/ANALYSIS.md; 0 = off, the reference objective).",
    )
    parser.add_argument("--inner-max-iters", type=int, default=64, help="Inner L-BFGS iterations.")
    parser.add_argument(
        "--inner-method", type=str, default="auto", choices=["auto", "lbfgs", "newton"],
        help="Inner optimizer; 'auto' (the library + bench default) picks "
        "saddle-free Newton for non-ARD (fewer sequential ops, same optima) "
        "and L-BFGS for ARD-width problems.",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_train_run("ADKFModel", args)

    config = adkf.ADKFModelConfig(
        features=encoder_config_from_args(args, normalize_output=args.kernel_type == "cossim"),
        gp_kernel=args.kernel_type,
        use_ard=args.use_ard,
        use_numeric_labels=args.use_numeric_labels,
        use_lengthscale_prior=args.use_lengthscale_prior,
        ignore_grad_correction=args.ignore_grad_correction,
        feature_diversity_reg=args.feature_diversity_reg,
        inner_optimizer=LBFGSConfig(
            max_iters=args.inner_max_iters,
            method=args.inner_method,
        ),
    )
    run_episodic_training(
        "adkf",
        config,
        lambda cfg, rng, probe: adkf.init_encoder_params(cfg, rng, probe.support),
        adkf.episode_outer_loss,
        args,
        out_dir,
        dataset,
        regression=args.use_numeric_labels,
        batch_loss_fn=adkf.batch_outer_loss,
    )


if __name__ == "__main__":
    main()
