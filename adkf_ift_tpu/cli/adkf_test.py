"""Few-shot test of a trained ADKF-IFT model — the reference's
adaptive_dkt_test.py (per-task GP refit on support + posterior eval)."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.cli._episodic import add_episodic_test_args, run_episodic_test
from adkf_ift_tpu.models import adkf


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test an ADKF-IFT model on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_episodic_test_args(parser)
    add_eval_cli_args(parser)
    # Encoder flags shape the --use-fresh-param-init control's config
    # (the reference's fresh-init test builds the model from the same
    # flags as training, adaptive_dkt_test.py:44-48); ignored when a
    # TRAINED_MODEL checkpoint supplies its own config.
    add_encoder_cli_args(parser)
    parser.add_argument("--use-numeric-labels", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("ADKFModel", args)
    run_episodic_test(
        "adkf",
        args,
        out_dir,
        dataset,
        default_config=adkf.ADKFModelConfig(
            features=encoder_config_from_args(args),
            use_numeric_labels=args.use_numeric_labels,
        ),
        init_params_fn=lambda cfg, rng, probe: adkf.init_encoder_params(cfg, rng, probe.support),
        regression=args.use_numeric_labels,
    )


if __name__ == "__main__":
    main()
