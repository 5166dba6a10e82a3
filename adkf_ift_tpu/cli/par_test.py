"""Few-shot test of a trained PAR model — the reference's par_test.py."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import add_episodic_test_args, run_episodic_test
from adkf_ift_tpu.models import par


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test a PAR model on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_episodic_test_args(parser)
    add_eval_cli_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("PARModel", args)
    run_episodic_test(
        "par",
        args,
        out_dir,
        dataset,
        default_config=par.PARModelConfig(),
        init_params_fn=lambda cfg, rng, probe: par.init_params(cfg, rng, probe),
    )


if __name__ == "__main__":
    main()
