"""Walltime benchmark for ADKT-VGP test-time adaptation — the reference's
adaptive_dkt_vgp_walltime.py."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.cli.cli_utils import add_walltime_cli_args, set_up_test_run
from adkf_ift_tpu.cli._episodic import run_episodic_walltime


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Time ADKT-VGP per-episode adaptation.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("TRAINED_MODEL", type=str)
    add_walltime_cli_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("ADKTVGPModel_walltime", args)
    run_episodic_walltime("adkf_vgp", args, out_dir, dataset)


if __name__ == "__main__":
    main()
