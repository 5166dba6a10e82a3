"""Collate one or more eval runs into summary CSVs / comparison plots —
the reference's fs_mol/plotting/collect_eval_runs.py CLI."""

from __future__ import annotations

import argparse
import logging
import os

from adkf_ift_tpu.plotting.collect import (
    collect_eval_run,
    cross_model_table,
    fold_means,
    plot_box_comparison,
    summarize_by_support_size,
)
from adkf_ift_tpu.utils.logging import set_up_logging

logger = logging.getLogger(__name__)


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Collect per-task eval CSVs into summaries and plots.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "RUNS", nargs="+",
        help="Eval run dirs, each optionally prefixed 'name=': e.g. "
        "ADKF=outputs/FSMol_eval_ADKFModel_... DKT=outputs/...",
    )
    parser.add_argument("--save-dir", type=str, default="collected_results")
    parser.add_argument("--metric", type=str, default=None, help="delta_auprc or r2.")
    parser.add_argument("--plot", action="store_true", help="Also write a box-plot comparison.")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    os.makedirs(args.save_dir, exist_ok=True)
    set_up_logging(os.path.join(args.save_dir, "collect.log"))

    run_dirs = {}
    for spec in args.RUNS:
        if "=" in spec:
            name, path = spec.split("=", 1)
        else:
            name, path = os.path.basename(spec.rstrip("/")), spec
        run_dirs[name] = path

    for name, run_dir in run_dirs.items():
        df = collect_eval_run(run_dir)
        if df.empty:
            logger.warning("%s: no eval CSVs found in %s", name, run_dir)
            continue
        summary = summarize_by_support_size(df, args.metric)
        out = os.path.join(args.save_dir, f"{name}_summary.csv")
        summary.to_csv(out, index=False)
        mcol = [c for c in summary.columns if c.endswith("_mean")][0]
        fm = fold_means(summary, mcol)
        fm.to_csv(os.path.join(args.save_dir, f"{name}_fold_means.csv"), index=False)
        logger.info("%s: %d tasks; fold means:\n%s", name, summary.task_name.nunique(), fm)

    if len(run_dirs) > 1:
        table = cross_model_table(run_dirs, args.metric)
        table.to_csv(os.path.join(args.save_dir, "cross_model_comparison.csv"))
        logger.info("cross-model table:\n%s", table)
    if args.plot:
        plot_box_comparison(
            run_dirs, os.path.join(args.save_dir, "comparison_boxplot.png"), args.metric
        )


if __name__ == "__main__":
    main()
