"""Eval-run collation — parity with fs_mol/plotting/collect_eval_runs.py
and the summary stages of plotting/utils.py: read every
{task}_eval_results.csv in a run directory, aggregate per task per
support size (mean/std of delta_auprc or r2 over seeds), and emit the
{model}_summary.csv format that visualize_results/** ships."""

from __future__ import annotations

import glob
import logging
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

CLASSIFICATION_METRIC = "delta_auprc"
REGRESSION_METRIC = "r2"


def collect_eval_run(run_dir: str) -> pd.DataFrame:
    """All per-task rows of one eval run as a single dataframe with a
    task_name column."""
    frames: List[pd.DataFrame] = []
    for path in sorted(glob.glob(os.path.join(run_dir, "*_eval_results.csv"))):
        task = os.path.basename(path)[: -len("_eval_results.csv")]
        try:
            df = pd.read_csv(path)
        except Exception:  # noqa: BLE001
            logger.exception("unreadable eval csv %s", path)
            continue
        df["task_name"] = task
        frames.append(df)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def summarize_by_support_size(
    df: pd.DataFrame, metric: Optional[str] = None
) -> pd.DataFrame:
    """Per-(task, support size) mean/std/count of the headline metric —
    the {model}_summary.csv layout of visualize_results/**."""
    if metric is None:
        metric = REGRESSION_METRIC if "r2" in df.columns else CLASSIFICATION_METRIC
    if metric == CLASSIFICATION_METRIC and metric not in df.columns:
        df = df.copy()
        df[metric] = df["average_precision_score"] - df["fraction_positive_test"]
    grouped = df.groupby(["task_name", "num_train_requested"])[metric]
    out = grouped.agg(["mean", "std", "count"]).reset_index()
    out.columns = ["task_name", "support_size", f"{metric}_mean", f"{metric}_std", "num_runs"]
    return out


def fold_means(summary: pd.DataFrame, metric_mean_col: str) -> pd.DataFrame:
    """Mean over tasks of per-task means, per support size (the headline
    numbers of SURVEY.md §6 / BASELINE.md)."""
    return (
        summary.groupby("support_size")[metric_mean_col]
        .agg(["mean", "std", "count"])
        .reset_index()
        .rename(columns={"mean": "fold_mean", "std": "fold_std", "count": "num_tasks"})
    )


def cross_model_table(
    run_dirs: Dict[str, str], metric: Optional[str] = None
) -> pd.DataFrame:
    """{model name -> run dir} -> support-size x model fold-mean table
    (the cross-model comparison of plotting/utils.py)."""
    rows = []
    for model, run_dir in run_dirs.items():
        df = collect_eval_run(run_dir)
        if df.empty:
            continue
        summary = summarize_by_support_size(df, metric)
        mcol = [c for c in summary.columns if c.endswith("_mean")][0]
        for _, r in fold_means(summary, mcol).iterrows():
            rows.append(
                {"model": model, "support_size": int(r.support_size),
                 "fold_mean": r.fold_mean, "fold_std": r.fold_std,
                 "num_tasks": int(r.num_tasks)}
            )
    table = pd.DataFrame(rows)
    if not table.empty:
        table = table.pivot(index="support_size", columns="model", values="fold_mean")
    return table


def paired_gap_table(
    run_dirs: Dict[str, str],
    control: str = "fresh-init",
    metric: Optional[str] = None,
) -> pd.DataFrame:
    """Per-arm PAIRED gap vs `control`, on identical episodes.

    The eval harness derives each episode's sampler seed from
    (task, run index) alone (train/evaluation.py), so every arm's
    (task_name, support, seed) row scores the SAME support/query split;
    the between-arm comparison the unpaired fold SEMs cannot resolve
    (VERDICT r3 weak #2) is exact under pairing: for each arm, join its
    per-episode rows with the control's on (task, support, seed), take
    per-episode metric differences, and report mean ± SEM of the
    differences per support size. Mirrors docs/METAGAIN.md's paired
    protocol, now computed for the whole table at collation time.

    Returns a tidy frame: model, support_size, paired_gap, paired_sem,
    num_episodes.
    """
    if control not in run_dirs:
        return pd.DataFrame()
    key = ["task_name", "num_train_requested", "seed"]

    def metric_frame(run_dir):
        df = collect_eval_run(run_dir)
        if df.empty:
            return df
        m = metric
        if m is None:
            m = REGRESSION_METRIC if "r2" in df.columns else CLASSIFICATION_METRIC
        if m == CLASSIFICATION_METRIC and m not in df.columns:
            df = df.copy()
            df[m] = df["average_precision_score"] - df["fraction_positive_test"]
        # Per-episode dedup (resumed evals can append duplicate rows).
        return df.drop_duplicates(key)[key + [m]].rename(columns={m: "metric"})

    ctrl = metric_frame(run_dirs[control])
    rows = []
    for model, run_dir in run_dirs.items():
        if model == control:
            continue
        df = metric_frame(run_dir)
        if df.empty or ctrl.empty:
            continue
        merged = df.merge(ctrl, on=key, suffixes=("", "_ctrl"))
        if merged.empty:
            continue
        merged["diff"] = merged["metric"] - merged["metric_ctrl"]
        for size, grp in merged.groupby("num_train_requested"):
            d = grp["diff"].to_numpy()
            if len(d) < 2:
                # A single paired episode has no sample SEM (std(ddof=1)
                # is NaN); skip rather than emit a NaN row (ADVICE r4 #3).
                continue
            rows.append(
                {
                    "model": model,
                    "support_size": int(size),
                    "paired_gap": float(d.mean()),
                    "paired_sem": float(d.std(ddof=1) / len(d) ** 0.5),
                    "num_episodes": int(len(d)),
                }
            )
    return pd.DataFrame(rows)


def plot_box_comparison(run_dirs: Dict[str, str], out_path: str, metric: Optional[str] = None):
    """Per-model box plots over tasks at each support size
    (plotting/utils.py box-plot family)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = {}
    sizes = set()
    for model, run_dir in run_dirs.items():
        df = collect_eval_run(run_dir)
        if df.empty:
            continue
        summary = summarize_by_support_size(df, metric)
        mcol = [c for c in summary.columns if c.endswith("_mean")][0]
        data[model] = summary
        sizes.update(summary["support_size"].unique())

    sizes = sorted(sizes)
    fig, axes = plt.subplots(1, len(sizes), figsize=(4 * len(sizes), 4), squeeze=False)
    for ax, size in zip(axes[0], sizes):
        series, labels = [], []
        for model, summary in data.items():
            vals = summary[summary.support_size == size]
            mcol = [c for c in summary.columns if c.endswith("_mean")][0]
            series.append(vals[mcol].values)
            labels.append(model)
        ax.boxplot(series, labels=labels)
        ax.set_title(f"support {size}")
        ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_walltimes(walltime_csvs: Dict[str, str], out_path: str):
    """Adaptation-walltime bar chart (plotting/utils.py:1151-1175)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names, medians, errs = [], [], []
    for model, path in walltime_csvs.items():
        df = pd.read_csv(path)
        names.append(model)
        medians.append(df["walltime_s"].median())
        errs.append(df["walltime_s"].std())
    fig, ax = plt.subplots(figsize=(1.2 * len(names) + 2, 4))
    ax.bar(names, medians, yerr=errs)
    ax.set_ylabel("per-episode adaptation walltime (s)")
    ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
