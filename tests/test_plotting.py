"""Collation tests: per-task CSVs -> summaries -> cross-model table."""

import csv
import os

import numpy as np

from adkf_ift_tpu.plotting.collect import (
    collect_eval_run,
    cross_model_table,
    fold_means,
    summarize_by_support_size,
)


def _write_run(run_dir, tasks=3, sizes=(16, 64), runs=2, base=0.2, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(run_dir, exist_ok=True)
    fieldnames = [
        "num_train_requested", "num_train", "fraction_positive_train",
        "num_test", "fraction_positive_test", "seed", "valid_score",
        "average_precision_score", "roc_auc", "acc", "balanced_acc",
        "precision", "recall", "f1_score", "delta_auprc",
    ]
    for t in range(tasks):
        path = os.path.join(run_dir, f"CHEMBL{t}_eval_results.csv")
        with open(path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames)
            writer.writeheader()
            for size in sizes:
                for r in range(runs):
                    d = base + 0.01 * rng.randn()
                    writer.writerow(
                        {"num_train_requested": size, "num_train": size,
                         "fraction_positive_train": 0.5, "num_test": 100,
                         "fraction_positive_test": 0.3, "seed": r, "valid_score": "",
                         "average_precision_score": 0.3 + d, "roc_auc": 0.7, "acc": 0.7,
                         "balanced_acc": 0.7, "precision": 0.7, "recall": 0.7,
                         "f1_score": 0.7, "delta_auprc": d}
                    )
    return run_dir


def test_collect_and_summarize(tmp_path):
    run = _write_run(str(tmp_path / "runA"))
    df = collect_eval_run(run)
    assert df.task_name.nunique() == 3
    summary = summarize_by_support_size(df)
    assert set(summary.columns) == {
        "task_name", "support_size", "delta_auprc_mean", "delta_auprc_std", "num_runs"
    }
    assert len(summary) == 3 * 2  # tasks x sizes
    fm = fold_means(summary, "delta_auprc_mean")
    assert list(fm.support_size) == [16, 64]
    assert np.allclose(fm.fold_mean, 0.2, atol=0.05)


def test_cross_model_table(tmp_path):
    a = _write_run(str(tmp_path / "runA"), base=0.25, seed=1)
    b = _write_run(str(tmp_path / "runB"), base=0.15, seed=2)
    table = cross_model_table({"ADKF": a, "DKT": b})
    assert set(table.columns) == {"ADKF", "DKT"}
    assert (table["ADKF"] > table["DKT"]).all()
