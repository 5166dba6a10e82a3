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


def test_figure_library_full_pipeline(tmp_path):
    """The reference notebooks' figure set, end to end: eval run dirs ->
    per-size summary CSVs -> collated val+/-err table -> cross-model merge
    -> expansion -> per-assay plots, task scatter, per-class aggregation,
    by-size comparison, box plot, walltime chart, table styler
    (fs_mol/plotting/utils.py capability set)."""
    import pandas as pd

    from adkf_ift_tpu.plotting import (
        aggregate_by_class,
        collate_experiment_results,
        comparison_box_plot,
        expand_values,
        get_aggregates_across_sizes,
        highlight_max_all,
        load_data,
        plot_all_assays,
        plot_by_size,
        plot_task_performances_by_id,
        plot_test_run,
        summarize_test_run,
        walltime_plot,
        write_per_size_summaries,
    )

    sizes = (16, 64)
    runs = {
        "ADKF-IFT": _write_run(str(tmp_path / "runA"), base=0.25, seed=1),
        "DKT": _write_run(str(tmp_path / "runB"), base=0.15, seed=2),
    }

    # Stage 1: per-size summary CSVs per model (the reference's
    # {model}_summary_{x_col}_{N}.csv artifacts).
    summary_paths = {}
    for model, run in runs.items():
        written = write_per_size_summaries(run, str(tmp_path / "sum"), model, sizes=sizes)
        assert len(written) == len(sizes)
        summary_paths[model] = written

    # plot_test_run on one task's raw rows.
    df = collect_eval_run(runs["ADKF-IFT"])
    one = df[df.task_name == "CHEMBL0"]
    total, summ = summarize_test_run(one)
    assert total == 164  # max train + min test at these fixtures
    assert "average_precision_score_std" in summ.columns
    out = plot_test_run("CHEMBL0", "ADKF-IFT", summ, str(tmp_path))
    assert os.path.exists(out)

    # Stage 2: collation into the TASK_ID x {size}_train val+/-err table.
    collated = {}
    for model in runs:
        c = collate_experiment_results(str(tmp_path / "sum"), model, sizes=sizes)
        assert set(c.columns) >= {"TASK_ID", "16_train", "64_train"}
        assert c["16_train"].str.contains(r"\+/-").all()
        path = str(tmp_path / f"{model}_collated.csv")
        c.to_csv(path, index=False)
        collated[model] = path

    # Stage 3: cross-model merge + expansion (delta-auprc columns).
    merged = load_data(collated, train_sizes=sizes)
    assert len(merged) == 3  # tasks
    extended = expand_values(merged, runs.keys(), train_sizes=sizes)
    assert "16_train (ADKF-IFT) val delta-auprc" in extended.columns
    # ADKF-IFT fixture dominates DKT at every size.
    for s in sizes:
        assert (
            extended[f"{s}_train (ADKF-IFT) val"] > extended[f"{s}_train (DKT) val"]
        ).all()

    # Stage 4: every figure renders.
    assays = plot_all_assays(extended, runs.keys(), sizes, str(tmp_path / "assays"))
    assert len(assays) == 3
    scatter = plot_task_performances_by_id(
        extended, runs.keys(), support_set_size=16, plot_output_dir=str(tmp_path / "figs")
    )
    assert os.path.exists(scatter)
    agg = aggregate_by_class(extended, runs.keys(), num_samples=16)
    assert list(agg["EC_category"]) == ["all"]  # no EC column in fixtures
    full_agg = get_aggregates_across_sizes(extended, runs.keys(), train_sizes=sizes)
    assert "16_train (DKT)" in full_agg.columns
    bysize = plot_by_size(
        full_agg, runs.keys(), train_sizes=sizes, plot_output_dir=str(tmp_path / "figs")
    )
    assert os.path.exists(bysize)
    box = comparison_box_plot(
        extended, runs.keys(), support_set_size=16, plot_output_dir=str(tmp_path / "figs")
    )
    assert os.path.exists(box)
    wt = walltime_plot([[1.0, 1.2, 0.9], [30.0, 31.0, 29.5]], ["ours", "reference"], str(tmp_path / "figs"))
    assert os.path.exists(wt)

    # Styler: the max per size gets the bold attribute.
    row = pd.Series(
        {"16_train (A)": "0.3+/-0.01", "16_train (B)": "0.2+/-0.01"}
    )
    attrs = highlight_max_all(row, sizes=[16])
    assert attrs[0].startswith("font-weight") and attrs[1] == ""


def test_aggregate_by_class_with_ec_classes(tmp_path):
    """Per-EC-class aggregation and the single-task error rule."""
    import pandas as pd

    from adkf_ift_tpu.plotting import aggregate_by_class

    df = pd.DataFrame(
        {
            "TASK_ID": ["1", "2", "3"],
            "EC_super_class": [1, 1, 2],
            "fraction_positive_train": [0.5, 0.5, 0.5],
            "16_train (M) val": [0.7, 0.9, 0.6],
            "16_train (M) std": [0.01, 0.02, 0.03],
        }
    )
    agg = aggregate_by_class(df, ["M"], num_samples=16)
    assert list(agg["EC_category"]) == ["1", "2", "all"]
    r1 = agg[agg.EC_category == "1"].iloc[0]
    assert abs(r1["16_train (M)"] - 0.3) < 1e-9  # mean of (0.2, 0.4) deltas
    # two tasks -> SEM over tasks
    assert abs(r1["16_train (M) std"] - np.std([0.2, 0.4], ddof=1) / np.sqrt(2)) < 1e-9
    r2 = agg[agg.EC_category == "2"].iloc[0]
    # single task -> that measurement's own std
    assert abs(r2["16_train (M) std"] - 0.03) < 1e-9


def test_paired_gap_table(tmp_path):
    """paired_gap_table joins arms with the control on identical
    (task, support, seed) episodes and reports mean ± SEM of the
    per-episode differences — a constant offset between arms must give
    exactly that gap with a tiny paired SEM even when per-episode noise
    is large (the whole point of pairing; VERDICT r3 #4)."""
    import pandas as pd

    from adkf_ift_tpu.plotting.collect import paired_gap_table

    rng = np.random.RandomState(0)
    ctrl_dir = str(tmp_path / "ctrl")
    arm_dir = str(tmp_path / "arm")
    fieldnames = ["num_train_requested", "num_train", "fraction_positive_train",
                  "num_test", "fraction_positive_test", "seed", "valid_score",
                  "average_precision_score", "roc_auc", "acc", "balanced_acc",
                  "precision", "recall", "f1_score", "delta_auprc"]
    for d in (ctrl_dir, arm_dir):
        os.makedirs(d, exist_ok=True)
    offset = 0.04
    for t in range(4):
        rows_c, rows_a = [], []
        for size in (16, 64):
            for r in range(3):
                noise = 0.2 * rng.randn()  # LARGE shared episode noise
                base = 0.1 + noise
                rows_c.append({"num_train_requested": size, "seed": r,
                               "delta_auprc": base})
                rows_a.append({"num_train_requested": size, "seed": r,
                               "delta_auprc": base + offset})
        for d, rows in ((ctrl_dir, rows_c), (arm_dir, rows_a)):
            with open(os.path.join(d, f"T{t}_eval_results.csv"), "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=fieldnames)
                w.writeheader()
                for row in rows:
                    full = {k: 0.5 for k in fieldnames}
                    full.update(row)
                    w.writerow(full)
    out = paired_gap_table({"arm": arm_dir, "fresh-init": ctrl_dir},
                           control="fresh-init")
    assert set(out.model) == {"arm"}
    for _, r in out.iterrows():
        assert abs(r.paired_gap - offset) < 1e-9
        assert r.paired_sem < 1e-9  # constant offset -> zero paired variance
        assert r.num_episodes == 4 * 3
    # Missing control -> empty frame, not a crash.
    assert paired_gap_table({"arm": arm_dir}).empty


def test_teacher_family_v2_properties(tmp_path):
    """v2 family: quadratic readout is deterministic in the seed, label
    flips hit ~10%, and the balance quantile moves the base rate."""
    from adkf_ift_tpu.utils.synthetic import make_teacher_task

    a = make_teacher_task("V", num_samples=200, seed=5, readout="quadratic",
                          flip_prob=0.10, balance_quantile=0.35)
    b = make_teacher_task("V", num_samples=200, seed=5, readout="quadratic",
                          flip_prob=0.10, balance_quantile=0.35)
    assert [s.bool_label for s in a.samples] == [s.bool_label for s in b.samples]
    # Quantile 0.35 => ~65% positives before flips (threshold at the 35th
    # percentile of the signal).
    pos = np.mean([s.bool_label for s in a.samples])
    assert 0.52 < pos < 0.75, pos
    # Flips: compare with the unflipped twin — ~10% of labels differ.
    c = make_teacher_task("V", num_samples=200, seed=5, readout="quadratic",
                          flip_prob=0.0, balance_quantile=0.35)
    # The flip draw consumes rng state, so labels must be compared via
    # the SIGNAL threshold instead: count disagreements.
    diff = np.mean([x.bool_label != y.bool_label
                    for x, y in zip(a.samples, c.samples)])
    assert 0.02 < diff < 0.25, diff
