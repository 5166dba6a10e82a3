"""Eval harness tests: CSV schema parity with the reference, seed
contract (seed + run_idx), numeric task filtering, query chunking."""

import csv
import os

import numpy as np
import jax

from adkf_ift_tpu.data import DataFold, FSMolDataset
from adkf_ift_tpu.models import gpst
from adkf_ift_tpu.train.evaluation import eval_model, is_valid_numeric_task
from adkf_ift_tpu.utils.synthetic import make_dataset_dir, make_task


def _dummy_evaluator(episode, seed):
    """Prediction = normalized fingerprint sum (deterministic, label-free)."""
    fp = np.asarray(episode.query.fingerprints)
    preds = fp.sum(1) / (fp.sum(1).max() + 1.0)
    labels = (np.asarray(episode.query_labels) > 0).astype(float)
    return preds, labels


def test_eval_model_csv_schema(tmp_path):
    data_root = make_dataset_dir(str(tmp_path / "data"), num_train=0, num_valid=0, num_test=2, samples_per_task=80)
    ds = FSMolDataset.from_directory(data_root)
    out_dir = str(tmp_path / "out")
    results = eval_model(
        _dummy_evaluator,
        ds,
        support_sizes=[16],
        num_samples=2,
        out_dir=out_dir,
        seed=5,
        query_budget=32,
    )
    assert len(results) == 2
    for task_name, task_results in results.items():
        assert len(task_results) == 2
        # Seed contract: seed + run_idx.
        assert [r.seed for r in task_results] == [5, 6]
        csv_path = os.path.join(out_dir, f"{task_name}_eval_results.csv")
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        # Reference column schema (test_utils.py:165-183) incl. delta_auprc.
        assert set(rows[0].keys()) == {
            "num_train_requested", "num_train", "fraction_positive_train",
            "num_test", "fraction_positive_test", "seed", "valid_score",
            "average_precision_score", "roc_auc", "acc", "balanced_acc",
            "precision", "recall", "f1_score", "delta_auprc",
        }
        d = float(rows[0]["delta_auprc"])
        ap = float(rows[0]["average_precision_score"])
        fp = float(rows[0]["fraction_positive_test"])
        assert abs(d - (ap - fp)) < 1e-9


def test_eval_skip_existing_resumes_partial_run(tmp_path):
    """skip_existing: tasks with a non-empty CSV in out_dir are not
    re-evaluated (crash-tolerant sweep resume, zoo_bench/--reuse-run-dir)."""
    data_root = make_dataset_dir(
        str(tmp_path / "d3"), num_train=0, num_valid=0, num_test=2, samples_per_task=80
    )
    ds = FSMolDataset.from_directory(data_root)
    out_dir = str(tmp_path / "out3")

    # First pass: evaluate everything.
    eval_model(_dummy_evaluator, ds, support_sizes=[16], num_samples=1,
               out_dir=out_dir, query_budget=32)
    csvs = sorted(f for f in os.listdir(out_dir) if f.endswith("_eval_results.csv"))
    assert len(csvs) == 2
    # Simulate a crash: remove one task's CSV, truncate nothing else.
    os.remove(os.path.join(out_dir, csvs[0]))

    calls = []

    def counting_evaluator(episode, seed):
        calls.append(seed)
        return _dummy_evaluator(episode, seed)

    results = eval_model(counting_evaluator, ds, support_sizes=[16], num_samples=1,
                         out_dir=out_dir, query_budget=32, skip_existing=True)
    # Only the missing task was re-run; the completed one was skipped.
    assert len(results) == 1
    assert calls  # the missing task actually ran
    assert os.path.exists(os.path.join(out_dir, csvs[0]))


def test_eval_chunking_covers_all_query_points(tmp_path):
    """query_budget smaller than the test split => multiple chunks whose
    predictions concatenate to the full query set."""
    data_root = make_dataset_dir(str(tmp_path / "d2"), num_train=0, num_valid=0, num_test=1, samples_per_task=100)
    ds = FSMolDataset.from_directory(data_root)
    seen_sizes = []

    def evaluator(episode, seed):
        preds, labels = _dummy_evaluator(episode, seed)
        seen_sizes.append(int(np.sum(episode.query.graph_mask)))
        return preds, labels

    results = eval_model(evaluator, ds, support_sizes=[16], num_samples=1, query_budget=32)
    (task_results,) = results.values()
    assert task_results[0].size == 100 - 16  # all remaining points scored
    assert sum(seen_sizes) == 100 - 16
    assert len(seen_sizes) >= 3  # chunked


def test_numeric_task_filter():
    from dataclasses import replace

    base = make_task(num_samples=50, seed=0)
    # Positive lognormal labels, scaled so at least one exceeds 100 (i.e. not
    # %-inhibition-like) -> valid regression task.
    top = max(s.numeric_label for s in base.samples)
    scaled = [replace(s, numeric_label=s.numeric_label * (150.0 / top)) for s in base.samples]
    from adkf_ift_tpu.data import Task as _Task
    task = _Task("V", scaled)
    assert is_valid_numeric_task(task)
    # %-inhibition style: all in [0, 100] -> filtered out.
    bounded = [replace(s, numeric_label=float(np.clip(s.numeric_label, 0, 100))) for s in task.samples]
    from adkf_ift_tpu.data import Task
    assert not is_valid_numeric_task(Task("B", bounded))
    # Nonpositive values -> filtered out.
    withneg = bounded[:-1] + [replace(bounded[-1], numeric_label=-1.0)]
    assert not is_valid_numeric_task(Task("N", withneg))


def test_teacher_numeric_labels_support_regression():
    """Teacher-family numeric labels are log-normal in the graph signal:
    they must pass the reference's numeric-task filter, and the pipeline's
    log + support-standardization must recover a zero-mean unit-variance
    support signal (so r2_score_os's zero baseline is exact) that
    CORRELATES with the graph signal driving the binary labels."""
    from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
    from adkf_ift_tpu.utils.synthetic import make_teacher_task

    task = make_teacher_task("TREG", num_samples=160, seed=3)
    assert is_valid_numeric_task(task)

    spec = EpisodeSpec(support_size=32, query_size=64)
    sampler = StratifiedTaskSampler(32, test_size_or_ratio=64)
    ep = build_episode(sampler.sample(task, seed=0), spec, regression=True)
    s = np.asarray(ep.support_numeric_labels)[np.asarray(ep.support.graph_mask) > 0]
    q = np.asarray(ep.query_numeric_labels)[np.asarray(ep.query.graph_mask) > 0]
    assert np.isfinite(s).all() and np.isfinite(q).all()
    np.testing.assert_allclose(s.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(s.std(), 1.0, atol=1e-4)
    # Standardized numeric labels and binary labels share the teacher
    # signal: positive-class episodes must sit above the negatives.
    yq = np.asarray(ep.query_labels)[np.asarray(ep.query.graph_mask) > 0]
    assert q[yq > 0].mean() > q[yq < 0].mean() + 0.5


def test_eval_with_real_model_gpst(tmp_path):
    """End-to-end: eval harness driving the GP-ST model on a synthetic fold."""
    data_root = make_dataset_dir(str(tmp_path / "d3"), num_train=0, num_valid=0, num_test=1, samples_per_task=120)
    ds = FSMolDataset.from_directory(data_root)
    cfg = gpst.GPSTConfig()
    predict = jax.jit(lambda e: gpst.episode_predict(cfg, e))

    def evaluator(episode, seed):
        pred = predict(episode)
        probs = jax.nn.sigmoid(pred.mean)
        return np.asarray(probs), (np.asarray(episode.query_labels) > 0).astype(float)

    results = eval_model(evaluator, ds, support_sizes=[16, 64], num_samples=2, query_budget=64)
    (task_results,) = results.values()
    assert len(task_results) == 4  # 2 sizes x 2 runs
    for r in task_results:
        assert 0.0 <= r.avg_precision <= 1.0
