"""sklearn baselines (kNN / RandomForest on ECFP fingerprints) with CV
grid search — the reference's baseline_test.py:29-158. These are
host-side models; only the shared eval protocol/harness is reused.
"""

from __future__ import annotations

import argparse
import logging
from typing import Any, Dict, List, Optional

import numpy as np
import sklearn.ensemble
import sklearn.neighbors
from sklearn.model_selection import GridSearchCV

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.data.dataset import DataFold
from adkf_ift_tpu.data.samplers import SamplingException, StratifiedTaskSampler
from adkf_ift_tpu.data.task import TaskSample
from adkf_ift_tpu.train.evaluation import (
    TaskSampleEvalResults,
    TaskSampleEvalResultsNumeric,
    is_valid_numeric_task,
    write_csv_summary,
    write_csv_summary_numeric,
)
from adkf_ift_tpu.utils.metrics import (
    compute_binary_task_metrics,
    compute_numeric_task_metrics,
)

logger = logging.getLogger(__name__)

# Reference grids (baseline_test.py:29-41).
DEFAULT_GRID_SEARCH: Dict[str, Dict[str, List[Any]]] = {
    "randomForest": {
        "n_estimators": [100, 200],
        "max_depth": [5, 10, 20],
        "max_features": [None, "sqrt", "log2"],
        "min_samples_leaf": [2, 5],
    },
    "kNN": {"n_neighbors": [4, 8, 16, 32, 64, 128], "metric": ["minkowski"]},
}

NAME_TO_MODEL_CLS: Dict[str, Dict[str, Any]] = {
    "classification": {
        "randomForest": sklearn.ensemble.RandomForestClassifier,
        "kNN": sklearn.neighbors.KNeighborsClassifier,
    },
    "regression": {
        "randomForest": sklearn.ensemble.RandomForestRegressor,
        "kNN": sklearn.neighbors.KNeighborsRegressor,
    },
}


def test_sklearn_on_task_sample(
    model_name: str,
    task_sample: TaskSample,
    regression: bool = False,
    use_grid_search: bool = True,
    grid_search_parameters: Optional[Dict[str, Any]] = None,
    model_params: Optional[Dict[str, Any]] = None,
):
    """Fit one sklearn model on the support fingerprints, score the query
    (reference test(), baseline_test.py:45-93)."""
    X_train = np.array([x.get_fingerprint() for x in task_sample.train_samples])
    X_test = np.array([x.get_fingerprint() for x in task_sample.test_samples])
    if regression:
        # log-standardize by support stats, like the episodic regression path.
        raw_train = np.log([x.numeric_label for x in task_sample.train_samples])
        mean, std = raw_train.mean(), raw_train.std() or 1.0
        y_train = (raw_train - mean) / std
        y_test = (np.log([x.numeric_label for x in task_sample.test_samples]) - mean) / std
    else:
        y_train = [float(x.bool_label) for x in task_sample.train_samples]
        y_test = [float(x.bool_label) for x in task_sample.test_samples]

    mode = "regression" if regression else "classification"
    if use_grid_search:
        grid = dict(grid_search_parameters or DEFAULT_GRID_SEARCH[model_name])
        if model_name == "kNN":
            # no more neighbors than half the support set (baseline_test.py:72-76)
            grid["n_neighbors"] = [
                x for x in grid["n_neighbors"] if x < len(task_sample.train_samples) / 2
            ] or [1]
        search = GridSearchCV(NAME_TO_MODEL_CLS[mode][model_name](), grid)
        search.fit(X_train, y_train)
        model = search.best_estimator_
    else:
        model = NAME_TO_MODEL_CLS[mode][model_name](**(model_params or {}))
        model.fit(X_train, y_train)

    if regression:
        preds = model.predict(X_test)
        return compute_numeric_task_metrics(preds, np.asarray(y_test))
    probs = model.predict_proba(X_test)[:, 1]
    return compute_binary_task_metrics(probs, np.asarray(y_test, np.float64))


def _run(args, regression: bool) -> None:
    import dataclasses
    import os

    out_dir, dataset = set_up_test_run(args.model, args)
    skip_existing = bool(getattr(args, "reuse_run_dir", None))
    for task in dataset.get_task_reading_iterable(DataFold.TEST):
        if regression and not is_valid_numeric_task(task):
            continue
        path = os.path.join(out_dir, f"{task.name}_eval_results.csv")
        if skip_existing and os.path.exists(path) and os.path.getsize(path) > 0:
            logger.info("resume: %s already evaluated, skipping", task.name)
            continue
        results = []
        for train_size in args.train_sizes:
            sampler = StratifiedTaskSampler(
                train_size_or_ratio=train_size,
                test_size_or_ratio=args.test_size,
                allow_smaller_test=True,
            )
            for run_idx in range(args.num_runs):
                seed = args.seed + run_idx
                try:
                    task_sample = sampler.sample(task, seed=seed)
                except (SamplingException, ValueError) as e:
                    logger.debug("skip %s@%d: %s", task.name, train_size, e)
                    continue
                metrics = test_sklearn_on_task_sample(
                    args.model, task_sample, regression=regression,
                    use_grid_search=not args.no_grid_search,
                )
                if regression:
                    results.append(
                        TaskSampleEvalResultsNumeric(
                            task_name=task.name, seed=seed, num_train=train_size,
                            num_test=len(task_sample.test_samples),
                            **dataclasses.asdict(metrics),
                        )
                    )
                else:
                    results.append(
                        TaskSampleEvalResults(
                            task_name=task.name, seed=seed, num_train=train_size,
                            num_test=len(task_sample.test_samples),
                            fraction_pos_train=task_sample.train_pos_label_ratio,
                            fraction_pos_test=task_sample.test_pos_label_ratio,
                            **dataclasses.asdict(metrics),
                        )
                    )
        path = os.path.join(out_dir, f"{task.name}_eval_results.csv")
        if regression:
            write_csv_summary_numeric(path, results)
        else:
            write_csv_summary(path, results)


def _make_parser(regression: bool) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Test sklearn baselines (kNN/randomForest) on molecules.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "--model", type=str, default="randomForest", choices=["randomForest", "kNN"]
    )
    parser.add_argument("--no-grid-search", action="store_true")
    add_eval_cli_args(parser)
    return parser


def main(argv=None):
    args = _make_parser(regression=False).parse_args(argv)
    _run(args, regression=False)


def main_numeric(argv=None):
    """baseline_numeric_test.py equivalent (regression baselines)."""
    args = _make_parser(regression=True).parse_args(argv)
    _run(args, regression=True)


if __name__ == "__main__":
    main()
