"""Evaluation metrics — identical definitions to the reference
(fs_mol/utils/metrics.py): binary metrics incl. ΔAUPRC-relevant average
precision, and numeric metrics with the out-of-sample R² against the
support-mean baseline (r2_score_os, metrics.py:124-138). Host-side
numpy/sklearn; these never run on device.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    average_precision_score,
    balanced_accuracy_score,
    cohen_kappa_score,
    f1_score,
    mean_absolute_error,
    mean_squared_error,
    precision_score,
    recall_score,
    roc_auc_score,
)


@dataclass(frozen=True)
class BinaryEvalMetrics:
    size: int
    acc: float
    balanced_acc: float
    f1: float
    prec: float
    recall: float
    roc_auc: float
    avg_precision: float
    kappa: float


@dataclass(frozen=True)
class NumericEvalMetrics:
    size: int
    mse: float
    mae: float
    r2: float


def compute_binary_task_metrics(predictions: Sequence[float], labels: Sequence[float]) -> BinaryEvalMetrics:
    predictions = np.asarray(predictions, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.float64)
    normalized = predictions >= 0.5

    if labels.sum() == len(labels) or labels.sum() == 0:
        roc_auc = 0.0  # undefined for single-class — reference convention
    else:
        roc_auc = roc_auc_score(labels, predictions)

    return BinaryEvalMetrics(
        size=len(predictions),
        acc=accuracy_score(labels, normalized),
        balanced_acc=balanced_accuracy_score(labels, normalized),
        f1=f1_score(labels, normalized, zero_division=1),
        prec=precision_score(labels, normalized, zero_division=1),
        recall=recall_score(labels, normalized, zero_division=1),
        roc_auc=roc_auc,
        avg_precision=average_precision_score(labels, predictions),
        kappa=cohen_kappa_score(labels, normalized),
    )


def r2_score_os(y_true, y_pred, y_train_mean: float = 0.0) -> float:
    """Out-of-sample R² vs the support-mean baseline (0 after support-set
    standardization) — metrics.py:124-138."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    assert len(y_true) == len(y_pred)
    numerator = ((y_true - y_pred) ** 2).sum(axis=0, dtype=np.float64)
    denominator = ((y_true - y_train_mean) ** 2).sum(axis=0, dtype=np.float64)
    assert denominator != 0
    return float(np.average(1.0 - numerator / denominator))


def compute_numeric_task_metrics(predictions: Sequence[float], labels: Sequence[float]) -> NumericEvalMetrics:
    assert len(predictions) == len(labels)
    return NumericEvalMetrics(
        size=len(predictions),
        mse=float(mean_squared_error(y_true=labels, y_pred=predictions)),
        mae=float(mean_absolute_error(y_true=labels, y_pred=predictions)),
        r2=r2_score_os(y_true=labels, y_pred=predictions),
    )


def _avg_metrics_list(results: List, metrics_cls) -> Dict[str, Tuple[float, float]]:
    out = {}
    for fld in dataclasses.fields(metrics_cls):
        vals = [getattr(r, fld.name) for r in results]
        out[fld.name] = (float(np.mean(vals)), float(np.std(vals)))
    return out


def avg_task_metrics_list(results: List[BinaryEvalMetrics]) -> Dict[str, Tuple[float, float]]:
    return _avg_metrics_list(results, BinaryEvalMetrics)


def avg_task_numeric_metrics_list(results: List[NumericEvalMetrics]) -> Dict[str, Tuple[float, float]]:
    return _avg_metrics_list(results, NumericEvalMetrics)


def _avg_over_tasks(task_results: Dict[str, List], metrics_cls) -> Dict[str, Tuple[float, float]]:
    per_task = {t: _avg_metrics_list(r, metrics_cls) for t, r in task_results.items() if r}
    out = {}
    for fld in dataclasses.fields(metrics_cls):
        vals = [m[fld.name][0] for m in per_task.values()]
        out[fld.name] = (float(np.mean(vals)), float(np.std(vals)))
    return out


def avg_metrics_over_tasks(task_results: Dict[str, List[BinaryEvalMetrics]]) -> Dict[str, Tuple[float, float]]:
    return _avg_over_tasks(task_results, BinaryEvalMetrics)


def avg_numeric_metrics_over_tasks(task_results: Dict[str, List[NumericEvalMetrics]]) -> Dict[str, Tuple[float, float]]:
    return _avg_over_tasks(task_results, NumericEvalMetrics)
