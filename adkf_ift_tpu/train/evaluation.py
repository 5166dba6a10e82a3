"""Few-shot evaluation harness — parity with fs_mol/utils/test_utils.py.

For each task in a fold × each support size × num_samples seeds:
stratified-sample an episode (seed = base_seed + run_idx), run the
model's episode evaluator, collect metrics, and optionally write the
per-task CSV with the reference's exact column schema (incl. the
delta_auprc column, test_utils.py:165-233) so the reference's
plotting/collation tooling keeps working on our outputs.

TPU note: episodes are padded to the nearest registered EpisodeSpec and
query sets are chunked to the spec's query budget, so the evaluator
compiles once per (support, query) bucket instead of once per task.
"""

from __future__ import annotations

import csv
import dataclasses
import logging
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset
from adkf_ift_tpu.data.episodes import Episode, EpisodeSpec, build_episode
from adkf_ift_tpu.data.samplers import (
    DatasetClassTooSmallException,
    DatasetTooSmallException,
    FoldTooSmallException,
    StratifiedTaskSampler,
)
from adkf_ift_tpu.data.task import Task, TaskSample
from adkf_ift_tpu.utils.metrics import (
    BinaryEvalMetrics,
    NumericEvalMetrics,
    compute_binary_task_metrics,
    compute_numeric_task_metrics,
)

# Eval-process memory telemetry (VERDICT r4 #8): ADKF_EVAL_MEMLOG=N logs
# host RSS, live jax arrays, and GC pressure every N evaluated episodes.
# The known tunnel h2d staging leak is bytes-proportional
# (docs/TUNNEL_LEAK.md); this hook exists to attribute any growth BEYOND
# that budget (e.g. the round-4 32 GB eval incident) to live-buffer or
# cache accumulation instead of guessing.
_MEMLOG_EVERY = int(os.environ.get("ADKF_EVAL_MEMLOG", "0") or 0)


def _memlog(tag: str) -> None:
    import gc

    rss_kb = 0
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    rss_kb = int(line.split()[1])
                    break
    except OSError:
        pass
    try:
        import jax

        arrs = jax.live_arrays()
        n_live, live_mb = len(arrs), sum(a.nbytes for a in arrs) / 1e6
    except Exception:  # noqa: BLE001 — telemetry must never break eval
        n_live, live_mb = -1, -1.0
    logger.info(
        "MEMLOG %s rss_mb %.1f live_arrays %d live_mb %.1f gc_objects %d",
        tag, rss_kb / 1024.0, n_live, live_mb, len(gc.get_objects()),
    )

logger = logging.getLogger(__name__)

DEFAULT_SUPPORT_SIZES = [16, 32, 64, 128, 256]  # test_utils.py:85-89


@dataclass(frozen=True)
class TaskSampleEvalResults(BinaryEvalMetrics):
    task_name: str = ""
    seed: int = 0
    num_train: int = 0
    num_test: int = 0
    fraction_pos_train: float = 0.0
    fraction_pos_test: float = 0.0


@dataclass(frozen=True)
class TaskSampleEvalResultsNumeric(NumericEvalMetrics):
    task_name: str = ""
    seed: int = 0
    num_train: int = 0
    num_test: int = 0


# An episode evaluator returns (predictions, labels) over the REAL query
# points of an Episode. For classification, predictions are probabilities.
EpisodeEvaluator = Callable[[Episode, int], Tuple[np.ndarray, np.ndarray]]


def is_valid_numeric_task(task: Task) -> bool:
    """Regression task filter (test_utils.py:274-282 / data/dkt.py:182-190):
    drop %-inhibition-like (all values in [0,100]), nonpositive, inf/nan."""
    labels = np.asarray([s.numeric_label for s in task.samples])
    if np.all(labels >= 0.0) and np.all(labels <= 100.0):
        return False
    if np.any(labels <= 0.0) or np.any(np.isinf(labels)) or np.any(np.isnan(labels)):
        return False
    return True


def eval_model(
    evaluate_episode: EpisodeEvaluator,
    dataset: FSMolDataset,
    support_sizes: List[int] = DEFAULT_SUPPORT_SIZES,
    out_dir: Optional[str] = None,
    num_samples: int = 10,
    test_size_or_ratio: Optional[Union[int, float, Tuple[int, int]]] = None,
    fold: DataFold = DataFold.TEST,
    seed: int = 0,
    filter_numeric_labels: bool = False,
    query_budget: int = 256,
    episode_spec_fn: Optional[Callable[[int], EpisodeSpec]] = None,
    num_workers: int = 0,
    episode_transform: Optional[Callable] = None,
    wire_budget: Optional[int] = None,
    skip_existing: bool = False,
) -> Dict[str, List]:
    """Evaluate over a fold; returns {task_name: [results...]}.

    `skip_existing`: resume semantics — tasks whose per-task CSV already
    exists (non-empty) in `out_dir` are skipped, so a crashed sweep can
    be re-run into the same directory and only pay for missing tasks.

    `wire_budget`: assemble dense-layout episodes directly in wire dtypes
    (sparse fingerprints etc., fastpack.DenseTaskPack.wireized) — only
    valid when `evaluate_episode` ships episodes through the wire codec +
    on-device decompress (train/evaluators.make_predict_fn does)."""
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
    spec_fn = episode_spec_fn or (lambda s: EpisodeSpec(support_size=s, query_size=query_budget))

    # One cached pack per task (flat TaskPack, or DenseTaskPack when the
    # transform is the dense re-layout): eval samples sizes×seeds×chunks
    # episodes per task, so the vectorized fastpack assembly amortizes
    # the per-molecule Python packing to once per task.
    from adkf_ift_tpu.data import fastpack

    dense_kw = fastpack.dense_transform_kwargs(episode_transform)
    use_fastpack = episode_transform is None or dense_kw is not None

    task_to_results: Dict[str, List] = {}
    episodes_done = 0
    for task in dataset.get_task_reading_iterable(fold, num_workers=num_workers):
        if filter_numeric_labels and not is_valid_numeric_task(task):
            continue
        if skip_existing and out_dir is not None:
            existing = os.path.join(out_dir, f"{task.name}_eval_results.csv")
            if os.path.exists(existing) and os.path.getsize(existing) > 0:
                with open(existing) as f:
                    n_rows = sum(1 for _ in f) - 1
                if n_rows > 0:
                    logger.info("resume: %s already has %d rows, skipping", task.name, n_rows)
                    continue
        pack = (
            fastpack.task_pack_for(
                task,
                dense_kw,
                wire_budget=wire_budget if dense_kw is not None else None,
            )
            if use_fastpack
            else None
        )
        results = []
        for train_size in support_sizes:
            sampler = StratifiedTaskSampler(
                train_size_or_ratio=train_size,
                test_size_or_ratio=test_size_or_ratio,
                allow_smaller_test=True,
            )
            for run_idx in range(num_samples):
                local_seed = seed + run_idx
                try:
                    task_sample = sampler.sample(task, seed=local_seed)
                except (
                    DatasetTooSmallException,
                    DatasetClassTooSmallException,
                    FoldTooSmallException,
                    ValueError,
                ) as e:
                    logger.debug("Skipping %s@%d seed %d: %s", task.name, train_size, local_seed, e)
                    continue

                preds, labels = _evaluate_sample_chunked(
                    evaluate_episode, task_sample, spec_fn(train_size), local_seed,
                    filter_numeric_labels, query_budget,
                    episode_transform=episode_transform,
                    pack=pack, dense=dense_kw is not None,
                )
                episodes_done += 1
                if _MEMLOG_EVERY and episodes_done % _MEMLOG_EVERY == 0:
                    _memlog(f"{task.name}@{train_size} ep{episodes_done}")
                if filter_numeric_labels:
                    metrics = compute_numeric_task_metrics(preds, labels)
                    results.append(
                        TaskSampleEvalResultsNumeric(
                            task_name=task.name,
                            seed=local_seed,
                            num_train=train_size,
                            num_test=len(task_sample.test_samples),
                            **dataclasses.asdict(metrics),
                        )
                    )
                else:
                    metrics = compute_binary_task_metrics(preds, labels)
                    results.append(
                        TaskSampleEvalResults(
                            task_name=task.name,
                            seed=local_seed,
                            num_train=train_size,
                            num_test=len(task_sample.test_samples),
                            fraction_pos_train=task_sample.train_pos_label_ratio,
                            fraction_pos_test=task_sample.test_pos_label_ratio,
                            **dataclasses.asdict(metrics),
                        )
                    )
        task_to_results[task.name] = results
        if out_dir is not None:
            path = os.path.join(out_dir, f"{task.name}_eval_results.csv")
            if filter_numeric_labels:
                write_csv_summary_numeric(path, results)
            else:
                write_csv_summary(path, results)
    return task_to_results


def _evaluate_sample_chunked(
    evaluate_episode: EpisodeEvaluator,
    task_sample: TaskSample,
    spec: EpisodeSpec,
    seed: int,
    regression: bool,
    query_budget: int,
    episode_transform: Optional[Callable] = None,
    pack=None,
    dense: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chunk the query set to the spec's static budget (the reference's
    multi-batch eval, run_on_batches) and concatenate predictions.
    `episode_transform` re-lays each padded episode (e.g. dense-block
    layout for the Pallas MP path, ops/dense_block.episode_to_dense);
    `pack` is an optional cached fastpack Task/DenseTaskPack for the
    task that assembles byte-identical episodes without the per-episode
    Python packing loop."""
    from adkf_ift_tpu.data import fastpack

    all_preds, all_labels = [], []
    test = task_sample.test_samples
    for start in range(0, len(test), spec.query_size):
        chunk = TaskSample(
            name=task_sample.name,
            train_samples=task_sample.train_samples,
            valid_samples=[],
            test_samples=test[start : start + spec.query_size],
        )
        if pack is not None:
            assemble = fastpack.assemble_dense_episode if dense else fastpack.assemble_episode
            episode = assemble(pack, chunk, spec, regression=regression)
        else:
            episode = build_episode(chunk, spec, regression=regression)
            if episode_transform is not None:
                episode = episode_transform(episode)
        n_real = len(chunk.test_samples)
        preds, labels = evaluate_episode(episode, seed)
        all_preds.append(np.asarray(preds)[:n_real])
        all_labels.append(np.asarray(labels)[:n_real])
    return np.concatenate(all_preds), np.concatenate(all_labels)


def write_csv_summary(output_csv_file: str, test_results) -> None:
    fieldnames = [
        "num_train_requested", "num_train", "fraction_positive_train",
        "num_test", "fraction_positive_test", "seed", "valid_score",
        "average_precision_score", "roc_auc", "acc", "balanced_acc",
        "precision", "recall", "f1_score", "delta_auprc",
    ]
    with open(output_csv_file, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        for r in test_results:
            writer.writerow(
                {
                    "num_train_requested": r.num_train,
                    "num_train": r.num_train,
                    "num_test": r.num_test,
                    "fraction_positive_train": r.fraction_pos_train,
                    "fraction_positive_test": r.fraction_pos_test,
                    "seed": r.seed,
                    "average_precision_score": r.avg_precision,
                    "roc_auc": r.roc_auc,
                    "acc": r.acc,
                    "balanced_acc": r.balanced_acc,
                    "precision": r.prec,
                    "recall": r.recall,
                    "f1_score": r.f1,
                    "delta_auprc": r.avg_precision - r.fraction_pos_test,
                }
            )


def write_csv_summary_numeric(output_csv_file: str, test_results) -> None:
    fieldnames = ["num_train_requested", "num_train", "num_test", "seed", "mse", "mae", "r2"]
    with open(output_csv_file, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        for r in test_results:
            writer.writerow(
                {
                    "num_train_requested": r.num_train,
                    "num_train": r.num_train,
                    "num_test": r.num_test,
                    "seed": r.seed,
                    "mse": r.mse,
                    "mae": r.mae,
                    "r2": r.r2,
                }
            )
