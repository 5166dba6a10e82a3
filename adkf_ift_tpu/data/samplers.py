"""Seeded task samplers: random, balanced, stratified.

Same seed-determinism contract as the reference
(fs_mol/data/fsmol_task_sampler.py:92-440): `sample(task, seed)` always
returns the same split for the same seed. The stratified sampler defers
to sklearn's StratifiedShuffleSplit exactly like the reference, so
episode draws are bit-compatible where it matters for apples-to-apples
metric comparison (SURVEY.md §7 hard part #6).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional, Tuple, Union

import numpy as np
from sklearn.model_selection import StratifiedShuffleSplit

from adkf_ift_tpu.data.task import Task, TaskSample


class SamplingException(Exception):
    pass


class DatasetTooSmallException(SamplingException):
    pass


class DatasetClassTooSmallException(SamplingException):
    pass


class FoldTooSmallException(SamplingException):
    pass


SizeOrRatio = Union[int, float]


def _compute_per_fold_nums(
    num_samples: int,
    train_size_or_ratio: SizeOrRatio,
    valid_size_or_ratio: SizeOrRatio,
    test_size_or_ratio: Optional[Union[int, float, Tuple[int, int]]] = 256,
) -> Tuple[int, int, int]:
    # Same resolution rules as fsmol_task_sampler.py:106-139.
    if isinstance(train_size_or_ratio, float):
        num_train = int(num_samples * train_size_or_ratio)
    else:
        num_train = min(num_samples, train_size_or_ratio)

    if isinstance(valid_size_or_ratio, int):
        num_valid = valid_size_or_ratio
    else:
        if valid_size_or_ratio > 0:
            num_valid = int(num_train * valid_size_or_ratio)
            num_train -= num_valid
        else:
            num_valid = 0
    num_remaining = num_samples - num_train - num_valid

    if test_size_or_ratio is None:
        num_test = num_remaining
    elif isinstance(test_size_or_ratio, int):
        num_test = test_size_or_ratio
    elif isinstance(test_size_or_ratio, tuple):
        min_num, target_num = test_size_or_ratio
        num_test = max(min_num, min(target_num, num_remaining))
    else:
        num_test = int(num_samples * test_size_or_ratio)

    return num_train, num_valid, num_test


class TaskSampler(ABC):
    @abstractmethod
    def sample(self, task: Task, seed: int = 0) -> TaskSample:
        ...


class RandomTaskSampler(TaskSampler):
    """Uniform split (fsmol_task_sampler.py:142-210)."""

    def __init__(
        self,
        train_size_or_ratio: SizeOrRatio = 128,
        valid_size_or_ratio: SizeOrRatio = 0,
        test_size_or_ratio: Optional[Union[int, float, Tuple[int, int]]] = 256,
        allow_smaller_test: bool = True,
    ):
        self._train = train_size_or_ratio
        self._valid = valid_size_or_ratio
        self._test = test_size_or_ratio
        self._allow_smaller_test = allow_smaller_test

    def sample(self, task: Task, seed: int = 0) -> TaskSample:
        rng = np.random.Generator(np.random.PCG64(seed=seed))
        samples = list(task.samples)
        num_samples = len(samples)
        rng.shuffle(samples)

        num_train, num_valid, num_test = _compute_per_fold_nums(
            num_samples, self._train, self._valid, self._test
        )
        num_remaining = num_samples - num_train - num_valid
        if num_test > num_remaining and self._allow_smaller_test:
            num_test = num_remaining
        if num_train + num_valid + num_test > num_samples:
            raise DatasetTooSmallException(
                f"{task.name}: {num_samples} samples < requested "
                f"{num_train}+{num_valid}+{num_test}"
            )
        return TaskSample(
            name=task.name,
            train_samples=samples[:num_train],
            valid_samples=samples[num_train : num_train + num_valid],
            test_samples=samples[-num_test:] if num_test > 0 else [],
        )


class BalancedTaskSampler(TaskSampler):
    """Equal positive/negative counts per fold (fsmol_task_sampler.py:213-296)."""

    def __init__(
        self,
        train_size_or_ratio: SizeOrRatio = 128,
        valid_size_or_ratio: SizeOrRatio = 0.0,
        test_size_or_ratio: Optional[Union[int, float, Tuple[int, int]]] = 256,
        allow_smaller_test: bool = True,
    ):
        self._train = train_size_or_ratio
        self._valid = valid_size_or_ratio
        self._test = test_size_or_ratio
        self._allow_smaller_test = allow_smaller_test

    def sample(self, task: Task, seed: int = 0) -> TaskSample:
        rng = np.random.Generator(np.random.PCG64(seed=seed))
        pos, neg = task.get_pos_neg_separated()
        rng.shuffle(pos)
        rng.shuffle(neg)

        num_train, num_valid, num_test = _compute_per_fold_nums(
            len(task.samples), self._train, self._valid, self._test
        )
        num_remaining = len(task.samples) - num_train - num_valid
        if num_test > num_remaining and self._allow_smaller_test:
            num_test = num_remaining

        needed = num_train // 2 + num_valid // 2 + num_test // 2
        if len(pos) < needed:
            raise DatasetClassTooSmallException(f"{task.name}: too few positives ({len(pos)})")
        if len(neg) < needed:
            raise DatasetClassTooSmallException(f"{task.name}: too few negatives ({len(neg)})")

        return TaskSample(
            name=task.name,
            train_samples=pos[: num_train // 2] + neg[: num_train // 2],
            valid_samples=(
                pos[num_train // 2 : num_train // 2 + num_valid // 2]
                + neg[num_train // 2 : num_train // 2 + num_valid // 2]
            ),
            test_samples=pos[-(num_test // 2) :] + neg[-(num_test // 2) :]
            if num_test > 0
            else [],
        )


class StratifiedTaskSampler(TaskSampler):
    """Label-stratified split via sklearn (fsmol_task_sampler.py:299-440) —
    the sampler used by every trainer and the eval harness."""

    def __init__(
        self,
        train_size_or_ratio: SizeOrRatio = 128,
        valid_size_or_ratio: SizeOrRatio = 0.0,
        test_size_or_ratio: Optional[Union[int, float, Tuple[int, int]]] = 256,
        allow_smaller_test: bool = True,
    ):
        self._train = train_size_or_ratio
        self._valid = valid_size_or_ratio
        self._test = test_size_or_ratio
        self._allow_smaller_test = allow_smaller_test

    def sample(self, task: Task, seed: int = 0) -> TaskSample:
        pos, neg = task.get_pos_neg_separated()
        num_pos, num_neg = len(pos), len(neg)
        num_samples = num_pos + num_neg
        samples = neg + pos
        labels = np.concatenate([np.zeros(num_neg), np.ones(num_pos)])
        indices = np.arange(num_samples)

        if isinstance(self._train, int):
            possible_test = num_samples - self._train
        else:
            possible_test = num_samples - int(num_samples * self._train)

        if self._test is None:
            num_test = possible_test
        else:
            if isinstance(self._test, int):
                num_test = self._test
            elif isinstance(self._test, tuple):
                min_num, target_num = self._test
                num_test = max(min_num, min(target_num, possible_test))
            else:
                num_test = int(self._test * num_samples)
            if self._allow_smaller_test:
                num_test = min(num_test, possible_test)

        if num_test < 2:
            raise DatasetTooSmallException(f"{task.name}: test fold would have {num_test} < 2")

        splitter = StratifiedShuffleSplit(
            n_splits=1, train_size=self._train, test_size=num_test, random_state=seed
        )
        train_valid_idxs, test_idxs = next(iter(splitter.split(X=indices, y=labels)))
        train_valid = [samples[i] for i in train_valid_idxs]
        test_samples = [samples[i] for i in test_idxs]
        if len(test_samples) < 2:
            raise FoldTooSmallException(f"{task.name}: test fold too small")

        if isinstance(self._valid, (int, float)) and self._valid > 0:
            splitter2 = StratifiedShuffleSplit(
                n_splits=1, test_size=self._valid, random_state=seed
            )
            tr_idx, va_idx = next(
                iter(
                    splitter2.split(
                        X=np.arange(len(train_valid)),
                        y=[s.bool_label for s in train_valid],
                    )
                )
            )
            train_samples = [train_valid[i] for i in tr_idx]
            valid_samples = [train_valid[i] for i in va_idx]
            n_pos_valid = sum(s.bool_label for s in valid_samples)
            if not (0 < n_pos_valid < len(valid_samples)):
                raise FoldTooSmallException(f"{task.name}: valid fold single-class")
        else:
            train_samples = train_valid
            valid_samples = []

        n_pos_train = sum(s.bool_label for s in train_samples)
        if not (0 < n_pos_train < len(train_samples)):
            raise FoldTooSmallException(f"{task.name}: train fold single-class")
        n_pos_test = sum(s.bool_label for s in test_samples)
        if not (0 < n_pos_test < len(test_samples)):
            raise FoldTooSmallException(f"{task.name}: test fold single-class")

        return TaskSample(
            name=task.name,
            train_samples=train_samples,
            valid_samples=valid_samples,
            test_samples=test_samples,
        )
