"""Dataset directory layout and fold handling.

Parity with fs_mol/data/fsmol_dataset.py:21-142: train/valid/test
subdirectories of one-file-per-task JSONL.gz, optional task-list JSON
filtering (datasets/fsmol-0.1.json style), and task-reading iterables.

The reference forks N reader processes (file_reader_iterable.py:63-311);
on TPU hosts a thread pool + bounded queue achieves the same overlap
without fork overhead, because episode packing is numpy-bound and
releases the GIL in the hot loops. See adkf_ift_tpu.data.reader.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Iterable, Iterator, List, Optional, TypeVar

from adkf_ift_tpu.data.reader import BackgroundReader
from adkf_ift_tpu.data.task import Task, task_name_from_path

logger = logging.getLogger(__name__)

T = TypeVar("T")


class DataFold(Enum):
    TRAIN = 0
    VALIDATION = 1
    TEST = 2


_FOLD_DIRS = {
    DataFold.TRAIN: "train",
    DataFold.VALIDATION: "valid",
    DataFold.TEST: "test",
}


@dataclass
class FSMolDataset:
    """Paths of per-task files for each fold."""

    fold_to_paths: dict = field(default_factory=dict)
    num_workers: int = 0

    @staticmethod
    def from_directory(
        directory: str,
        task_list_file: Optional[str] = None,
        num_workers: int = 0,
    ) -> "FSMolDataset":
        """Map {directory}/{train,valid,test}/*.jsonl.gz into folds,
        optionally filtered by a {"train": [...], "valid": [...],
        "test": [...]} task-list JSON (fsmol_dataset.py:64-112)."""
        task_filter = None
        if task_list_file is not None:
            with open(task_list_file, "rt") as f:
                task_filter = {k: set(v) for k, v in json.load(f).items()}

        fold_to_paths = {}
        for fold, sub in _FOLD_DIRS.items():
            fold_dir = os.path.join(directory, sub)
            paths: List[str] = []
            if os.path.isdir(fold_dir):
                for name in sorted(os.listdir(fold_dir)):
                    if not (name.endswith(".jsonl.gz") or name.endswith(".jsonl")):
                        continue
                    path = os.path.join(fold_dir, name)
                    if task_filter is not None:
                        allowed = task_filter.get(sub, task_filter.get(_FOLD_DIRS[fold]))
                        if allowed is not None and task_name_from_path(path) not in allowed:
                            continue
                    paths.append(path)
            fold_to_paths[fold] = paths
        return FSMolDataset(fold_to_paths=fold_to_paths, num_workers=num_workers)

    def get_num_fold_tasks(self, fold: DataFold) -> int:
        return len(self.fold_to_paths.get(fold, []))

    def get_fold_paths(self, fold: DataFold, shard: Optional[tuple] = None) -> List[str]:
        """Per-task file paths of a fold; `shard=(index, count)` stripes
        them across hosts (see get_task_reading_iterable)."""
        paths = self.fold_to_paths.get(fold, [])
        if shard is not None:
            index, count = shard
            paths = paths[index::count]
        return paths

    def get_task_names(self, fold: DataFold) -> List[str]:
        return [task_name_from_path(p) for p in self.fold_to_paths.get(fold, [])]

    def get_task_reading_iterable(
        self,
        data_fold: DataFold,
        task_reader_fn: Optional[Callable[[List[str], int], Iterable[T]]] = None,
        repeat: bool = False,
        reader_chunk_size: int = 1,
        num_workers: Optional[int] = None,
        shard: Optional[tuple] = None,
    ) -> Iterable[T]:
        """Iterate reader_fn outputs over per-task files, optionally with
        background-thread prefetch (the num_workers>0 analogue of the
        reference's multiprocess BufferedFileReaderIterable).

        `shard=(index, count)` stripes the task-file list across hosts
        (multi-host data loading: each process reads a disjoint subset;
        the reference is single-process and has no counterpart)."""
        paths = self.get_fold_paths(data_fold, shard)
        reader = task_reader_fn or _default_reader
        workers = self.num_workers if num_workers is None else num_workers
        if workers and workers > 0:
            return BackgroundReader(
                paths=paths,
                reader_fn=reader,
                num_workers=workers,
                repeat=repeat,
                chunk_size=reader_chunk_size,
            )
        return _SequentialReader(paths, reader, repeat, reader_chunk_size)


def _default_reader(paths: List[str], idx: int) -> Iterator[Task]:
    for p in paths:
        try:
            yield Task.load_from_file(p)
        except Exception:  # noqa: BLE001 — skip unreadable task files like the reference
            logger.exception("Failed to read task file %s", p)


class _SequentialReader:
    """In-process fallback (reference: SequentialFileReaderIterable)."""

    def __init__(self, paths, reader_fn, repeat, chunk_size):
        self._paths = paths
        self._reader_fn = reader_fn
        self._repeat = repeat
        self._chunk_size = chunk_size

    def __iter__(self):
        idx = 0
        while True:
            for i in range(0, len(self._paths), self._chunk_size):
                chunk = self._paths[i : i + self._chunk_size]
                result = self._reader_fn(chunk, idx)
                if result is None:
                    idx += 1
                    continue
                yield from result
                idx += 1
            if not self._repeat:
                return
