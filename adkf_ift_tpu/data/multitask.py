"""Multitask batch construction — parity with fs_mol/data/multitask.py:34-185.

The reference draws chunks of `task_chunk_size` (8) train tasks, samples
up to 1024 datapoints across them, and flattens into mixed batches with
a `sample_to_task_id` vector. Here batches are PADDED to a fixed graph
count so the multitask pretraining step compiles once: each batch is a
PackedGraphs mega-graph + [num_graphs] task-id / ±1-label / mask arrays.
Regression labels are standardized per task over the DRAWN samples
(multitask.py:150-163 semantics).
"""

from __future__ import annotations

import random
from typing import Iterator, List, NamedTuple, Optional

import numpy as np

from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset
from adkf_ift_tpu.data.episodes import GraphPadSpec, PackedGraphs, pack_graphs
from adkf_ift_tpu.data.task import MoleculeDatapoint, Task


class MultitaskBatch(NamedTuple):
    graphs: PackedGraphs
    sample_to_task_id: np.ndarray  # [num_graphs] i32
    labels: np.ndarray  # [num_graphs] 0/1 f32
    numeric_labels: np.ndarray  # [num_graphs] f32 (standardized per task)

    @property
    def num_graphs(self) -> int:
        return self.graphs.num_graphs


def build_multitask_batch(
    samples: List[MoleculeDatapoint],
    task_ids: List[int],
    batch_graphs: int,
    nodes_per_graph: int = 48,
    edges_per_graph: int = 112,
    numeric: Optional[List[float]] = None,
) -> MultitaskBatch:
    spec = GraphPadSpec.for_graphs(batch_graphs, nodes_per_graph, edges_per_graph)
    packed = pack_graphs(samples, spec)
    ids = np.zeros((batch_graphs,), np.int32)
    ids[: len(task_ids)] = np.asarray(task_ids, np.int32)
    labels = np.zeros((batch_graphs,), np.float32)
    labels[: len(samples)] = [1.0 if s.bool_label else 0.0 for s in samples]
    numeric_arr = np.zeros((batch_graphs,), np.float32)
    if numeric is not None:
        numeric_arr[: len(numeric)] = np.asarray(numeric, np.float32)
    return MultitaskBatch(packed, ids, labels, numeric_arr)


class MultitaskTaskSampleBatchIterable:
    """Stream mixed-task batches from the train fold
    (MultitaskTaskSampleBatchIterable, fs_mol/data/multitask.py:88-185)."""

    def __init__(
        self,
        dataset: FSMolDataset,
        data_fold: DataFold = DataFold.TRAIN,
        task_name_to_id: Optional[dict] = None,
        max_num_graphs: int = 128,
        task_chunk_size: int = 8,
        samples_per_chunk: int = 1024,
        standardize_numeric: bool = False,
        seed: int = 0,
        repeat: bool = True,
        nodes_per_graph: int = 48,
        edges_per_graph: int = 112,
    ):
        self._dataset = dataset
        self._fold = data_fold
        self._task_name_to_id = task_name_to_id or {
            name: i for i, name in enumerate(dataset.get_task_names(data_fold))
        }
        self._max_num_graphs = max_num_graphs
        self._task_chunk_size = task_chunk_size
        self._samples_per_chunk = samples_per_chunk
        self._standardize_numeric = standardize_numeric
        self._seed = seed
        self._repeat = repeat
        self._nodes = nodes_per_graph
        self._edges = edges_per_graph

    @property
    def num_tasks(self) -> int:
        return len(self._task_name_to_id)

    def __iter__(self) -> Iterator[MultitaskBatch]:
        rng = random.Random(self._seed)
        epoch = 0
        while True:
            paths = list(self._dataset.fold_to_paths.get(self._fold, []))
            rng.shuffle(paths)
            for start in range(0, len(paths), self._task_chunk_size):
                chunk_paths = paths[start : start + self._task_chunk_size]
                pool: List[tuple] = []  # (sample, task_id, std_numeric)
                for path in chunk_paths:
                    try:
                        task = Task.load_from_file(path)
                    except Exception:  # noqa: BLE001
                        continue
                    tid = self._task_name_to_id.get(task.name)
                    if tid is None:
                        continue
                    samples = list(task.samples)
                    rng.shuffle(samples)
                    take = samples[: max(1, self._samples_per_chunk // max(len(chunk_paths), 1))]
                    if self._standardize_numeric:
                        vals = np.asarray([s.numeric_label for s in take], np.float64)
                        std = vals.std() or 1.0
                        stds = ((vals - vals.mean()) / std).astype(np.float32)
                    else:
                        stds = np.zeros((len(take),), np.float32)
                    pool.extend((s, tid, z) for s, z in zip(take, stds))
                rng.shuffle(pool)
                for bstart in range(0, len(pool), self._max_num_graphs):
                    part = pool[bstart : bstart + self._max_num_graphs]
                    if len(part) < 2:  # reference drops trailing 1-graph batches
                        continue
                    try:
                        yield build_multitask_batch(
                            [p[0] for p in part],
                            [p[1] for p in part],
                            self._max_num_graphs,
                            self._nodes,
                            self._edges,
                            numeric=[p[2] for p in part],
                        )
                    except Exception:  # noqa: BLE001 — budget overflow on huge molecules
                        continue
            epoch += 1
            if not self._repeat:
                return
