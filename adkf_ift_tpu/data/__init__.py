"""Data layer: FS-Mol-compatible task store, seeded samplers, static
padded episode packing, and prefetching readers (SURVEY.md §2.1-2.2)."""

from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset
from adkf_ift_tpu.data.episodes import (
    Episode,
    EpisodeOverflowError,
    EpisodeSpec,
    GraphPadSpec,
    PackedGraphs,
    build_episode,
    pack_graphs,
    stack_episodes,
)
from adkf_ift_tpu.data.reader import BackgroundReader
from adkf_ift_tpu.data.samplers import (
    BalancedTaskSampler,
    DatasetClassTooSmallException,
    DatasetTooSmallException,
    FoldTooSmallException,
    RandomTaskSampler,
    SamplingException,
    StratifiedTaskSampler,
    TaskSampler,
)
from adkf_ift_tpu.data.task import (
    DESCRIPTOR_DIM,
    FINGERPRINT_DIM,
    NUM_EDGE_TYPES,
    NUM_NODE_FEATURES,
    GraphData,
    MoleculeDatapoint,
    Task,
    TaskSample,
    task_name_from_path,
)

__all__ = [
    "BackgroundReader",
    "BalancedTaskSampler",
    "DESCRIPTOR_DIM",
    "DataFold",
    "DatasetClassTooSmallException",
    "DatasetTooSmallException",
    "Episode",
    "EpisodeOverflowError",
    "EpisodeSpec",
    "FINGERPRINT_DIM",
    "FSMolDataset",
    "FoldTooSmallException",
    "GraphData",
    "GraphPadSpec",
    "MoleculeDatapoint",
    "NUM_EDGE_TYPES",
    "NUM_NODE_FEATURES",
    "PackedGraphs",
    "RandomTaskSampler",
    "SamplingException",
    "StratifiedTaskSampler",
    "Task",
    "TaskSample",
    "TaskSampler",
    "build_episode",
    "pack_graphs",
    "stack_episodes",
    "task_name_from_path",
]
