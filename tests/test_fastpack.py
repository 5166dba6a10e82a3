"""Parity: vectorized cached episode assembly (data/fastpack.py) must be
byte-identical to the reference-semantics packer (data/episodes.py) and
the dense re-layout (ops/dense_block.py)."""

import jax
import numpy as np
import pytest

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
from adkf_ift_tpu.data.fastpack import (
    DenseTaskPack,
    EpisodeAssembler,
    TaskPack,
    assemble_dense_episode,
    assemble_episode,
)
from adkf_ift_tpu.ops.dense_block import episode_to_dense
from adkf_ift_tpu.utils.synthetic import make_task


SPEC = EpisodeSpec(support_size=16, query_size=32, nodes_per_graph=32, edges_per_graph=(56, 16, 8))


def _episode_pair(seed, regression=False):
    task = make_task("FAST0", num_samples=128, seed=3)
    sampler = StratifiedTaskSampler(SPEC.support_size, test_size_or_ratio=SPEC.query_size)
    sample = sampler.sample(task, seed=seed)
    slow = build_episode(sample, SPEC, regression=regression)
    pack = TaskPack.from_task(task)
    fast = assemble_episode(pack, sample, SPEC, regression=regression)
    return task, sample, slow, fast, pack


def _assert_tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("seed", [0, 7])
def test_flat_assembly_byte_identical(seed):
    _, _, slow, fast, _ = _episode_pair(seed)
    _assert_tree_equal(slow, fast)


def test_flat_assembly_regression_labels_match():
    task = make_task("FASTR", num_samples=128, seed=5)
    sampler = StratifiedTaskSampler(SPEC.support_size, test_size_or_ratio=SPEC.query_size)
    sample = sampler.sample(task, seed=1)
    slow = build_episode(sample, SPEC, regression=True)
    fast = assemble_episode(TaskPack.from_task(task), sample, SPEC, regression=True)
    _assert_tree_equal(slow, fast)


@pytest.mark.parametrize("k_per_type", [(6, 4, 4), (6, 4, 3)])
def test_dense_assembly_byte_identical(k_per_type):
    task, sample, slow, _, pack = _episode_pair(11)
    slow_dense = episode_to_dense(slow, nodes_per_graph=48, k_per_type=k_per_type)
    dpack = DenseTaskPack.from_task_pack(pack, nodes_per_graph=48, k_per_type=k_per_type)
    fast_dense = assemble_dense_episode(dpack, sample, SPEC)
    _assert_tree_equal(slow_dense, fast_dense)


def test_assembler_caches_per_task_and_matches():
    task = make_task("FASTC", num_samples=128, seed=9)
    sampler = StratifiedTaskSampler(SPEC.support_size, test_size_or_ratio=SPEC.query_size)
    asm = EpisodeAssembler(SPEC, dense=(48, (6, 4, 4)))
    s1 = sampler.sample(task, seed=0)
    e1 = asm.episode(task, s1)
    assert len(asm._cache) == 1
    e2 = asm.episode(task, sampler.sample(task, seed=1))
    assert len(asm._cache) == 1  # cache hit, no second pack
    ref = episode_to_dense(build_episode(s1, SPEC), nodes_per_graph=48, k_per_type=(6, 4, 4))
    _assert_tree_equal(ref, e1)
    assert not np.array_equal(
        np.asarray(e1.support.fingerprints), np.asarray(e2.support.fingerprints)
    )


def _stream_pairs(tmp_path, monkeypatch, force_python):
    """Episodes from episode_stream with the dense transform (fast path)
    vs the same transform applied per episode on the flat stream."""
    import functools

    from adkf_ift_tpu.data import FSMolDataset
    from adkf_ift_tpu.data.dataset import DataFold
    from adkf_ift_tpu.data import native as native_loader
    from adkf_ift_tpu.train.loop import episode_stream
    from adkf_ift_tpu.utils.synthetic import make_dataset_dir

    if force_python:
        monkeypatch.setattr(native_loader, "native_available", lambda: False)

    root = make_dataset_dir(
        str(tmp_path / "d"), num_train=3, num_valid=0, num_test=0, samples_per_task=96
    )
    ds = FSMolDataset.from_directory(root)
    transform = functools.partial(episode_to_dense, nodes_per_graph=48, k_per_type=(6, 4, 4))
    dense = list(
        episode_stream(ds, DataFold.TRAIN, SPEC, repeat=False, num_workers=0,
                       episode_transform=transform)
    )
    flat = list(
        episode_stream(ds, DataFold.TRAIN, SPEC, repeat=False, num_workers=0)
    )
    return [transform(ep) for ep in flat], dense


@pytest.mark.parametrize("force_python", [True, False])
def test_episode_stream_dense_fast_path_matches(tmp_path, monkeypatch, force_python):
    slow, fast = _stream_pairs(tmp_path, monkeypatch, force_python)
    assert len(slow) == len(fast) == 3
    for a, b in zip(slow, fast):
        _assert_tree_equal(a, b)
