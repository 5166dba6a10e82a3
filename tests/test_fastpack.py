"""Parity: vectorized cached episode assembly (data/fastpack.py) must be
byte-identical to the reference-semantics packer (data/episodes.py) and
the dense re-layout (ops/dense_block.py)."""

import jax
import numpy as np
import pytest

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
from adkf_ift_tpu.data.task import Task
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


@pytest.mark.parametrize("force_python", [True, False])
def test_episode_stream_wire_fast_path_matches_after_decompress(
    tmp_path, monkeypatch, force_python
):
    """wire_budget assembly emits compressed dtypes + SparseCounts fps;
    after the codec + on-device decompress it must equal the slow path."""
    import functools

    from adkf_ift_tpu.data import FSMolDataset
    from adkf_ift_tpu.data.dataset import DataFold
    from adkf_ift_tpu.data import native as native_loader
    from adkf_ift_tpu.data.episodes import stack_episodes
    from adkf_ift_tpu.train.loop import episode_stream
    from adkf_ift_tpu.utils.synthetic import make_dataset_dir
    from adkf_ift_tpu.utils.wire import SparseCounts, WireCodec, decompress_batch

    if force_python:
        monkeypatch.setattr(native_loader, "native_available", lambda: False)

    root = make_dataset_dir(
        str(tmp_path / "d"), num_train=3, num_valid=0, num_test=0, samples_per_task=96
    )
    ds = FSMolDataset.from_directory(root)
    transform = functools.partial(episode_to_dense, nodes_per_graph=48, k_per_type=(6, 4, 4))
    wire_eps = list(
        episode_stream(ds, DataFold.TRAIN, SPEC, repeat=False, num_workers=0,
                       episode_transform=transform, wire_budget=192)
    )
    flat_eps = list(
        episode_stream(ds, DataFold.TRAIN, SPEC, repeat=False, num_workers=0)
    )
    assert len(wire_eps) == len(flat_eps) == 3
    # wire dtypes actually on the wire
    assert isinstance(wire_eps[0].support.fingerprints, SparseCounts)
    assert wire_eps[0].support.node_mask.dtype == np.uint8
    assert wire_eps[0].support.in_src[0].dtype == np.int8

    codec = WireCodec(sparse_counts_budget=192)
    got = decompress_batch(codec.compress(stack_episodes(wire_eps)))
    want = decompress_batch(
        codec.compress(stack_episodes([transform(ep) for ep in flat_eps]))
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_normalize_fp_mixed_batch_stacks():
    """A batch mixing SparseCounts and dense fingerprint episodes must
    densify + stack + decompress to the dense values."""
    from adkf_ift_tpu.data.episodes import stack_episodes
    from adkf_ift_tpu.train.loop import _device_batch_pipeline  # noqa: F401
    from adkf_ift_tpu.utils.wire import densify_counts_host

    task = make_task("FASTW", num_samples=128, seed=2)
    sampler = StratifiedTaskSampler(SPEC.support_size, test_size_or_ratio=SPEC.query_size)
    pack = TaskPack.from_task(task)
    dpack = DenseTaskPack.from_task_pack(pack, nodes_per_graph=48, k_per_type=(6, 4, 4))
    wpack = dpack.wireized(192)
    s = sampler.sample(task, seed=0)
    sparse_ep = assemble_dense_episode(wpack, s, SPEC)
    dense_ep = assemble_dense_episode(dpack, s, SPEC)
    np.testing.assert_array_equal(
        densify_counts_host(sparse_ep.support.fingerprints),
        np.asarray(dense_ep.support.fingerprints),
    )
    # mixed batch: stack after densify must not raise
    fixed = stack_episodes([
        dense_ep,
        dense_ep._replace(
            support=dense_ep.support._replace(
                fingerprints=densify_counts_host(sparse_ep.support.fingerprints)
            )
        ),
    ])
    assert np.asarray(fixed.support.fingerprints).shape[0] == 2


def test_stream_pack_cache_across_epochs_matches(tmp_path, monkeypatch):
    """repeat=True re-reads tasks with FRESH datapoint objects each epoch;
    cached wire packs must still assemble the correct episodes (indices
    resolved against the current load, not the pack's original objects)."""
    import functools
    import itertools

    from adkf_ift_tpu.data import FSMolDataset
    from adkf_ift_tpu.data.dataset import DataFold
    from adkf_ift_tpu.data import native as native_loader
    from adkf_ift_tpu.data.episodes import stack_episodes
    from adkf_ift_tpu.train.loop import episode_stream
    from adkf_ift_tpu.utils.synthetic import make_dataset_dir
    from adkf_ift_tpu.utils.wire import WireCodec, decompress_batch

    monkeypatch.setattr(native_loader, "native_available", lambda: False)
    root = make_dataset_dir(
        str(tmp_path / "d"), num_train=2, num_valid=0, num_test=0, samples_per_task=96
    )
    ds = FSMolDataset.from_directory(root)
    transform = functools.partial(episode_to_dense, nodes_per_graph=48, k_per_type=(6, 4, 4))
    stream = episode_stream(ds, DataFold.TRAIN, SPEC, repeat=True, num_workers=0,
                            episode_transform=transform, wire_budget=192)
    eps = list(itertools.islice(stream, 6))  # 3 epochs x 2 tasks

    # Epoch 2/3 episodes (cached packs + fresh Task objects) must match the
    # slow path at the same (path, idx) seeds after the wire round-trip.
    paths = ds.get_fold_paths(DataFold.TRAIN)
    slow = []
    for idx in range(6):
        p = paths[idx % 2]
        task = Task.load_from_file(p)
        sample = StratifiedTaskSampler(
            SPEC.support_size, test_size_or_ratio=SPEC.query_size
        ).sample(task, seed=idx)
        slow.append(transform(build_episode(sample, SPEC)))

    codec = WireCodec(sparse_counts_budget=192)
    got = decompress_batch(codec.compress(stack_episodes(eps)))
    want = decompress_batch(codec.compress(stack_episodes(slow)))
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wireized_dtype_edges():
    """Wireized packs: >255 counts widen to uint16, non-integral features
    stay float32, fp budget overflow falls back to dense counts."""
    task = make_task("FASTE", num_samples=64, seed=4)
    pack = TaskPack.from_task(task)
    dpack = DenseTaskPack.from_task_pack(pack, nodes_per_graph=48, k_per_type=(6, 4, 4))

    # counts >255 in fingerprints -> sparse values widen to uint16
    big = dpack.fingerprints.copy()
    big[0, 0] = 300.0
    import dataclasses
    w = dataclasses.replace(dpack, fingerprints=big).wireized(192)
    assert w.fp_vals.dtype == np.uint16

    # non-integral node features stay f32
    nf = dpack.node_features.copy()
    nf[0, 0, 0] = 0.5
    w2 = dataclasses.replace(dpack, node_features=nf).wireized(192)
    assert w2.node_features.dtype == np.float32
    assert w2.node_mask.dtype == np.uint8

    # fp rows denser than the budget -> dense (narrowed) fallback
    dense_fp = np.ones_like(dpack.fingerprints)
    w3 = dataclasses.replace(dpack, fingerprints=dense_fp).wireized(8)
    assert w3.fp_idx is None
    assert w3.fingerprints.dtype == np.uint8
    assert w3.fingerprints.shape == dense_fp.shape

    # negative (non-count) fingerprints -> f32 dense fallback
    neg_fp = dpack.fingerprints.copy()
    neg_fp[0, 0] = -1.0
    w4 = dataclasses.replace(dpack, fingerprints=neg_fp).wireized(192)
    assert w4.fp_idx is None and w4.fingerprints.dtype == np.float32
