"""Data-layer tests: JSONL codec roundtrip, seeded sampler determinism,
stratification, padded episode packing correctness, dataset folds,
background reader."""

import os

import numpy as np
import pytest

from adkf_ift_tpu.data import (
    BalancedTaskSampler,
    DataFold,
    EpisodeOverflowError,
    EpisodeSpec,
    FSMolDataset,
    GraphPadSpec,
    RandomTaskSampler,
    StratifiedTaskSampler,
    Task,
    build_episode,
    pack_graphs,
    stack_episodes,
)
from adkf_ift_tpu.utils.synthetic import make_dataset_dir, make_task


def test_jsonl_roundtrip(tmp_path):
    task = make_task("ROUND", num_samples=10, seed=1)
    path = str(tmp_path / "ROUND.jsonl.gz")
    task.save_to_file(path)
    loaded = Task.load_from_file(path)
    assert loaded.name == "ROUND"
    assert len(loaded.samples) == 10
    for a, b in zip(task.samples, loaded.samples):
        assert a.smiles == b.smiles
        assert a.bool_label == b.bool_label
        assert np.isclose(a.numeric_label, b.numeric_label, rtol=1e-6)
        assert np.array_equal(a.fingerprint, b.fingerprint)
        assert np.allclose(a.graph.node_features, b.graph.node_features)
        for ae, be in zip(a.graph.adjacency_lists, b.graph.adjacency_lists):
            assert np.array_equal(ae, be)


@pytest.mark.parametrize("sampler_cls", [RandomTaskSampler, BalancedTaskSampler, StratifiedTaskSampler])
def test_sampler_determinism(sampler_cls):
    task = make_task(num_samples=100, seed=2)
    sampler = sampler_cls(train_size_or_ratio=16, test_size_or_ratio=32)
    s1 = sampler.sample(task, seed=7)
    s2 = sampler.sample(task, seed=7)
    assert [m.smiles for m in s1.train_samples] == [m.smiles for m in s2.train_samples]
    assert [m.smiles for m in s1.test_samples] == [m.smiles for m in s2.test_samples]
    s3 = sampler.sample(task, seed=8)
    assert [m.smiles for m in s1.train_samples] != [m.smiles for m in s3.train_samples]


def test_stratified_preserves_label_ratio():
    task = make_task(num_samples=200, seed=3)
    pos_frac = sum(s.bool_label for s in task.samples) / len(task.samples)
    sample = StratifiedTaskSampler(train_size_or_ratio=64, test_size_or_ratio=64).sample(task, 0)
    assert len(sample.train_samples) == 64
    assert abs(sample.train_pos_label_ratio - pos_frac) < 0.05
    assert abs(sample.test_pos_label_ratio - pos_frac) < 0.05


def test_sampler_disjoint_folds():
    task = make_task(num_samples=100, seed=4)
    s = StratifiedTaskSampler(train_size_or_ratio=16, test_size_or_ratio=32).sample(task, 0)
    train = {m.smiles for m in s.train_samples}
    test = {m.smiles for m in s.test_samples}
    assert not train & test


def test_pack_graphs_structure():
    task = make_task(num_samples=8, seed=5)
    spec = GraphPadSpec.for_graphs(8)
    packed = pack_graphs(task.samples, spec)

    total_nodes = sum(s.graph.num_nodes for s in task.samples)
    assert packed.node_mask.sum() == total_nodes
    assert packed.graph_mask.sum() == 8
    # node_to_graph ids are contiguous per molecule and padding maps to 8.
    for gi, s in enumerate(task.samples):
        assert (packed.node_to_graph == gi).sum() == s.graph.num_nodes
    assert (packed.node_to_graph[int(total_nodes):] == 8).all()

    # Bidirectional edges: each original edge appears in both directions.
    for t in range(3):
        orig = sum(s.graph.adjacency_lists[t].shape[0] for s in task.samples)
        assert packed.edge_mask[t].sum() == 2 * orig
    # Edges reference only real nodes (where masked on).
    for t in range(3):
        m = packed.edge_mask[t] > 0
        assert (packed.node_mask[packed.edge_sources[t][m]] == 1).all()
        assert (packed.node_mask[packed.edge_targets[t][m]] == 1).all()


def test_pack_overflow_raises():
    task = make_task(num_samples=16, seed=6)
    with pytest.raises(EpisodeOverflowError):
        pack_graphs(task.samples, GraphPadSpec(num_graphs=16, node_budget=32, edge_budgets=(64, 64, 64)))


def test_build_episode_classification_labels():
    task = make_task(num_samples=120, seed=7)
    sample = StratifiedTaskSampler(16, test_size_or_ratio=32).sample(task, 0)
    ep = build_episode(sample, EpisodeSpec(support_size=16, query_size=32))
    assert set(np.unique(ep.support_labels[:16])) <= {-1.0, 1.0}
    labels = [1.0 if m.bool_label else -1.0 for m in sample.train_samples]
    assert np.allclose(ep.support_labels[:16], labels)


def test_build_episode_regression_standardization():
    task = make_task(num_samples=120, seed=8)
    sample = StratifiedTaskSampler(32, test_size_or_ratio=64).sample(task, 0)
    ep = build_episode(sample, EpisodeSpec(support_size=32, query_size=64), regression=True)
    sup = ep.support_numeric_labels[:32]
    assert abs(sup.mean()) < 1e-5
    assert abs(sup.std() - 1.0) < 1e-4
    # Query standardized by SUPPORT stats: check against manual computation.
    logs = np.log([m.numeric_label for m in sample.train_samples])
    logq = np.log([m.numeric_label for m in sample.test_samples])
    expected = (logq - logs.mean()) / logs.std()
    assert np.allclose(ep.query_numeric_labels[: len(expected)], expected, atol=1e-5)


def test_stack_episodes():
    task = make_task(num_samples=120, seed=9)
    spec = EpisodeSpec(support_size=16, query_size=32)
    sampler = StratifiedTaskSampler(16, test_size_or_ratio=32)
    eps = [build_episode(sampler.sample(task, s), spec) for s in range(3)]
    stacked = stack_episodes(eps)
    assert stacked.support.node_features.shape[0] == 3
    assert stacked.support_labels.shape == (3, 16)


def test_dataset_from_directory(tmp_path):
    root = make_dataset_dir(str(tmp_path), num_train=3, num_valid=1, num_test=2, samples_per_task=40)
    ds = FSMolDataset.from_directory(root)
    assert ds.get_num_fold_tasks(DataFold.TRAIN) == 3
    assert ds.get_num_fold_tasks(DataFold.VALIDATION) == 1
    assert ds.get_num_fold_tasks(DataFold.TEST) == 2
    tasks = list(ds.get_task_reading_iterable(DataFold.TRAIN))
    assert len(tasks) == 3
    assert all(len(t.samples) == 40 for t in tasks)


def test_dataset_task_list_filter(tmp_path):
    import json

    root = make_dataset_dir(str(tmp_path), num_train=3, num_valid=1, num_test=1, samples_per_task=20)
    names = FSMolDataset.from_directory(root).get_task_names(DataFold.TRAIN)
    list_file = str(tmp_path / "list.json")
    with open(list_file, "w") as f:
        json.dump({"train": names[:2], "valid": [], "test": []}, f)
    ds = FSMolDataset.from_directory(root, task_list_file=list_file)
    assert ds.get_num_fold_tasks(DataFold.TRAIN) == 2
    assert ds.get_num_fold_tasks(DataFold.VALIDATION) == 0


def test_dataset_host_sharding_is_a_partition(tmp_path):
    """shard=(i, n) stripes the task files: every task lands on exactly
    one shard (the multi-host data-loading contract)."""
    root = make_dataset_dir(str(tmp_path), num_train=5, num_valid=0, num_test=0, samples_per_task=20)
    ds = FSMolDataset.from_directory(root)
    seen = []
    for i in range(2):
        tasks = list(ds.get_task_reading_iterable(DataFold.TRAIN, shard=(i, 2)))
        seen.extend(t.name for t in tasks)
    assert sorted(seen) == sorted(ds.get_task_names(DataFold.TRAIN))


def test_background_reader_yields_everything(tmp_path):
    root = make_dataset_dir(str(tmp_path), num_train=5, num_valid=0, num_test=0, samples_per_task=16)
    ds = FSMolDataset.from_directory(root)
    tasks = list(
        ds.get_task_reading_iterable(DataFold.TRAIN, num_workers=3)
    )
    assert sorted(t.name for t in tasks) == sorted(ds.get_task_names(DataFold.TRAIN))


def test_background_reader_repeat_stops_when_consumer_stops(tmp_path):
    root = make_dataset_dir(str(tmp_path), num_train=2, num_valid=0, num_test=0, samples_per_task=16)
    ds = FSMolDataset.from_directory(root)
    it = iter(ds.get_task_reading_iterable(DataFold.TRAIN, num_workers=2, repeat=True))
    seen = [next(it) for _ in range(7)]  # > one epoch
    assert len(seen) == 7


def test_fake_two_process_stream_is_disjoint(tmp_path, monkeypatch):
    """Fake a 2-process layout (jax.process_count/index monkeypatched):
    train_loop's shard selector must pick complementary stripes, the path
    stripes must be disjoint, and the full episode_stream must yield the
    complementary episode counts per process."""
    import jax

    from adkf_ift_tpu.data.episodes import EpisodeSpec
    from adkf_ift_tpu.train.loop import current_host_shard, episode_stream

    root = make_dataset_dir(
        str(tmp_path), num_train=6, num_valid=0, num_test=0, samples_per_task=64
    )
    ds = FSMolDataset.from_directory(root)
    spec = EpisodeSpec(support_size=8, query_size=8)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    stripes, counts = [], []
    for pidx in range(2):
        monkeypatch.setattr(jax, "process_index", lambda pidx=pidx: pidx)
        shard = current_host_shard()
        assert shard == (pidx, 2)
        stripes.append(set(ds.get_fold_paths(DataFold.TRAIN, shard)))
        stream = episode_stream(
            ds, DataFold.TRAIN, spec, repeat=False, num_workers=0, shard=shard
        )
        counts.append(sum(1 for _ in stream))
    assert stripes[0].isdisjoint(stripes[1])
    assert stripes[0] | stripes[1] == set(ds.get_fold_paths(DataFold.TRAIN))
    # one episode per striped task file on each process
    assert counts == [len(stripes[0]), len(stripes[1])]
    assert sum(counts) == 6
