"""Native episode stream parity: stratified_episode_native must produce
byte-identical episodes to the Python sampler+packer path."""

import numpy as np
import pytest

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
from adkf_ift_tpu.data.native import (
    NativeTask,
    native_available,
    stratified_episode_native,
)
from adkf_ift_tpu.data.task import Task
from adkf_ift_tpu.utils.synthetic import make_task

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_native_stratified_episode_matches_python(tmp_path):
    import jax

    task = make_task(num_samples=128, seed=21)
    path = str(tmp_path / "T.jsonl.gz")
    task.save_to_file(path)

    spec = EpisodeSpec(support_size=16, query_size=32)
    for seed in (0, 3, 7):
        ep_native = stratified_episode_native(NativeTask(path), spec, seed=seed)
        py_task = Task.load_from_file(path)
        sample = StratifiedTaskSampler(16, test_size_or_ratio=32).sample(py_task, seed=seed)
        ep_py = build_episode(sample, spec)
        for la, lb in zip(jax.tree.leaves(ep_py), jax.tree.leaves(ep_native)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_native_task_queue_yields_every_task(tmp_path):
    """The C++ prefetch queue (fsmol_queue_*) streams every task exactly
    once (non-repeat), carries names + the BackgroundReader idx contract,
    and skips unreadable files without dying."""
    from adkf_ift_tpu.data.native import NativeTaskQueue
    from adkf_ift_tpu.utils.synthetic import make_dataset_dir

    root = make_dataset_dir(str(tmp_path / "d"), num_train=5, num_valid=0, num_test=0, samples_per_task=24)
    import os

    paths = sorted(
        os.path.join(root, "train", f) for f in os.listdir(os.path.join(root, "train"))
    )
    bad = str(tmp_path / "d" / "train" / "BAD.jsonl.gz")
    with open(bad, "wb") as f:
        f.write(b"not a gzip jsonl")
    paths.append(bad)

    queue = NativeTaskQueue(paths, num_workers=3, capacity=2, repeat=False, seed=0)
    seen = []
    for task, idx in queue:
        assert task.num_molecules == 24
        assert 0 <= idx < len(paths)
        seen.append(task.name)
    assert sorted(seen) == [f"SYNTRAIN{i}" for i in range(5)]  # BAD skipped

    # Repeat mode streams past one epoch; close() mid-stream is safe.
    queue2 = NativeTaskQueue(paths, num_workers=2, capacity=2, repeat=True, seed=0)
    it = iter(queue2)
    names = [next(it)[0].name for _ in range(12)]
    assert len(names) == 12
    queue2.close()


def test_native_queue_episode_stream_matches_python(tmp_path):
    """episode_stream via the C++ queue (num_workers>0, native) yields
    the same per-(task, idx) episodes as the pure-Python path — order may
    differ, so compare the support-fingerprint multiset keyed by task."""
    from adkf_ift_tpu.data import FSMolDataset
    from adkf_ift_tpu.data.dataset import DataFold
    from adkf_ift_tpu.train import loop as train_loop
    from adkf_ift_tpu.utils.synthetic import make_dataset_dir

    root = make_dataset_dir(str(tmp_path / "d"), num_train=3, num_valid=0, num_test=0, samples_per_task=96)
    ds = FSMolDataset.from_directory(root)
    spec = EpisodeSpec(support_size=16, query_size=32)

    native_eps = list(
        train_loop.episode_stream(ds, DataFold.TRAIN, spec, repeat=False, num_workers=2)
    )
    assert len(native_eps) == 3

    def key(ep):
        return hash(np.asarray(ep.support.fingerprints).tobytes())

    native_keys = {key(ep) for ep in native_eps}
    # Same seed contract: every native episode must be one of the python
    # episodes generated at SOME idx in [0, n) (the queue's epoch-0
    # shuffle permutes idx over exactly that range).
    assert native_keys <= {
        key(
            build_episode(
                StratifiedTaskSampler(16, test_size_or_ratio=32).sample(
                    Task.load_from_file(p), seed=i
                ),
                spec,
            )
        )
        for p in ds.get_fold_paths(DataFold.TRAIN)
        for i in range(3)
    }
    assert len(native_keys) == 3


def test_episode_stream_uses_native(tmp_path):
    """episode_stream yields identical batches whichever backend is active."""
    from adkf_ift_tpu.data import FSMolDataset
    from adkf_ift_tpu.data.dataset import DataFold
    from adkf_ift_tpu.train.loop import episode_stream
    from adkf_ift_tpu.utils.synthetic import make_dataset_dir

    root = make_dataset_dir(str(tmp_path / "d"), num_train=2, num_valid=0, num_test=0, samples_per_task=96)
    ds = FSMolDataset.from_directory(root)
    spec = EpisodeSpec(support_size=16, query_size=32)
    stream = episode_stream(ds, DataFold.TRAIN, spec, repeat=False, num_workers=0)
    eps = list(stream)
    assert len(eps) == 2
    for ep in eps:
        assert ep.support.graph_mask.sum() == 16
        assert ep.query.graph_mask.sum() == 32
