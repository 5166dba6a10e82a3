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
