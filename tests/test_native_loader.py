"""Native C++ loader/packer vs the pure-Python path: exact parity + speed."""

import time

import numpy as np
import pytest

from adkf_ift_tpu.data import EpisodeSpec, build_episode
from adkf_ift_tpu.data.episodes import pack_graphs
from adkf_ift_tpu.data.task import Task, TaskSample
from adkf_ift_tpu.data.native import (
    NativeTask,
    build_episode_native,
    native_available,
)
from adkf_ift_tpu.utils.synthetic import make_task

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def task_file(tmp_path_factory):
    task = make_task(num_samples=96, seed=11)
    path = str(tmp_path_factory.mktemp("native") / "SYNTASK.jsonl.gz")
    task.save_to_file(path)
    return path, task


def test_native_parse_matches_python(task_file):
    path, task = task_file
    nt = NativeTask(path)
    assert nt.num_molecules == len(task.samples)
    py_labels = np.asarray([1.0 if s.bool_label else -1.0 for s in task.samples], np.float32)
    assert np.array_equal(nt.bool_labels(), py_labels)
    np.testing.assert_allclose(
        nt.numeric_labels(),
        [s.numeric_label for s in task.samples],
        rtol=1e-6,
    )


def test_native_pack_bitwise_matches_python(task_file):
    path, task = task_file
    nt = NativeTask(path)
    spec = EpisodeSpec(support_size=16, query_size=32)

    support_idx = list(range(16))
    query_idx = list(range(16, 48))
    ep_native = build_episode_native(nt, support_idx, query_idx, spec)

    py_task = Task.load_from_file(path)
    sample = TaskSample(
        name="SYNTASK",
        train_samples=[py_task.samples[i] for i in support_idx],
        valid_samples=[],
        test_samples=[py_task.samples[i] for i in query_idx],
    )
    ep_py = build_episode(sample, spec)

    import jax

    for name, a, b in zip(ep_py._fields, ep_py, ep_native):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=name)


def test_native_loader_faster_than_python(task_file):
    path, _ = task_file
    # Warm both paths once.
    NativeTask(path)
    Task.load_from_file(path)

    t0 = time.perf_counter()
    for _ in range(5):
        NativeTask(path)
    native_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        Task.load_from_file(path)
    python_t = time.perf_counter() - t0
    # The C++ parser should beat json.loads comfortably; assert a
    # conservative margin to avoid flakes.
    assert native_t < python_t, (native_t, python_t)
