"""Infrastructure utilities: logging, metric logger, checkpoints, profiling."""

import logging
import os

import numpy as np
import jax
import jax.numpy as jnp

from adkf_ift_tpu.utils.checkpoints import load_checkpoint, save_checkpoint
from adkf_ift_tpu.utils.logging import (
    FileLikeLogger,
    prefix_log_msgs,
    restrict_console_log_level,
    set_up_logging,
)
from adkf_ift_tpu.utils.metric_logger import MetricLogger
from adkf_ift_tpu.utils.profiling import StepTimer


def test_checkpoint_roundtrip(tmp_path):
    # Use a real (picklable, module-level) config class.
    from adkf_ift_tpu.models.gpst import GPSTConfig

    params = {"layer": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}}
    opt_state = {"mu": np.zeros(3)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, GPSTConfig(use_numeric_labels=True), params, opt_state=opt_state, step=42)

    cfg, restored, opt, step = load_checkpoint(path)
    assert cfg.use_numeric_labels is True
    assert step == 42
    np.testing.assert_array_equal(np.asarray(restored["layer"]["w"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(opt["mu"], np.zeros(3))

    # Restore into an existing template too.
    template = {"layer": {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))}}
    _, restored2, _, _ = load_checkpoint(path, params_template=template)
    np.testing.assert_array_equal(np.asarray(restored2["layer"]["b"]), np.ones(3))


def test_checkpoint_orbax_backend_roundtrip(tmp_path):
    """Orbax array backend behind the same save/load API: sync + async
    saves, template-free restore (optax namedtuple opt_state rebuilt from
    the pickled skeleton), and backend auto-detection on load."""
    import optax

    from adkf_ift_tpu.models.gpst import GPSTConfig
    from adkf_ift_tpu.utils.checkpoints import wait_for_async

    params = {"layer": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}}
    opt_state = optax.adam(1e-3).init(params)
    path = str(tmp_path / "ckpt_ocp")
    save_checkpoint(
        path, GPSTConfig(use_numeric_labels=True), params,
        opt_state=opt_state, step=7, backend="orbax",
    )

    cfg, restored, opt, step = load_checkpoint(path)
    assert cfg.use_numeric_labels is True and step == 7
    np.testing.assert_array_equal(np.asarray(restored["layer"]["w"]), np.arange(6.0).reshape(2, 3))
    # Template-free restore rebuilds the optax state structure exactly.
    assert jax.tree.structure(opt) == jax.tree.structure(opt_state), (opt, opt_state)
    np.testing.assert_array_equal(np.asarray(opt[0].mu["layer"]["b"]), np.zeros(3))

    # Async save overwrites the same directory; wait_for_async commits it.
    params2 = jax.tree.map(lambda x: x + 1.0, params)
    save_checkpoint(
        path, GPSTConfig(), params2, opt_state=opt_state, step=8,
        backend="orbax", async_save=True,
    )
    wait_for_async()
    _, restored2, _, step2 = load_checkpoint(path)
    assert step2 == 8
    np.testing.assert_array_equal(
        np.asarray(restored2["layer"]["b"]), np.full(3, 2.0)
    )


def test_prefetch_pipeline_propagates_worker_errors():
    """A worker crash (e.g. packing overflow) must surface as the original
    exception in next_batch, not hang or masquerade as stream exhaustion
    (ADVICE r1)."""
    from adkf_ift_tpu.train.loop import _device_batch_pipeline

    class BoomError(RuntimeError):
        pass

    def bad_stream():
        raise BoomError("packing failed")
        yield  # pragma: no cover

    next_batch, stop_fn = _device_batch_pipeline(
        bad_stream(), tasks_per_batch=1, shard_batch=None, compress=False, depth=1
    )
    try:
        import pytest

        with pytest.raises(BoomError):
            next_batch()
    finally:
        stop_fn()

    # Genuine exhaustion still reads as StopIteration.
    next_batch2, stop_fn2 = _device_batch_pipeline(
        iter(()), tasks_per_batch=1, shard_batch=None, compress=False, depth=1
    )
    try:
        import pytest

        with pytest.raises(StopIteration):
            next_batch2()
    finally:
        stop_fn2()


def test_metric_logger_windows_and_history():
    lines = []
    ml = MetricLogger(log_fn=lines.append, window_size=3)
    for i in range(7):
        ml.log_metrics(loss=float(i), acc=0.5)
    assert len(lines) == 2  # flushed at steps 3 and 6
    assert "loss" in lines[0] and "acc" in lines[0]
    assert abs(ml.get_mean("loss") - 3.0) < 1e-9
    assert abs(ml.get_mean("loss", last_n=2) - 5.5) < 1e-9


def test_logging_prefix_and_filelike(tmp_path):
    root = logging.getLogger()
    saved_handlers = list(root.handlers)
    saved_level = root.level
    try:
        log_file = str(tmp_path / "x.log")
        set_up_logging(log_file)
        logger = logging.getLogger("infra_test")
        with prefix_log_msgs("[task T] "):
            logger.info("inside")
        logger.info("outside")
        with open(log_file) as f:
            content = f.read()
        assert "[task T] inside" in content
        assert "[task T] outside" not in content

        fll = FileLikeLogger(logger)
        fll.write("line one\npartial")
        fll.flush()
        with open(log_file) as f:
            content = f.read()
        assert "line one" in content and "partial" in content

        with restrict_console_log_level(logging.ERROR):
            logger.info("muted on console")  # must not raise
    finally:
        for h in list(root.handlers):
            root.removeHandler(h)
            if isinstance(h, logging.FileHandler):
                h.close()
        for h in saved_handlers:
            root.addHandler(h)
        root.setLevel(saved_level)


def test_step_timer():
    t = StepTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0
    t.log_summary(log=lambda msg: None)
