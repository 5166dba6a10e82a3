"""GP-EI Bayesian optimization over molecule representations.

Parity with bayes_opt/bo_utils.py:342-472: `create_gp` (Matérn with
median-heuristic LogNormal lengthscale prior, or Tanimoto, plus optional
LogNormal noise prior), analytic Expected Improvement, and the greedy
batched minimization loop `run_gp_ei_bo` (random fallback when no
positive acquisition values, top-k otherwise).

TPU-first design delta: the queried set grows every BO iteration, which
would recompile per iteration under jit. The fit and the posterior are
therefore compiled ONCE over a padded [budget, d] buffer with a validity
mask — the same static-shape trick the episode pipeline uses.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adkf_ift_tpu.gp import (
    ExactGPConfig,
    GPPriorConfig,
    KernelConfig,
    LBFGSConfig,
    fit_gp,
    flatten_gp_params,
    init_raw_params,
    median_lengthscale_init,
    mode_to_loc,
    noise_to_raw,
    positive_to_raw,
    posterior,
    unflatten_gp_params,
)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class BOGPConfig:
    """create_gp equivalent (bo_utils.py:423-455)."""

    kernel_type: str = "matern"  # or "tanimoto"
    noise_init: float = 0.01
    noise_prior: bool = True
    jitter: float = 1e-5
    optimizer: LBFGSConfig = field(default_factory=LBFGSConfig)

    @property
    def gp_config(self) -> ExactGPConfig:
        return ExactGPConfig(
            kernel=KernelConfig(kind=self.kernel_type),
            priors=GPPriorConfig(
                noise_mode=self.noise_init,
                use_noise_prior=self.noise_prior,
                use_lengthscale_prior=self.kernel_type == "matern",
            ),
            jitter=self.jitter,
        )


def fit_bo_gp(
    config: BOGPConfig, x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Fit GP hyperparameters on the (masked) queried set; returns the
    flat raw parameter vector."""
    gp_cfg = config.gp_config
    raw = init_raw_params(gp_cfg.kernel)
    raw["raw_noise"] = noise_to_raw(jnp.asarray(config.noise_init))
    ls_loc = None
    if gp_cfg.kernel.has_lengthscale:
        median = median_lengthscale_init(x, mask=mask)
        raw["raw_lengthscale"] = positive_to_raw(
            jnp.broadcast_to(median, jnp.shape(raw["raw_lengthscale"]))
        )
        ls_loc = mode_to_loc(median)
    theta, _ = fit_gp(
        gp_cfg, x, y * mask, flatten_gp_params(gp_cfg.kernel, raw),
        mask=mask, lengthscale_prior_loc=ls_loc, optimizer=config.optimizer,
    )
    return theta


def expected_improvement(
    mean: jnp.ndarray, var: jnp.ndarray, best: jnp.ndarray, maximize: bool = False
) -> jnp.ndarray:
    """Analytic EI (botorch ExpectedImprovement; minimization by default,
    matching run_gp_ei_bo's maximize=False)."""
    sigma = jnp.sqrt(jnp.maximum(var, 1e-12))
    improve = (mean - best) if maximize else (best - mean)
    z = improve / sigma
    return improve * jax.scipy.stats.norm.cdf(z) + sigma * jax.scipy.stats.norm.pdf(z)


def min_so_far(x: np.ndarray) -> np.ndarray:
    """Running minimum (bo_utils.py:464-472)."""
    return np.minimum.accumulate(np.asarray(x, np.float64))


def run_gp_ei_bo(
    x_all: np.ndarray,
    y_all: np.ndarray,
    num_init_points: int = 10,
    query_batch_size: int = 5,
    num_bo_iters: int = 20,
    config: BOGPConfig = BOGPConfig(),
    init_from: int = 0,
    seed: Optional[int] = None,
    budget: Optional[int] = None,
) -> List[int]:
    """Greedy batched EI minimization loop (bo_utils.py:342-397).

    Returns `bo_record`: the (ordered) indices queried, starting with the
    best initial point. y is standardized in-loop like the reference.
    """
    rng = np.random.RandomState(seed)
    y_all = (np.asarray(y_all, np.float64) - y_all.mean()) / y_all.std()
    x_all_j = jnp.asarray(np.asarray(x_all, np.float32))
    n = len(y_all)

    max_queried = num_init_points + query_batch_size * num_bo_iters
    budget = budget or max_queried
    d = x_all.shape[1]

    # One compiled fit+score for every iteration: padded queried buffer.
    @jax.jit
    def fit_and_score(xq, yq, mask, best):
        theta = fit_bo_gp(config, xq, yq, mask)
        params = unflatten_gp_params(config.gp_config.kernel, theta)
        post = posterior(config.gp_config, params, xq, yq * mask, x_all_j,
                         support_mask=mask, noisy=True)
        return expected_improvement(post.mean, post.variance, best)

    queried_idx: List[int] = list(
        rng.choice(np.arange(init_from, n), size=num_init_points, replace=False)
    )
    bo_record = [int(min(queried_idx))]

    for it in range(num_bo_iters):
        xq = np.zeros((budget, d), np.float32)
        yq = np.zeros((budget,), np.float32)
        mask = np.zeros((budget,), np.float32)
        k = len(queried_idx)
        xq[:k] = x_all[queried_idx]
        yq[:k] = y_all[queried_idx]
        mask[:k] = 1.0
        best = float(yq[:k].min())

        acq = np.array(fit_and_score(jnp.asarray(xq), jnp.asarray(yq), jnp.asarray(mask), best))
        acq[queried_idx] = -np.inf

        positive = np.where(acq > 0)[0]
        if len(positive) == 0:
            pool = [i for i in range(n) if i not in queried_idx]
            query_idx = list(rng.choice(pool, size=query_batch_size, replace=False))
        elif len(positive) < query_batch_size:
            query_idx = list(np.argsort(-acq)[: len(positive)])
            pool = [i for i in range(n) if i not in queried_idx and i not in query_idx]
            extra = rng.choice(pool, size=query_batch_size - len(positive), replace=False)
            query_idx.extend(int(e) for e in extra)
        else:
            query_idx = list(np.argsort(-acq)[:query_batch_size])

        queried_idx.extend(int(q) for q in query_idx)
        queried_idx = list(dict.fromkeys(queried_idx))  # stable unique
        bo_record.extend(int(j) for j in query_idx[::-1])
        logger.info("BO iter %d: best standardized y so far %.4f", it, min(y_all[queried_idx]))

    return bo_record


def get_representation(kind: str, config, params) -> Callable:
    """Frozen-encoder representation extractor (the reference's
    *ModelFeatureExtractor.get_representation family, bo_utils.py:475-698):
    returns a jitted fn mapping PackedGraphs -> [G, D] features."""
    from adkf_ift_tpu.modules.encoder import CombinedFeatureExtractor

    if kind in ("adkf", "dkt", "protonet", "cnp", "par", "adkf_vgp"):
        encoder = CombinedFeatureExtractor(config.features)
        enc_params = params.encoder if hasattr(params, "encoder") else params
        return jax.jit(lambda batch: encoder.apply(enc_params, batch))
    raise ValueError(f"no representation extractor for model kind {kind}")
