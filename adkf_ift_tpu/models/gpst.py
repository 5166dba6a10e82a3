"""GP-ST: single-task exact Tanimoto-kernel GP on binary fingerprints.

Parity with fs_mol/gpst_test.py:37-116 + ExactTanimotoGP
(gp_utils.py:138-153): no learned encoder at all — fingerprints go
straight into a ScaleKernel(Tanimoto) GP with fixed noise 0.1 for
classification (raw_noise not optimized) or learned noise (init 0.01)
for regression; hyperparameters fit per task by L-BFGS on the MLL;
posterior mean (+sigmoid) scores the query set.

For the Tanimoto kernel the reference uses binary Morgan fingerprints
with count simulation (fs_mol/utils/chem_utils.py:12-23); stored count
fingerprints are binarized here (>0) which matches the dominant bits.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp

from adkf_ift_tpu.data.episodes import Episode
from adkf_ift_tpu.gp import (
    ExactGPConfig,
    GPPriorConfig,
    KernelConfig,
    LBFGSConfig,
    fit_gp,
    flatten_gp_params,
    init_raw_params,
    lbfgs_minimize,
    make_inner_loss,
    noise_to_raw,
    posterior,
    unflatten_gp_params,
)
from adkf_ift_tpu.models.adkf import ADKFPrediction


@dataclass(frozen=True)
class GPSTConfig:
    use_numeric_labels: bool = False
    binarize_fingerprints: bool = True
    inner_optimizer: LBFGSConfig = field(default_factory=LBFGSConfig)
    jitter: float = 1e-5

    @property
    def gp_config(self) -> ExactGPConfig:
        return ExactGPConfig(
            kernel=KernelConfig(kind="tanimoto"),
            priors=GPPriorConfig(use_noise_prior=False, use_lengthscale_prior=False),
            jitter=self.jitter,
        )


def _features(config: GPSTConfig, fingerprints: jnp.ndarray) -> jnp.ndarray:
    if config.binarize_fingerprints:
        return (fingerprints > 0).astype(jnp.float32)
    return fingerprints


def episode_predict(config: GPSTConfig, episode: Episode) -> ADKFPrediction:
    xs = _features(config, episode.support.fingerprints)
    xq = _features(config, episode.query.fingerprints)
    s_mask = episode.support.graph_mask
    ys = (
        episode.support_numeric_labels if config.use_numeric_labels else episode.support_labels
    ) * s_mask

    gp_cfg = config.gp_config
    raw = init_raw_params(gp_cfg.kernel)
    raw["raw_noise"] = noise_to_raw(jnp.asarray(0.01 if config.use_numeric_labels else 0.1))
    init_flat = flatten_gp_params(gp_cfg.kernel, raw)

    if config.use_numeric_labels:
        # Regression: noise learned jointly (gp_utils.py:143).
        theta, _ = fit_gp(
            gp_cfg, xs, ys, init_flat, mask=s_mask, optimizer=config.inner_optimizer
        )
    else:
        # Classification: noise FIXED at 0.1; only the outputscale is
        # optimized (raw_noise.requires_grad = use_numeric_labels,
        # gp_utils.py:143). Optimize over the outputscale coordinate only.
        fixed_noise = init_flat[0]

        def loss_of_scale(scale_vec):
            flat = jnp.concatenate([fixed_noise[None], scale_vec])
            return make_inner_loss(gp_cfg, xs, ys, s_mask, None)(flat)

        res = lbfgs_minimize(loss_of_scale, init_flat[1:], config.inner_optimizer)
        theta = jnp.concatenate([fixed_noise[None], res.x])

    params = unflatten_gp_params(gp_cfg.kernel, theta)
    post = posterior(gp_cfg, params, xs, ys, xq, support_mask=s_mask, noisy=True)
    return ADKFPrediction(mean=post.mean, variance=post.variance, gp_raw_params=theta)
