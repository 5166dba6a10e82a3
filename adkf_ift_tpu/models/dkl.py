"""DKL: single-task deep kernel learning from scratch.

Parity with fs_mol/models/dkl.py + fs_mol/utils/dkl_utils.py:40-121:
per evaluation task, reset encoder+GP to their initial parameters and
run `num_train_steps` Adam steps on the support-set MLL (training the
whole deep kernel on the support set alone — no meta-learning), then
score the query posterior. The GP trains on support features jointly
with the encoder (loss = -MLL of support).

TPU design: the per-task Adam loop is a lax.scan over the full
(encoder + GP) parameter pytree, so one compiled program performs the
entire from-scratch fit — no Python-loop optimizer stepping.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from adkf_ift_tpu.data.episodes import Episode
from adkf_ift_tpu.gp import (
    ExactGPConfig,
    GPPriorConfig,
    KernelConfig,
    flatten_gp_params,
    init_raw_params,
    marginal_log_likelihood,
    noise_to_raw,
    posterior,
    unflatten_gp_params,
)
from adkf_ift_tpu.models.adkf import ADKFPrediction
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, CombinedFeatureExtractor


@dataclass(frozen=True)
class DKLConfig:
    features: CombinedFeatureConfig = field(default_factory=CombinedFeatureConfig)
    gp_kernel: str = "matern"
    use_ard: bool = False
    use_numeric_labels: bool = False
    use_lengthscale_prior: bool = False
    num_train_steps: int = 50  # dkl_test.py:55 CLI default
    learning_rate: float = 1e-3
    clip_value: Optional[float] = None
    jitter: float = 1e-5

    def __post_init__(self):
        if self.gp_kernel == "cossim" and not self.features.normalize_output:
            object.__setattr__(self, "features", replace(self.features, normalize_output=True))

    @property
    def gp_config(self) -> ExactGPConfig:
        return ExactGPConfig(
            kernel=KernelConfig(
                kind=self.gp_kernel,
                ard_dims=self.features.output_dim if self.use_ard else None,
            ),
            priors=GPPriorConfig(
                noise_mode=0.01 if self.use_numeric_labels else 0.1,
                use_noise_prior=False,
                use_lengthscale_prior=self.use_lengthscale_prior,
            ),
            jitter=self.jitter,
        )


class DKLParams(NamedTuple):
    encoder: dict
    gp_raw: jnp.ndarray


def make_encoder(config: DKLConfig) -> CombinedFeatureExtractor:
    return CombinedFeatureExtractor(config.features)


def init_params(config: DKLConfig, rng: jax.Array, example) -> DKLParams:
    encoder_params = make_encoder(config).init(rng, example)
    gp_cfg = config.gp_config
    raw = init_raw_params(gp_cfg.kernel)
    raw["raw_noise"] = noise_to_raw(jnp.asarray(0.01 if config.use_numeric_labels else 0.1))
    return DKLParams(encoder=encoder_params, gp_raw=flatten_gp_params(gp_cfg.kernel, raw))


def _support_mll_loss(config: DKLConfig, params: DKLParams, episode: Episode) -> jnp.ndarray:
    encoder = make_encoder(config)
    fs = encoder.apply(params.encoder, episode.support)
    mask = episode.support.graph_mask
    ys = (
        episode.support_numeric_labels if config.use_numeric_labels else episode.support_labels
    ) * mask
    gp_params = unflatten_gp_params(config.gp_config.kernel, params.gp_raw)
    ls_loc = jnp.zeros(()) if config.use_lengthscale_prior else None
    return -marginal_log_likelihood(
        config.gp_config, gp_params, fs, ys, mask=mask, lengthscale_prior_loc=ls_loc
    )


def fit_task(config: DKLConfig, init: DKLParams, episode: Episode) -> DKLParams:
    """From-scratch Adam fit on the support set, fully inside lax.scan
    (replaces the reference's Python loop, dkl_utils.py:75-92)."""
    txs = []
    if config.clip_value is not None:
        txs.append(optax.clip_by_global_norm(config.clip_value))
    txs.append(optax.adam(config.learning_rate))
    optimizer = optax.chain(*txs)
    opt_state = optimizer.init(init)
    grad_fn = jax.grad(lambda p: _support_mll_loss(config, p, episode))

    def step(carry, _):
        params, opt_state = carry
        grads = grad_fn(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    (params, _), _ = jax.lax.scan(step, (init, opt_state), None, length=config.num_train_steps)
    return params


def episode_predict(config: DKLConfig, init: DKLParams, episode: Episode) -> ADKFPrediction:
    params = fit_task(config, init, episode)
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(params.encoder, episode.support, episode.query)
    mask = episode.support.graph_mask
    ys = (
        episode.support_numeric_labels if config.use_numeric_labels else episode.support_labels
    ) * mask
    gp_params = unflatten_gp_params(config.gp_config.kernel, params.gp_raw)
    post = posterior(
        config.gp_config, gp_params, fs, ys, fq, support_mask=mask, noisy=True
    )
    return ADKFPrediction(mean=post.mean, variance=post.variance, gp_raw_params=params.gp_raw)
