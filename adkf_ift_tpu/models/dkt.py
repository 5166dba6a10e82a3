"""DKT: deep kernel transfer — the joint-training baseline.

Reference (fs_mol/models/dkt.py + fs_mol/utils/dkt_utils.py): same
encoder as ADKF, but GP hyperparameters are PERSISTENT model parameters
trained jointly with the encoder by Adam on the exact MLL of the
concatenated support+query set (dkt.py:146-151, 170-172). No inner
loop, no IFT — one autodiff graph. Eval conditions the GP on the
support set (optionally refitting hyperparameters at test time —
`test_time_adaptation`, dkt.py:152-166) and scores the query posterior.

DKT+ ablation: a LogNormal(loc=0, scale=0.25) lengthscale prior whose
MEAN initializes the lengthscale (dkt.py:91-98).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import NamedTuple, Optional, Tuple

import jax
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
    marginal_log_likelihood,
    mvn_nll,
    noise_to_raw,
    positive_to_raw,
    posterior,
    unflatten_gp_params,
)
from adkf_ift_tpu.models.adkf import ADKFPrediction
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, CombinedFeatureExtractor


@dataclass(frozen=True)
class DKTModelConfig:
    features: CombinedFeatureConfig = field(default_factory=CombinedFeatureConfig)
    gp_kernel: str = "matern"
    use_ard: bool = False
    use_numeric_labels: bool = False
    use_lengthscale_prior: bool = False  # True => DKT+
    test_time_adaptation: bool = False
    inner_optimizer: LBFGSConfig = field(default_factory=LBFGSConfig)
    jitter: float = 1e-5

    def __post_init__(self):
        if self.gp_kernel == "cossim" and not self.features.normalize_output:
            object.__setattr__(
                self, "features", replace(self.features, normalize_output=True)
            )

    @property
    def gp_config(self) -> ExactGPConfig:
        return ExactGPConfig(
            kernel=KernelConfig(
                kind=self.gp_kernel,
                ard_dims=self.features.output_dim if self.use_ard else None,
            ),
            priors=GPPriorConfig(
                noise_mode=0.01 if self.use_numeric_labels else 0.1,
                use_noise_prior=False,  # dkt.py:85 — plain GaussianLikelihood
                use_lengthscale_prior=self.use_lengthscale_prior,
            ),
            jitter=self.jitter,
        )


class DKTParams(NamedTuple):
    """Joint parameters: encoder pytree + flat raw GP hyperparameters."""

    encoder: dict
    gp_raw: jnp.ndarray


# DKT+ lengthscale prior: LogNormal(loc=0, scale=0.25); init to its MEAN
# exp(loc + scale^2/2) (dkt.py:91-98).
DKT_PLUS_LS_PRIOR_LOC = 0.0


def make_encoder(config: DKTModelConfig) -> "CombinedFeatureExtractor":
    return CombinedFeatureExtractor(config.features)


def init_params(config: DKTModelConfig, rng: jax.Array, example) -> DKTParams:
    encoder_params = make_encoder(config).init(rng, example)
    gp_cfg = config.gp_config
    raw = init_raw_params(gp_cfg.kernel)
    raw["raw_noise"] = noise_to_raw(
        jnp.asarray(0.01 if config.use_numeric_labels else 0.1)
    )
    if config.use_lengthscale_prior and gp_cfg.kernel.has_lengthscale:
        mean = jnp.exp(DKT_PLUS_LS_PRIOR_LOC + 0.25**2 / 2.0)
        raw["raw_lengthscale"] = positive_to_raw(
            jnp.broadcast_to(mean, jnp.shape(raw["raw_lengthscale"]))
        )
    return DKTParams(encoder=encoder_params, gp_raw=flatten_gp_params(gp_cfg.kernel, raw))


def _episode_labels(config: DKTModelConfig, episode: Episode) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if config.use_numeric_labels:
        return episode.support_numeric_labels, episode.query_numeric_labels
    return episode.support_labels, episode.query_labels


def _ls_prior_loc(config: DKTModelConfig) -> Optional[jnp.ndarray]:
    if config.use_lengthscale_prior and config.gp_config.kernel.has_lengthscale:
        return jnp.asarray(DKT_PLUS_LS_PRIOR_LOC)
    return None


def episode_loss(config: DKTModelConfig, params: DKTParams, episode: Episode) -> jnp.ndarray:
    """-MLL of the GP on concat(support, query) — the joint objective
    (dkt.py:146-151 + compute_loss :170-172). Differentiable wrt encoder
    AND GP raw params in one graph."""
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(params.encoder, episode.support, episode.query)
    ys, yq = _episode_labels(config, episode)

    x = jnp.concatenate([fs, fq], axis=0)
    y = jnp.concatenate([ys, yq], axis=0)
    mask = jnp.concatenate([episode.support.graph_mask, episode.query.graph_mask], axis=0)

    gp_params = unflatten_gp_params(config.gp_config.kernel, params.gp_raw)
    return -marginal_log_likelihood(
        config.gp_config, gp_params, x, y * mask, mask=mask,
        lengthscale_prior_loc=_ls_prior_loc(config),
    )


def batch_loss(config: DKTModelConfig, params: DKTParams, episode_batch: Episode) -> jnp.ndarray:
    """Per-episode joint -MLL [C] with the whole chunk encoded as one flat
    mega-graph (see modules/encoder.flatten_stacked for the rationale)."""
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair_batch(params.encoder, episode_batch.support, episode_batch.query)
    if config.use_numeric_labels:
        ys, yq = episode_batch.support_numeric_labels, episode_batch.query_numeric_labels
    else:
        ys, yq = episode_batch.support_labels, episode_batch.query_labels
    sm, qm = episode_batch.support.graph_mask, episode_batch.query.graph_mask

    def one(fs_i, fq_i, ys_i, yq_i, sm_i, qm_i):
        x = jnp.concatenate([fs_i, fq_i], axis=0)
        y = jnp.concatenate([ys_i, yq_i], axis=0)
        mask = jnp.concatenate([sm_i, qm_i], axis=0)
        gp_params = unflatten_gp_params(config.gp_config.kernel, params.gp_raw)
        return -marginal_log_likelihood(
            config.gp_config, gp_params, x, y * mask, mask=mask,
            lengthscale_prior_loc=_ls_prior_loc(config),
        )

    return jax.vmap(one)(fs, fq, ys, yq, sm, qm)


def episode_predict(config: DKTModelConfig, params: DKTParams, episode: Episode) -> ADKFPrediction:
    """Eval: condition the (meta-learned) GP on the support set, score the
    query posterior; optional per-task hyperparameter refit
    (test_time_adaptation, dkt.py:152-166)."""
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(params.encoder, episode.support, episode.query)
    ys, _ = _episode_labels(config, episode)
    support_mask = episode.support.graph_mask

    gp_raw = params.gp_raw
    if config.test_time_adaptation:
        gp_raw, _ = fit_gp(
            config.gp_config,
            fs,
            ys * support_mask,
            gp_raw,
            mask=support_mask,
            lengthscale_prior_loc=_ls_prior_loc(config),
            optimizer=config.inner_optimizer,
        )
    gp_params = unflatten_gp_params(config.gp_config.kernel, gp_raw)
    post = posterior(
        config.gp_config, gp_params, fs, ys * support_mask, fq,
        support_mask=support_mask, noisy=True,
    )
    return ADKFPrediction(mean=post.mean, variance=post.variance, gp_raw_params=gp_raw)
