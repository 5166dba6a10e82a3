"""ADKT-VGP: ADKF-IFT with a variational GP head for classification.

Capability parity with fs_mol/models/adaptive_dkt_vgp.py:36-233 and
fs_mol/utils/adaptive_dkt_vgp_utils.py: the same encoder family (FC head
1024 -> readout dim, adaptive_dkt_vgp.py:60-65), Bernoulli (probit)
likelihood, inducing points = support features. Per episode:

  1. exact-GP PRE-FIT on ±1 labels initializes outputscale/lengthscale
     (reinit_gp_params, adaptive_dkt_vgp.py:93-123; lengthscale prior
     scale 0.25 with mode = median heuristic);
  2. inner loop maximizes the ELBO over the variational distribution
     (m, L) + kernel params, with a LogNormal(mode = pre-fit lengthscale,
     scale 0.2) prior;
  3. outer loss = − Σ log p(y_q) under the Bernoulli marginal of the
     predictive, with gradients flowing into the inducing (support)
     features and through both inner argmins via the IFT.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adkf_ift_tpu.data.episodes import Episode, PackedGraphs
from adkf_ift_tpu.gp import (
    ExactGPConfig,
    GPPriorConfig,
    KernelConfig,
    LBFGSConfig,
    fit_gp_implicit,
    flatten_gp_params,
    init_raw_params,
    median_lengthscale_init,
    mode_to_loc,
    noise_to_raw,
    positive_to_raw,
    raw_to_positive,
    unflatten_gp_params,
)
from adkf_ift_tpu.gp.variational import (
    VGPConfig,
    bernoulli_marginal_log_prob,
    bernoulli_marginal_probs,
    fit_vgp_implicit,
    init_vgp_flat,
    vgp_predict,
)
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, CombinedFeatureExtractor


def _default_vgp_features() -> CombinedFeatureConfig:
    # FC head: in -> 1024 -> readout output dim (adaptive_dkt_vgp.py:60-65).
    cfg = CombinedFeatureConfig()
    return replace(
        cfg,
        fc_hidden_dim=1024,
        fc_out_dim=cfg.graph_config.readout_config.output_dim,
    )


@dataclass(frozen=True)
class ADKTVGPModelConfig:
    features: CombinedFeatureConfig = field(default_factory=_default_vgp_features)
    gp_kernel: str = "matern"
    use_ard: bool = False
    use_lengthscale_prior: bool = True
    ignore_grad_correction: bool = False
    inner_optimizer: LBFGSConfig = field(default_factory=lambda: LBFGSConfig(max_iters=64))
    prefit_optimizer: LBFGSConfig = field(default_factory=LBFGSConfig)
    jitter: float = 1e-4
    support_size: int = 64  # static inducing count

    def __post_init__(self):
        if self.gp_kernel == "cossim" and not self.features.normalize_output:
            object.__setattr__(self, "features", replace(self.features, normalize_output=True))

    @property
    def kernel_config(self) -> KernelConfig:
        return KernelConfig(
            kind=self.gp_kernel,
            ard_dims=self.features.output_dim if self.use_ard else None,
        )

    @property
    def prefit_gp_config(self) -> ExactGPConfig:
        return ExactGPConfig(
            kernel=self.kernel_config,
            priors=GPPriorConfig(
                use_noise_prior=False,
                use_lengthscale_prior=self.use_lengthscale_prior,
                scale=0.25,
            ),
            jitter=self.jitter,
        )

    @property
    def vgp_config(self) -> VGPConfig:
        return VGPConfig(
            kernel=self.kernel_config,
            num_inducing=self.support_size,
            jitter=self.jitter,
            use_lengthscale_prior=self.use_lengthscale_prior,
        )


class ADKTVGPPrediction(NamedTuple):
    probs: jnp.ndarray  # positive-class probabilities over query [Q]
    mean: jnp.ndarray  # latent predictive mean
    variance: jnp.ndarray  # latent predictive variance


def make_encoder(config: ADKTVGPModelConfig) -> nn.Module:
    return CombinedFeatureExtractor(config.features)


def init_encoder_params(config: ADKTVGPModelConfig, rng: jax.Array, example: PackedGraphs):
    return make_encoder(config).init(rng, example)


def _prefit_kernel(
    config: ADKTVGPModelConfig, fs: jnp.ndarray, ys_pm1: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[dict, Optional[jnp.ndarray]]:
    """Exact-GP pre-fit on ±1 'regression' labels; returns the fitted raw
    kernel params and the ELBO-stage lengthscale prior location."""
    gp_cfg = config.prefit_gp_config
    detached = jax.lax.stop_gradient(fs)
    raw = init_raw_params(gp_cfg.kernel)
    raw["raw_noise"] = noise_to_raw(jnp.asarray(0.1))
    ls_loc = None
    if gp_cfg.kernel.has_lengthscale:
        median = median_lengthscale_init(detached)
        raw["raw_lengthscale"] = positive_to_raw(
            jnp.broadcast_to(median, jnp.shape(raw["raw_lengthscale"]))
        )
        if config.use_lengthscale_prior:
            ls_loc = mode_to_loc(median, scale=0.25)
    theta = fit_gp_implicit(
        gp_cfg,
        config.prefit_optimizer,
        config.ignore_grad_correction,
        fs,
        ys_pm1 * mask,
        flatten_gp_params(gp_cfg.kernel, raw),
        mask,
        ls_loc,
    )
    fitted = unflatten_gp_params(gp_cfg.kernel, theta)
    kernel_raw = {"raw_outputscale": fitted["raw_outputscale"]}
    elbo_ls_loc = None
    if gp_cfg.kernel.has_lengthscale:
        kernel_raw["raw_lengthscale"] = fitted["raw_lengthscale"]
        if config.use_lengthscale_prior:
            # mode = pre-fit lengthscale, scale 0.2 (adaptive_dkt_vgp.py:112-119);
            # the prior location is a constant (detached) like the reference's
            # .item() extraction.
            elbo_ls_loc = mode_to_loc(
                jax.lax.stop_gradient(raw_to_positive(fitted["raw_lengthscale"])), scale=0.2
            )
    return kernel_raw, elbo_ls_loc


def _episode_vgp_config(config: ADKTVGPModelConfig, fs: jnp.ndarray) -> VGPConfig:
    """The VGP with num_inducing = the EPISODE's (static) padded support
    size. The reference's inducing set is simply the support features and
    varies per episode (adaptive_dkt_vgp.py:90-123); pinning it to the
    train-time support_size broke every eval/validation at a different
    support size (shape (32,) vs (16,) — round-4 zoo run)."""
    return replace(config.vgp_config, num_inducing=int(fs.shape[0]))


def inner_fit(
    config: ADKTVGPModelConfig,
    fs: jnp.ndarray,
    ys_pm1: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    kernel_raw, elbo_ls_loc = _prefit_kernel(config, fs, ys_pm1, mask)
    vgp_cfg = _episode_vgp_config(config, fs)
    init_flat = init_vgp_flat(vgp_cfg, kernel_raw)
    return fit_vgp_implicit(
        vgp_cfg,
        config.inner_optimizer,
        config.ignore_grad_correction,
        fs,
        ys_pm1 * mask,
        init_flat,
        mask,
        elbo_ls_loc,
    )


def episode_outer_loss(config: ADKTVGPModelConfig, encoder_params, episode: Episode) -> jnp.ndarray:
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(encoder_params, episode.support, episode.query)
    ys = episode.support_labels
    yq = episode.query_labels
    s_mask, q_mask = episode.support.graph_mask, episode.query.graph_mask

    theta = inner_fit(config, fs, ys, s_mask)
    mu, var = vgp_predict(_episode_vgp_config(config, fs), theta, fs, fq, s_mask)
    logp = bernoulli_marginal_log_prob(mu, var, yq)
    return -jnp.sum(logp * q_mask)


def episode_predict(config: ADKTVGPModelConfig, encoder_params, episode: Episode) -> ADKTVGPPrediction:
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(encoder_params, episode.support, episode.query)
    theta = inner_fit(config, fs, episode.support_labels, episode.support.graph_mask)
    mu, var = vgp_predict(
        _episode_vgp_config(config, fs), theta, fs, fq, episode.support.graph_mask
    )
    return ADKTVGPPrediction(
        probs=bernoulli_marginal_probs(mu, var), mean=mu, variance=var
    )
