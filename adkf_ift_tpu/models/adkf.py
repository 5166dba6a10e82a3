"""ADKF-IFT: adaptive deep-kernel GP with implicit-function-theorem
meta-learning — the flagship model.

Reference behavior being matched (fs_mol/models/adaptive_dkt.py:36-209 +
fs_mol/utils/adaptive_dkt_utils.py:70-458):
  * encoder: GNN(512) ⊕ ECFP(2048) [⊕ descriptors(42)] -> 2-layer FC ->
    2048-d features; bool labels -> ±1; numeric labels pre-standardized.
  * per-task GP re-init: fresh raw params, LogNormal noise prior (mode
    0.1 cls / 0.01 reg), median-heuristic lengthscale init and LogNormal
    lengthscale prior with mode = median (computed on DETACHED features).
  * inner loop: L-BFGS on the support-set negative MLL (+ prior terms).
  * outer loop: negative log predictive probability of query labels
    under the noisy posterior, with gradients flowing through the
    posterior AND through the inner argmin via the IFT.

TPU design: the whole episode loss — encoder forwards, compiled inner
fit, IFT-backward — is ONE pure jittable function, vmappable over a
task batch and shardable over a device mesh (train/meta.py).
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
    ard_warmstart_init,
    fit_gp_implicit,
    flatten_gp_params,
    init_raw_params,
    median_lengthscale_init,
    mode_to_loc,
    noise_to_raw,
    positive_to_raw,
    posterior,
    predictive_nll,
    unflatten_gp_params,
)
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, CombinedFeatureExtractor


@dataclass(frozen=True)
class ADKFModelConfig:
    features: CombinedFeatureConfig = field(default_factory=CombinedFeatureConfig)
    gp_kernel: str = "matern"
    use_ard: bool = False
    use_numeric_labels: bool = False
    use_lengthscale_prior: bool = True
    ignore_grad_correction: bool = False  # ADKF first-order ablation
    inner_optimizer: LBFGSConfig = field(default_factory=LBFGSConfig)
    jitter: float = 1e-5
    # ARD only: pre-fit the 3-parameter isotropic problem (damped Newton)
    # and broadcast its optimum into the 2050-dim ARD init — the ARD
    # L-BFGS then needs ~half the iterations for the same optima
    # (gp/fit.ard_warmstart_init).
    ard_isotropic_warmstart: bool = True
    # Feature-diversity regularizer (round-5 anti-collapse lever; no
    # reference analogue — the reference's 5k-assay training regime never
    # surfaces the bilevel rank-collapse that low-task-diversity regimes
    # do, .zoo2/ANALYSIS.md): adds
    #   reg * (log n_valid - vonNeumannEntropy(feature Gram))
    # to the episode outer loss. The entropy of the trace-normalized
    # Gram spectrum is log(effective rank) — exactly the quantity the
    # collapse probe (benchmarks/feature_collapse_probe.py) measures at
    # 1.0 on collapsed checkpoints — and the trace normalization makes
    # the penalty scale-invariant, so it shapes feature DIRECTION
    # diversity without fighting the GP refit's free scale.
    feature_diversity_reg: float = 0.0

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
                use_lengthscale_prior=self.use_lengthscale_prior,
            ),
            jitter=self.jitter,
        )


class ADKFPrediction(NamedTuple):
    mean: jnp.ndarray  # posterior predictive mean over query [Q]
    variance: jnp.ndarray  # predictive variance (incl. noise) [Q]
    gp_raw_params: jnp.ndarray  # fitted flat raw GP params


def make_encoder(config: ADKFModelConfig) -> nn.Module:
    return CombinedFeatureExtractor(config.features)


def init_encoder_params(config: ADKFModelConfig, rng: jax.Array, example: PackedGraphs):
    return make_encoder(config).init(rng, example)


def _episode_labels(config: ADKFModelConfig, episode: Episode) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if config.use_numeric_labels:
        return episode.support_numeric_labels, episode.query_numeric_labels
    return episode.support_labels, episode.query_labels


def _gp_init(
    config: ADKFModelConfig, support_features: jnp.ndarray
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fresh raw GP params + lengthscale prior loc, from DETACHED features
    (reference reinit_gp_params, adaptive_dkt.py:88-131)."""
    gp_cfg = config.gp_config
    detached = jax.lax.stop_gradient(support_features)
    params = init_raw_params(gp_cfg.kernel)
    params["raw_noise"] = noise_to_raw(jnp.asarray(gp_cfg.priors.noise_mode))
    ls_loc = None
    if gp_cfg.kernel.has_lengthscale:
        median = median_lengthscale_init(detached)
        ls = jnp.broadcast_to(median, jnp.shape(params["raw_lengthscale"]))
        params["raw_lengthscale"] = positive_to_raw(ls)
        if config.use_lengthscale_prior:
            ls_loc = mode_to_loc(median)
    return flatten_gp_params(gp_cfg.kernel, params), ls_loc


def inner_fit(
    config: ADKFModelConfig,
    support_features: jnp.ndarray,
    support_labels: jnp.ndarray,
    support_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fit GP hyperparameters on the support set; differentiable via IFT."""
    init_flat, ls_loc = _gp_init(config, support_features)
    if config.use_ard and config.ard_isotropic_warmstart:
        init_flat = ard_warmstart_init(
            config.gp_config,
            jax.lax.stop_gradient(support_features),
            support_labels,
            init_flat,
            support_mask,
            ls_loc,
        )
    return fit_gp_implicit(
        config.gp_config,
        config.inner_optimizer,
        config.ignore_grad_correction,
        support_features,
        support_labels,
        init_flat,
        support_mask,
        ls_loc,
    )


def _feature_rank_deficit(fs, fq, support_mask, query_mask) -> jnp.ndarray:
    """log(n_valid) − von-Neumann entropy of the episode's feature Gram.

    Zero iff the (masked, centered) features have a uniform spectrum;
    grows as they collapse toward rank 1. Computed on the [n, n] Gram
    (n = support+query rows, ≤ a few hundred), so the eigh is tiny; the
    eigenvalue-only VJP (V diag(λ̄) Vᵀ) has no divided-difference terms,
    so degenerate/zero eigenvalues from padded rows are grad-safe."""
    f = jnp.concatenate([fs, fq], axis=0).astype(jnp.float32)
    m = jnp.concatenate([support_mask, query_mask], axis=0).astype(jnp.float32)
    n = jnp.maximum(m.sum(), 2.0)
    mean = (f * m[:, None]).sum(0) / n
    fc = (f - mean[None, :]) * m[:, None]
    gram = jnp.matmul(fc, fc.T, precision=jax.lax.Precision.HIGHEST) / n
    lam = jnp.maximum(jnp.linalg.eigvalsh(gram), 0.0)
    p = lam / jnp.maximum(lam.sum(), 1e-12)
    entropy = -(p * jnp.log(p + 1e-12)).sum()
    return jnp.log(n) - entropy


def _gp_outer_loss(config, fs, ys, support_mask, fq, yq, query_mask) -> jnp.ndarray:
    """Inner fit + predictive query NLL on already-encoded features."""
    theta_star = inner_fit(config, fs, ys * support_mask, support_mask)
    gp_params = unflatten_gp_params(config.gp_config.kernel, theta_star)
    nll = predictive_nll(
        config.gp_config,
        gp_params,
        fs,
        ys,
        fq,
        yq,
        support_mask=support_mask,
        query_mask=query_mask,
    )
    # getattr: configs unpickled from pre-round-5 checkpoints lack the
    # field (unpickling bypasses __init__), and eval on them must work.
    reg = getattr(config, "feature_diversity_reg", 0.0)
    if reg:
        nll = nll + reg * _feature_rank_deficit(fs, fq, support_mask, query_mask)
    return nll


def episode_outer_loss(
    config: ADKFModelConfig,
    encoder_params,
    episode: Episode,
) -> jnp.ndarray:
    """The ADKF-IFT training objective for one episode: predictive query
    NLL at the inner-optimal GP parameters (forward modes (a)-(c) of the
    reference fused into one differentiable computation)."""
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(encoder_params, episode.support, episode.query)
    ys, yq = _episode_labels(config, episode)
    return _gp_outer_loss(
        config, fs, ys, episode.support.graph_mask, fq, yq, episode.query.graph_mask
    )


def batch_outer_loss(
    config: ADKFModelConfig,
    encoder_params,
    episode_batch: Episode,
) -> jnp.ndarray:
    """Per-episode losses [C] for a STACKED episode batch.

    TPU-critical structure: the whole chunk is encoded as ONE flat
    mega-graph (no batch dims on gathers/scatters — vmapping the encoder
    measures 1.5× slower than sequential, modules/encoder.flatten_stacked),
    and only the small dense GP computation is vmapped."""
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair_batch(encoder_params, episode_batch.support, episode_batch.query)
    if config.use_numeric_labels:
        ys, yq = episode_batch.support_numeric_labels, episode_batch.query_numeric_labels
    else:
        ys, yq = episode_batch.support_labels, episode_batch.query_labels
    return jax.vmap(
        lambda fs_i, ys_i, sm_i, fq_i, yq_i, qm_i: _gp_outer_loss(
            config, fs_i, ys_i, sm_i, fq_i, yq_i, qm_i
        )
    )(fs, ys, episode_batch.support.graph_mask, fq, yq, episode_batch.query.graph_mask)


def episode_predict(
    config: ADKFModelConfig,
    encoder_params,
    episode: Episode,
) -> ADKFPrediction:
    """Few-shot evaluation: refit GP on support, return noisy posterior
    over the query set (reference forward mode (d) after the inner fit,
    adaptive_dkt.py:198-203 + run_on_batches eval path)."""
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(encoder_params, episode.support, episode.query)
    ys, _ = _episode_labels(config, episode)
    support_mask = episode.support.graph_mask

    theta_star = inner_fit(config, fs, ys * support_mask, support_mask)
    gp_params = unflatten_gp_params(config.gp_config.kernel, theta_star)
    post = posterior(
        config.gp_config, gp_params, fs, ys * support_mask, fq,
        support_mask=support_mask, noisy=True,
    )
    return ADKFPrediction(mean=post.mean, variance=post.variance, gp_raw_params=theta_star)
