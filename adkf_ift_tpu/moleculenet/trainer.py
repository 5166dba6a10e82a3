"""ADKF-IFT on MoleculeNet — parity with
MoleculeNet/chem_lib/models/adkf_model.py + adkfift_trainer.py: the same
inner-fit -> IFT -> outer-predictive-loss structure as FS-Mol's ADKF, on
the Hu-et-al GIN encoder with Matérn GP, noise prior mode 0.1, median
lengthscale init + prior. The 'Pre-ADKF-IFT' baseline (adkf_trainer.py:
350-456) is the same predict path with a frozen encoder.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

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
    posterior,
    predictive_nll,
    unflatten_gp_params,
)
from adkf_ift_tpu.moleculenet.data import MolNetEpisode
from adkf_ift_tpu.moleculenet.encoder import MolNetEncoder, MolNetEncoderConfig


@dataclass(frozen=True)
class MolNetADKFConfig:
    encoder: MolNetEncoderConfig = field(default_factory=MolNetEncoderConfig)
    gp_kernel: str = "matern"
    use_lengthscale_prior: bool = True
    ignore_grad_correction: bool = False
    inner_optimizer: LBFGSConfig = field(default_factory=LBFGSConfig)
    jitter: float = 1e-5

    @property
    def gp_config(self) -> ExactGPConfig:
        return ExactGPConfig(
            kernel=KernelConfig(kind=self.gp_kernel),
            priors=GPPriorConfig(
                noise_mode=0.1, use_lengthscale_prior=self.use_lengthscale_prior
            ),
            jitter=self.jitter,
        )


class MolNetPrediction(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray


def make_encoder(config: MolNetADKFConfig) -> MolNetEncoder:
    return MolNetEncoder(config.encoder)


def init_encoder_params(config: MolNetADKFConfig, rng: jax.Array, example):
    return make_encoder(config).init(rng, example)


def _inner_fit(config: MolNetADKFConfig, fs, ys, mask):
    gp_cfg = config.gp_config
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
            ls_loc = mode_to_loc(median)
    return fit_gp_implicit(
        gp_cfg, config.inner_optimizer, config.ignore_grad_correction,
        fs, ys * mask, flatten_gp_params(gp_cfg.kernel, raw), mask, ls_loc,
    )


def episode_outer_loss(config: MolNetADKFConfig, encoder_params, episode: MolNetEpisode):
    """Predictive query NLL at the inner-optimal GP params
    (adkfift_trainer.py:148-218 train_step objective)."""
    encoder = make_encoder(config)
    fs = encoder.apply(encoder_params, episode.support)
    fq = encoder.apply(encoder_params, episode.query)
    s_mask = episode.support.graph_mask
    q_mask = episode.query.graph_mask
    theta = _inner_fit(config, fs, episode.support_labels, s_mask)
    params = unflatten_gp_params(config.gp_config.kernel, theta)
    return predictive_nll(
        config.gp_config, params, fs, episode.support_labels, fq, episode.query_labels,
        support_mask=s_mask, query_mask=q_mask,
    )


def test_time_adapt(
    config: MolNetADKFConfig,
    encoder_params,
    adapt_episode: MolNetEpisode,
    num_steps: int = 1,
    lr: float = 5e-5,
):
    """Test-time outer-loop adaptation (adkfift_trainer.py:230-271,
    update_step_test>0): before the final GP refit, run a few ADKF outer
    steps ON THE TEST TASK's support pool — inner GP fit, IFT
    hypergradient of the predictive loss, clipped AdamW on the ENCODER
    only — then return the adapted encoder params. The caller evaluates
    with episode_predict as usual."""
    import optax

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = opt.init(encoder_params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: episode_outer_loss(config, p, adapt_episode)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(num_steps):
        encoder_params, opt_state, _ = step(encoder_params, opt_state)
    return encoder_params


def episode_predict(config: MolNetADKFConfig, encoder_params, episode: MolNetEpisode):
    """GP refit on support + noisy posterior over query
    (adkfift_trainer.py:220-309 test_step; with a frozen pretrained
    encoder this is exactly the Pre-ADKF-IFT baseline)."""
    encoder = make_encoder(config)
    fs = encoder.apply(encoder_params, episode.support)
    fq = encoder.apply(encoder_params, episode.query)
    s_mask = episode.support.graph_mask
    theta = _inner_fit(config, fs, episode.support_labels, s_mask)
    params = unflatten_gp_params(config.gp_config.kernel, theta)
    post = posterior(
        config.gp_config, params, fs, episode.support_labels * s_mask, fq,
        support_mask=s_mask, noisy=True,
    )
    return MolNetPrediction(mean=post.mean, variance=post.variance)


def evaluate_task_auroc(
    config: MolNetADKFConfig, encoder_params, episodes
) -> Tuple[float, list]:
    """Mean AUROC over episodes (the benchmark's headline metric,
    adkfift_trainer.py:297-303)."""
    import numpy as np
    from sklearn.metrics import roc_auc_score

    predict = jax.jit(lambda p, e: episode_predict(config, p, e).mean)
    scores = []
    for ep in episodes:
        mean = np.asarray(predict(encoder_params, ep))
        mask = np.asarray(ep.query.graph_mask) > 0
        labels = np.asarray(ep.query_labels)[mask] > 0
        if labels.all() or not labels.any():
            continue
        scores.append(roc_auc_score(labels, mean[mask]))
    return float(np.mean(scores)) if scores else float("nan"), scores
