"""Conditional neural process.

Parity with fs_mol/models/cnp.py:28-132: label MLP (1->64->64) ⊕ encoder
features -> pair encoder (512->512->512) -> masked mean-pooled task
representation -> decoder MLP -> (mu, sigma) with sigma = 0.01 + 0.09 *
softplus(log_sigma); Bernoulli(logits=mu) log-prob for classification,
Normal(mu, sigma) for regression. CNP's FC head maps to the readout
output dim through a 1024-wide hidden layer (cnp.py:52-56), unlike
ADKT's 2048.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adkf_ift_tpu.data.episodes import Episode
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, CombinedFeatureExtractor


@dataclass(frozen=True)
class CNPConfig:
    features: CombinedFeatureConfig = field(default_factory=CombinedFeatureConfig)
    use_numeric_labels: bool = False

    def __post_init__(self):
        # CNP's FC head: in -> 1024 -> readout output dim (cnp.py:52-56).
        out_dim = self.features.graph_config.readout_config.output_dim
        if self.features.use_fc and self.features.fc_out_dim != out_dim:
            object.__setattr__(
                self,
                "features",
                replace(self.features, fc_out_dim=out_dim, fc_hidden_dim=1024),
            )


class CNPModel(nn.Module):
    config: CNPConfig

    @nn.compact
    def __call__(self, episode: Episode) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        feat_dim = cfg.features.output_dim
        encoder = CombinedFeatureExtractor(cfg.features, name="feature_extractor")
        fs = encoder(episode.support)
        fq = encoder(episode.query)
        s_mask = episode.support.graph_mask
        if cfg.use_numeric_labels:
            s_labels = episode.support_numeric_labels[:, None]
        else:
            s_labels = (episode.support_labels > 0).astype(jnp.float32)[:, None]

        label_emb = nn.Dense(64, name="label_fc1")(s_labels)
        label_emb = nn.Dense(64, name="label_fc2")(nn.relu(label_emb))

        pairs = jnp.concatenate([fs, label_emb], axis=1)
        h = nn.relu(nn.Dense(512, name="enc_fc1")(pairs))
        h = nn.relu(nn.Dense(512, name="enc_fc2")(h))
        h = nn.Dense(512, name="enc_fc3")(h)

        # Masked mean pooling over REAL support points (reference mean over
        # the unpadded batch, cnp.py:119).
        denom = jnp.maximum(jnp.sum(s_mask), 1.0)
        representation = jnp.sum(h * s_mask[:, None], axis=0, keepdims=True) / denom
        representation = jnp.broadcast_to(representation, (fq.shape[0], 512))

        dec_in = jnp.concatenate([representation, fq], axis=1)
        d = nn.relu(nn.Dense(512, name="dec_fc1")(dec_in))
        d = nn.relu(nn.Dense(512, name="dec_fc2")(d))
        d = nn.relu(nn.Dense(256, name="dec_fc3")(d))
        d = nn.relu(nn.Dense(256, name="dec_fc4")(d))
        out = nn.Dense(2, name="dec_out")(d)
        mu, log_sigma = out[:, 0], out[:, 1]
        sigma = 0.01 + 0.09 * jax.nn.softplus(log_sigma)
        return mu, sigma, fq


def make_model(config: CNPConfig) -> CNPModel:
    return CNPModel(config)


def init_params(config: CNPConfig, rng: jax.Array, example_episode: Episode):
    return make_model(config).init(rng, example_episode)


def episode_log_prob(config: CNPConfig, params, episode: Episode) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query-point log probability and the query mask."""
    mu, sigma, _ = make_model(config).apply(params, episode)
    q_mask = episode.query.graph_mask
    if config.use_numeric_labels:
        y = episode.query_numeric_labels
        log_prob = (
            -0.5 * ((y - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * math.log(2 * math.pi)
        )
    else:
        y = (episode.query_labels > 0).astype(jnp.float32)
        log_prob = y * jax.nn.log_sigmoid(mu) + (1 - y) * jax.nn.log_sigmoid(-mu)
    return log_prob, q_mask


def episode_loss(config: CNPConfig, params, episode: Episode) -> jnp.ndarray:
    log_prob, mask = episode_log_prob(config, params, episode)
    return -jnp.sum(log_prob * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def episode_predict(config: CNPConfig, params, episode: Episode) -> jnp.ndarray:
    """Probabilities (classification) or means (regression) over query."""
    mu, sigma, _ = make_model(config).apply(params, episode)
    if config.use_numeric_labels:
        return mu
    return jax.nn.sigmoid(mu)
