"""Prototypical networks with Mahalanobis or euclidean distances.

Parity with fs_mol/models/protonet.py:63-233: class prototypes from
support means; for "mahalanobis", per-class precision matrices from the
shrinkage-regularized covariance mix lambda*cov_class + (1-lambda)*
cov_task + 0.1*I with lambda = min(n_c/(n_c+1), 0.1) (protonet.py:128-136,
i.e. effectively 0.1); logits = -distance²; cross-entropy loss over the
two classes. All computations are masked so padded support/query points
contribute nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from adkf_ift_tpu.data.episodes import Episode
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, CombinedFeatureExtractor

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class ProtoNetConfig:
    features: CombinedFeatureConfig = field(default_factory=CombinedFeatureConfig)
    distance_metric: str = "mahalanobis"  # or "euclidean"


def make_encoder(config: ProtoNetConfig) -> CombinedFeatureExtractor:
    return CombinedFeatureExtractor(config.features)


def init_params(config: ProtoNetConfig, rng: jax.Array, example):
    return make_encoder(config).init(rng, example)


def _masked_mean(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(x * w[:, None], axis=0) / denom


def _masked_cov(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Sample covariance with (n-1) normalization over masked rows
    (reference _estimate_cov, protonet.py:144-184)."""
    n = jnp.sum(w)
    mean = _masked_mean(x, w)
    centered = (x - mean) * w[:, None]
    factor = 1.0 / jnp.maximum(n - 1.0, 1.0)
    return factor * jnp.matmul(centered.T, centered, precision=_HIGHEST)


def class_means_and_precisions(
    features: jnp.ndarray, labels01: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked port of compute_class_means_and_precisions (protonet.py:117-142).

    labels01: 0/1 floats; returns means [2, d], precisions [2, d, d].
    """
    d = features.shape[1]
    task_cov = _masked_cov(features, mask)
    means, precisions = [], []
    for c in (0.0, 1.0):
        w = mask * jnp.where(labels01 == c, 1.0, 0.0)
        n_c = jnp.sum(w)
        means.append(_masked_mean(features, w))
        lam = jnp.minimum(n_c / (n_c + 1.0), 0.1)
        cov = lam * _masked_cov(features, w) + (1.0 - lam) * task_cov + 0.1 * jnp.eye(d)
        precisions.append(jnp.linalg.inv(cov))
    return jnp.stack(means), jnp.stack(precisions)


def episode_logits(
    config: ProtoNetConfig, encoder_params, episode: Episode
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (logits [Q, 2], query labels01 [Q], query mask [Q])."""
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(encoder_params, episode.support, episode.query)
    s_mask = episode.support.graph_mask
    q_mask = episode.query.graph_mask
    s_labels01 = (episode.support_labels > 0).astype(jnp.float32)
    q_labels01 = (episode.query_labels > 0).astype(jnp.float32)

    if config.distance_metric == "mahalanobis":
        means, precisions = class_means_and_precisions(fs, s_labels01, s_mask)
        diff = means[None, :, :] - fq[:, None, :]  # [Q, 2, d]
        half = jnp.einsum("qcd,cde->qce", diff, precisions, precision=_HIGHEST)
        logits = -jnp.sum(half * diff, axis=-1)  # [Q, 2]
    else:
        protos = []
        for c in (0.0, 1.0):
            w = s_mask * jnp.where(s_labels01 == c, 1.0, 0.0)
            protos.append(_masked_mean(fs, w))
        protos = jnp.stack(protos)  # [2, d]
        d2 = jnp.sum((fq[:, None, :] - protos[None, :, :]) ** 2, axis=-1)
        logits = -d2
    return logits, q_labels01, q_mask


def episode_loss(config: ProtoNetConfig, encoder_params, episode: Episode) -> jnp.ndarray:
    """Masked cross-entropy over query points (protonet.py:192-194)."""
    logits, labels01, mask = episode_logits(config, encoder_params, episode)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -(labels01 * logp[:, 1] + (1.0 - labels01) * logp[:, 0])
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def episode_predict(config: ProtoNetConfig, encoder_params, episode: Episode) -> jnp.ndarray:
    """Positive-class probabilities over the query set."""
    logits, _, _ = episode_logits(config, encoder_params, episode)
    return jax.nn.softmax(logits, axis=-1)[:, 1]
