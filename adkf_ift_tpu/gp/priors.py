"""Hyperparameter priors for the GP inner objective.

The reference registers LogNormal priors whose mode is a target value
(noise mode 0.1 for classification / 0.01 for regression,
adaptive_dkt.py:112-119; lengthscale mode = median heuristic,
adaptive_dkt.py:92-101). LogNormal(loc, scale) has mode exp(loc - scale²),
so loc = log(mode) + scale² with scale = 0.25.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

PRIOR_SCALE = 0.25
_LOG_2PI = math.log(2.0 * math.pi)


def lognormal_logpdf(x: jnp.ndarray, loc: jnp.ndarray, scale: float) -> jnp.ndarray:
    logx = jnp.log(x)
    return -logx - math.log(scale) - 0.5 * _LOG_2PI - (logx - loc) ** 2 / (2.0 * scale**2)


def mode_to_loc(mode: jnp.ndarray, scale: float = PRIOR_SCALE) -> jnp.ndarray:
    return jnp.log(mode) + scale**2


@dataclass(frozen=True)
class GPPriorConfig:
    """Static prior configuration.

    noise_mode: mode of the LogNormal noise prior (0.1 classification,
        0.01 regression).
    use_noise_prior: ADKF registers a noise prior (adaptive_dkt.py:112-121);
        DKT's likelihood has none (models/dkt.py:85).
    use_lengthscale_prior: whether a LogNormal prior (mode = median
        heuristic, passed at runtime) is placed on the lengthscale.
    """

    noise_mode: float = 0.1
    use_noise_prior: bool = True
    use_lengthscale_prior: bool = True
    scale: float = PRIOR_SCALE


def prior_log_prob(
    config: GPPriorConfig,
    noise: jnp.ndarray,
    lengthscale: Optional[jnp.ndarray] = None,
    lengthscale_prior_loc: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Total log prior density added to the exact MLL.

    `lengthscale_prior_loc` is log(median_init) + scale² computed from
    stop-gradient features at episode construction (the reference treats
    the prior location as a constant wrt the encoder: reinit_gp_params is
    called on detached features, adaptive_dkt.py:178).
    """
    total = jnp.zeros(())
    if config.use_noise_prior:
        total = total + jnp.sum(
            lognormal_logpdf(
                noise, mode_to_loc(jnp.asarray(config.noise_mode), config.scale), config.scale
            )
        )
    if config.use_lengthscale_prior and lengthscale is not None and lengthscale_prior_loc is not None:
        total = total + jnp.sum(lognormal_logpdf(lengthscale, lengthscale_prior_loc, config.scale))
    return total
