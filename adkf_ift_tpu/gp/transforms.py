"""Raw-parameter transforms for positive GP hyperparameters.

Mirrors the raw-parameter convention of the reference GP stack
(GPyTorch positivity constraints used via fs_mol/utils/gp_utils.py:7-49):
every positive hyperparameter is stored unconstrained ("raw") and mapped
through softplus; the Gaussian-likelihood noise additionally has a lower
bound. Keeping the same parameterization makes inner-loop optimization
landscapes comparable and checkpoints interpretable.
"""

from __future__ import annotations

import jax.numpy as jnp

# Lower bound on observation noise (reference: GaussianLikelihood's
# GreaterThan(1e-4) constraint).
NOISE_LOWER_BOUND = 1e-4


def softplus(raw: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable softplus."""
    return jnp.logaddexp(raw, 0.0)


def inv_softplus(value: jnp.ndarray) -> jnp.ndarray:
    """Inverse of softplus; stable for large values."""
    value = jnp.asarray(value)
    # log(exp(v) - 1) = v + log1p(-exp(-v))
    return value + jnp.log(-jnp.expm1(-value))


def raw_to_positive(raw: jnp.ndarray) -> jnp.ndarray:
    return softplus(raw)


def positive_to_raw(value: jnp.ndarray) -> jnp.ndarray:
    return inv_softplus(value)


def raw_to_noise(raw: jnp.ndarray) -> jnp.ndarray:
    return softplus(raw) + NOISE_LOWER_BOUND


def noise_to_raw(noise: jnp.ndarray) -> jnp.ndarray:
    return inv_softplus(jnp.asarray(noise) - NOISE_LOWER_BOUND)
