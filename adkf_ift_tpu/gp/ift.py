"""Implicit-function-theorem hypergradients through the GP inner fit.

The reference computes hypergradients by hand after the fact
(fs_mol/utils/cauchy_hypergradient.py / cauchy_hypergradient_jvp.py):
dense inner Hessian, mixed partials, a linear solve, then a manual
`p.grad -=` correction. Here the same mathematics lives inside JAX's
autodiff system as a custom_vjp on the inner fit itself:

    theta* = fit_gp_implicit(x, y, ...)            # forward: L-BFGS
    bar{x} += -(d²L_in/dx dθ) · H⁻¹ · bar{θ*}       # backward: IFT

so the *entire* outer step — encoder forward, inner fit, predictive
query loss, hypergradient — is one jitted, vmappable computation. The
correction term matches cauchy_hypergradient.py:128-161 (v = H⁻¹ ∂L_out/∂θ,
grad -= v·J) but uses a vjp-of-grad instead of materializing J, i.e. the
memory-efficient strategy of cauchy_hypergradient_jvp.py:96-131.

For non-ARD kernels the inner dimension is ~3, so the Hessian solve is a
dense 3×3; with ARD it switches to matrix-free conjugate gradients on
Hessian-vector products (SURVEY.md §2.9 item 4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from adkf_ift_tpu.gp.exact import ExactGPConfig
from adkf_ift_tpu.gp.fit import LBFGSConfig, make_inner_loss, minimize

# Above this inner dimension, solve H v = g by CG on HVPs instead of
# materializing the dense Hessian.
DENSE_HESSIAN_MAX_DIM = 64
_CG_ITERS = 100


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fit_gp_implicit(
    config: ExactGPConfig,
    optimizer: LBFGSConfig,
    first_order: bool,
    x: jnp.ndarray,
    y: jnp.ndarray,
    init_flat: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    lengthscale_prior_loc: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Inner-loop GP fit whose output differentiates via the IFT.

    Args:
        config/optimizer: static GP + L-BFGS configuration.
        first_order: drop the IFT correction entirely (the reference's
            --ignore-grad-correction ablation, adaptive_dkt_train.py:127).
        x: support features [n, d] (gradient flows to the encoder here).
        y: support labels [n].
        init_flat: initial flat raw GP parameter vector.
        mask: optional [n] validity mask for padded support points.
        lengthscale_prior_loc: constant prior location (callers pass a
            stop_gradient'ed value, matching the reference's detached
            median heuristic).

    Returns:
        theta*: flat raw GP parameters minimizing the inner loss.
    """
    loss = make_inner_loss(config, x, y, mask, lengthscale_prior_loc)
    return minimize(loss, init_flat, optimizer).x


def _fwd(config, optimizer, first_order, x, y, init_flat, mask, lengthscale_prior_loc):
    theta_star = fit_gp_implicit(
        config, optimizer, first_order, x, y, init_flat, mask, lengthscale_prior_loc
    )
    return theta_star, (x, y, theta_star, mask, lengthscale_prior_loc)


def _solve_hessian_system(inner_loss_theta, theta_star, g):
    """Solve H v = g where H = ∂²L_in/∂θ² at theta*."""
    d = theta_star.shape[0]
    grad_fn = jax.grad(inner_loss_theta)
    if d <= DENSE_HESSIAN_MAX_DIM:
        h = jax.jacfwd(grad_fn)(theta_star)
        # Tiny Tikhonov damping guards near-singular Hessians (the
        # reference only asserts invertibility, cauchy_hypergradient.py:66-75).
        h = h + 1e-6 * jnp.eye(d, dtype=h.dtype)
        return jnp.linalg.solve(h, g)

    def hvp(v):
        return jax.jvp(grad_fn, (theta_star,), (v,))[1] + 1e-6 * v

    v, _ = jax.scipy.sparse.linalg.cg(hvp, g, maxiter=_CG_ITERS)
    return v


def _bwd(config, optimizer, first_order, residuals, theta_bar):
    x, y, theta_star, mask, lengthscale_prior_loc = residuals
    zero_init = jnp.zeros_like(theta_star)
    zero_mask = None if mask is None else jnp.zeros_like(mask)
    zero_loc = None if lengthscale_prior_loc is None else jnp.zeros_like(lengthscale_prior_loc)

    if first_order:
        return (jnp.zeros_like(x), jnp.zeros_like(y), zero_init, zero_mask, zero_loc)

    def inner_loss_theta(theta):
        return make_inner_loss(config, x, y, mask, lengthscale_prior_loc)(theta)

    v = _solve_hessian_system(inner_loss_theta, theta_star, theta_bar)

    # Cotangents wrt (x, y): -d/d(x,y) <grad_theta L_in(x, y, theta*), v>
    def grad_wrt_theta(x_, y_):
        loss = make_inner_loss(config, x_, y_, mask, lengthscale_prior_loc)
        return jax.grad(loss)(theta_star)

    _, vjp_fn = jax.vjp(grad_wrt_theta, x, y)
    x_bar, y_bar = vjp_fn(v)
    return (-x_bar, -y_bar, zero_init, zero_mask, zero_loc)


fit_gp_implicit.defvjp(_fwd, _bwd)
