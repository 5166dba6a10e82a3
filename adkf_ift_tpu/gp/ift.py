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
# materializing the dense Hessian. The CG budget/tolerance live on
# LBFGSConfig (ift_cg_iters / ift_cg_tol).
DENSE_HESSIAN_MAX_DIM = 64


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


def _solve_hessian_system(inner_loss_theta, theta_star, g,
                          cg_iters: int = 100, cg_tol: float = 1e-5):
    """Solve H v = g where H = ∂²L_in/∂θ² at theta*.

    The dense route preconditions by |eigenvalues| (clamped) instead of
    a plain solve: inner fits on real training trajectories stop at
    points whose Hessian retains mildly negative eigenvalues (iteration
    cap / f32 plateaus — benchmarks/ift_stability.py), and a true
    inverse there flips the correction's sign along those directions and
    blows its norm up (measured corr/direct ratios up to ~9x). The
    |Λ|-preconditioned solve equals the exact IFT whenever θ* is a
    minimum and degrades gracefully when it is not. (The reference
    asserts invertibility and solves regardless,
    cauchy_hypergradient.py:66-75 — scipy L-BFGS-B rarely leaves it
    indefinite.)"""
    d = theta_star.shape[0]
    grad_fn = jax.grad(inner_loss_theta)
    if d <= DENSE_HESSIAN_MAX_DIM:
        h = jax.jacfwd(grad_fn)(theta_star)
        lam, vecs = jnp.linalg.eigh(h)
        lam_abs = jnp.maximum(jnp.abs(lam), 1e-6)
        return vecs @ ((vecs.T @ g) / lam_abs)

    def hvp(v):
        return jax.jvp(grad_fn, (theta_star,), (v,))[1] + 1e-6 * v

    # NOTE on preconditioning: a Jacobi preconditioner from an 8-probe
    # Hutchinson diagonal estimate was tried here and REJECTED — on the
    # hard instances it targets (CG needing ~333 iters to 1e-5) it made
    # the hypergradient WORSE at every budget (relerr@100: 0.80 -> 2.38,
    # benchmarks/ard_cpu_probe.py): the ARD Hessian carries enough
    # off-diagonal mass that the probe-noise in the diagonal estimate
    # outweighs the conditioning win. Plain CG + a budget that covers
    # the measured worst case (LBFGSConfig.ift_cg_iters) is the honest
    # configuration; CG exits early at ift_cg_tol, so easy (warm-started)
    # instances still cost ~4 iterations.
    v, _ = jax.scipy.sparse.linalg.cg(hvp, g, maxiter=cg_iters, tol=cg_tol)
    return v


def _bwd(config, optimizer, first_order, residuals, theta_bar):
    x, y, theta_star, mask, lengthscale_prior_loc = residuals
    zero_init = jnp.zeros_like(theta_star)
    zero_mask = None if mask is None else jnp.zeros_like(mask)
    zero_loc = None if lengthscale_prior_loc is None else jnp.zeros_like(lengthscale_prior_loc)

    if first_order:
        return (jnp.zeros_like(x), jnp.zeros_like(y), zero_init, zero_mask, zero_loc)

    # PRECISION SPLIT. Reverse-over-reverse through the MLL in float32
    # is catastrophically ill-conditioned: measured end-to-end, the f32
    # correction term carries 20-140% relative error vs the f64 ground
    # truth (internal cancellation scales ~1e5-1e6 x f32 eps) while the
    # first-order term is accurate to ~1e-4 — i.e. the f32 IFT
    # correction is mostly noise, which destabilized full-IFT
    # meta-training. (The reference computes this contraction in torch
    # f32, cauchy_hypergradient.py:128-161, and inherits the noise.)
    #
    # All theta-space second-order math therefore runs in float64 via a
    # trace-scoped x64 region (the jaxpr keeps f64 ops regardless of the
    # global flag). For kernels that factor through a theta-independent
    # Gram intermediate (kernels.gram_supported — the flagship Matern
    # path), the f64 region touches ONLY [n, n] objects: the loss is
    # re-expressed as L(theta; GRAM(x)), the cotangent is pulled back to
    # the Gram in f64, and the final Gram->features pullback (the big
    # [n, d] matmuls) runs in f32, where it is a well-conditioned
    # FIRST-order product. Cost on the bench config: unmeasurable
    # (vs -15% steps/s for the whole-backward-in-f64 variant).
    from adkf_ift_tpu.gp.kernels import base_gram, gram_supported

    x_dt, y_dt = x.dtype, y.dtype
    use_gram = gram_supported(config.kernel)
    gram32 = base_gram(config.kernel, x, x) if use_gram else None
    with jax.enable_x64(True):
        f64 = jnp.float64
        y64, theta64, bar64 = (
            y.astype(f64), theta_star.astype(f64), theta_bar.astype(f64)
        )
        mask64 = None if mask is None else mask.astype(f64)
        loc64 = (
            None
            if lengthscale_prior_loc is None
            else lengthscale_prior_loc.astype(f64)
        )

        if use_gram:
            gram64 = jax.tree.map(lambda a: a.astype(f64), gram32)

            def inner_loss_theta(theta):
                return make_inner_loss(config, None, y64, mask64, loc64, gram=gram64)(theta)

            v = _solve_hessian_system(
                inner_loss_theta, theta64, bar64,
                cg_iters=optimizer.ift_cg_iters, cg_tol=optimizer.ift_cg_tol,
            )

            def grad_wrt_gram(gram_, y_):
                loss = make_inner_loss(config, None, y_, mask64, loc64, gram=gram_)
                return jax.grad(loss)(theta64)

            _, vjp_fn = jax.vjp(grad_wrt_gram, gram64, y64)
            gram_bar64, y_bar = vjp_fn(v)
            gram_bar = jax.tree.map(lambda a: a.astype(x_dt), gram_bar64)
            y_bar = y_bar.astype(y_dt)
        else:
            x64 = x.astype(f64)

            def inner_loss_theta(theta):
                return make_inner_loss(config, x64, y64, mask64, loc64)(theta)

            v = _solve_hessian_system(
                inner_loss_theta, theta64, bar64,
                cg_iters=optimizer.ift_cg_iters, cg_tol=optimizer.ift_cg_tol,
            )

            # Cotangents wrt (x, y): -d/d(x,y) <grad_theta L_in, v>
            def grad_wrt_theta(x_, y_):
                loss = make_inner_loss(config, x_, y_, mask64, loc64)
                return jax.grad(loss)(theta64)

            _, vjp_fn = jax.vjp(grad_wrt_theta, x64, y64)
            x_bar, y_bar = vjp_fn(v)
            x_bar = x_bar.astype(x_dt)
            y_bar = y_bar.astype(y_dt)

    if use_gram:
        # f32 first-order pullback of the Gram cotangent to the features.
        _, vjp_x = jax.vjp(lambda x_: base_gram(config.kernel, x_, x_), x)
        x_bar = vjp_x(gram_bar)[0]
    return (-x_bar, -y_bar, zero_init, zero_mask, zero_loc)


fit_gp_implicit.defvjp(_fwd, _bwd)
