"""Hypergradient correctness: the custom_vjp IFT gradient of an outer
(predictive query NLL) objective through the inner GP fit must match
central finite differences of the full pipeline (fit included).

This is the from-scratch analogue of the reference's notebook validation
of cauchy_hypergradient (test_hypergrad.ipynb) turned into a real test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
    predictive_nll,
    unflatten_gp_params,
)

# Very tight inner convergence so the IFT stationarity assumption holds for
# the finite-difference comparison (the outer loss is linearly sensitive to
# theta* residual error, which otherwise dominates the FD quotient).
_OPT = LBFGSConfig(max_iters=250, grad_tol=1e-12, max_backtrack=30)
_CFG = ExactGPConfig(priors=GPPriorConfig(noise_mode=0.1, use_lengthscale_prior=True))


def _episode(seed=0, ns=20, nq=10, d=5):
    rng = np.random.RandomState(seed)
    w = rng.randn(d).astype(np.float32)
    xs = rng.randn(ns, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    ys = np.tanh(xs @ w) + 0.1 * rng.randn(ns).astype(np.float32)
    yq = np.tanh(xq @ w) + 0.1 * rng.randn(nq).astype(np.float32)
    return map(jnp.asarray, (xs, ys.astype(np.float32), xq, yq.astype(np.float32)))


def _init_flat(x):
    params = init_raw_params(_CFG.kernel)
    params["raw_noise"] = noise_to_raw(jnp.asarray(_CFG.priors.noise_mode))
    params["raw_lengthscale"] = positive_to_raw(median_lengthscale_init(x))
    return flatten_gp_params(_CFG.kernel, params)


def _outer(xs, ys, xq, yq, first_order=False, ls_loc=None, init=None):
    """Full outer objective: inner-fit GP on support, predictive NLL on query.

    ls_loc/init may be pinned to constants: the prior location and the
    inner init are stop_gradient'ed by design (the reference computes them
    from detached features, adaptive_dkt.py:178), so finite-difference
    checks must hold them fixed to probe the same mathematical function
    autodiff sees.
    """
    if ls_loc is None:
        ls_loc = jax.lax.stop_gradient(mode_to_loc(median_lengthscale_init(xs)))
    if init is None:
        init = jax.lax.stop_gradient(_init_flat(xs))
    theta = fit_gp_implicit(_CFG, _OPT, first_order, xs, ys, init, None, ls_loc)
    params = unflatten_gp_params(_CFG.kernel, theta)
    return predictive_nll(_CFG, params, xs, ys, xq, yq)


def test_ift_gradient_matches_finite_differences():
    """Directional finite differences in float64 of the FULL pipeline
    (inner refit included) vs the IFT autodiff gradient."""
    with jax.enable_x64(True):
        xs, ys, xq, yq = (a.astype(jnp.float64) for a in _episode(0))
        ls_loc = mode_to_loc(median_lengthscale_init(xs))
        init = _init_flat(xs)
        f = jax.jit(lambda xs_: _outer(xs_, ys, xq, yq, ls_loc=ls_loc, init=init))
        g = np.asarray(jax.jit(jax.grad(lambda xs_: _outer(xs_, ys, xq, yq, ls_loc=ls_loc, init=init)))(xs))

        rng = np.random.RandomState(1)
        eps = 1e-4
        for k in range(4):
            direction = rng.randn(*xs.shape)
            direction /= np.linalg.norm(direction)
            d = jnp.asarray(direction)
            fd = (float(f(xs + eps * d)) - float(f(xs - eps * d))) / (2 * eps)
            dd = float(np.sum(g * direction))
            assert np.isclose(dd, fd, rtol=5e-3, atol=1e-6), (k, dd, fd)


def test_first_order_ablation_differs_and_is_direct_grad():
    """first_order=True must reproduce the gradient with theta* detached
    (the reference's ignore_grad_correction ablation)."""
    xs, ys, xq, yq = _episode(2)

    g_full = np.asarray(jax.grad(lambda x: _outer(x, ys, xq, yq, False))(xs))
    g_first = np.asarray(jax.grad(lambda x: _outer(x, ys, xq, yq, True))(xs))

    def outer_detached(xs_):
        ls_loc = jax.lax.stop_gradient(mode_to_loc(median_lengthscale_init(xs_)))
        init = jax.lax.stop_gradient(_init_flat(xs_))
        theta = fit_gp_implicit(_CFG, _OPT, True, jax.lax.stop_gradient(xs_), ys, init, None, ls_loc)
        params = unflatten_gp_params(_CFG.kernel, jax.lax.stop_gradient(theta))
        return predictive_nll(_CFG, params, xs_, ys, xq, yq)

    g_direct = np.asarray(jax.grad(outer_detached)(xs))
    assert np.allclose(g_first, g_direct, atol=1e-5)
    # And the IFT correction must actually change something.
    assert not np.allclose(g_full, g_first, atol=1e-6)


def test_ift_correction_term_matches_manual_solve():
    """Cross-check the custom_vjp backward against a hand-rolled
    hessian-solve + mixed-partial contraction (the reference's exact
    recipe, cauchy_hypergradient.py:41-161)."""
    from adkf_ift_tpu.gp.fit import make_inner_loss

    xs, ys, xq, yq = _episode(3, ns=12, nq=6, d=4)
    ls_loc = mode_to_loc(median_lengthscale_init(xs))
    init = _init_flat(xs)
    theta_star = fit_gp_implicit(_CFG, _OPT, False, xs, ys, init, None, ls_loc)

    def outer_of(xs_, theta):
        params = unflatten_gp_params(_CFG.kernel, theta)
        return predictive_nll(_CFG, params, xs_, ys, xq, yq)

    # Manual recipe in FLOAT64: reverse-over-reverse through the MLL in
    # f32 is catastrophically cancellation-prone (measured 20-140%
    # relative error on the correction — the reason gp/ift._bwd runs in
    # f64), so the ground-truth cross-check must be f64 as well.
    with jax.enable_x64(True):
        xs64 = xs.astype(jnp.float64)
        ys64 = ys.astype(jnp.float64)
        xq64 = xq.astype(jnp.float64)
        yq64 = yq.astype(jnp.float64)
        th64 = theta_star.astype(jnp.float64)
        ll64 = ls_loc.astype(jnp.float64)

        def outer64(xs_, theta):
            params = unflatten_gp_params(_CFG.kernel, theta)
            return predictive_nll(_CFG, params, xs_, ys64, xq64, yq64)

        g_direct = jax.grad(outer64, argnums=0)(xs64, th64)
        dout_dtheta = jax.grad(outer64, argnums=1)(xs64, th64)
        inner = lambda xs_, th: make_inner_loss(_CFG, xs_, ys64, None, ll64)(th)
        h = jax.jacfwd(jax.grad(inner, argnums=1), argnums=1)(xs64, th64)
        lam, vecs = jnp.linalg.eigh(h)
        # the implementation's |eigenvalue|-preconditioned solve
        v = vecs @ ((vecs.T @ dout_dtheta) / jnp.maximum(jnp.abs(lam), 1e-6))
        _, vjp_fn = jax.vjp(lambda x_: jax.grad(inner, argnums=1)(x_, th64), xs64)
        corr = vjp_fn(v)[0]
        manual = np.asarray(g_direct - corr)

        # whenever theta* is a comfortable minimum the preconditioned
        # solve must coincide with the reference's plain solve
        if float(lam.min()) > 1e-3:
            v_plain = jnp.linalg.solve(h + 1e-6 * jnp.eye(h.shape[0]), dout_dtheta)
            np.testing.assert_allclose(
                np.asarray(vjp_fn(v_plain)[0]), np.asarray(corr), rtol=1e-4, atol=1e-8
            )

    auto = np.asarray(jax.grad(lambda x_: _outer(x_, ys, xq, yq))(xs))
    assert np.allclose(auto, manual, rtol=1e-3, atol=1e-5)


def test_ard_fit_and_ift_via_cg():
    """ARD lengthscales: inner dim = d + 2 exceeds the dense-Hessian
    threshold, so the IFT backward solves via CG on HVPs."""
    import numpy as np

    from adkf_ift_tpu.gp import (
        ExactGPConfig, GPPriorConfig, KernelConfig, LBFGSConfig,
        fit_gp_implicit, flatten_gp_params, init_raw_params,
        median_lengthscale_init, mode_to_loc, noise_to_raw,
        positive_to_raw, predictive_nll, unflatten_gp_params,
    )

    d = 80  # > DENSE_HESSIAN_MAX_DIM (64) incl. noise/outputscale
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(24, d).astype(np.float32))
    y = jnp.asarray(np.sign(rng.randn(24)).astype(np.float32))
    xq = jnp.asarray(rng.randn(12, d).astype(np.float32))
    yq = jnp.asarray(np.sign(rng.randn(12)).astype(np.float32))

    cfg = ExactGPConfig(
        kernel=KernelConfig(kind="matern", ard_dims=d),
        priors=GPPriorConfig(noise_mode=0.1),
    )
    raw = init_raw_params(cfg.kernel)
    assert raw["raw_lengthscale"].shape == (d,)
    raw["raw_noise"] = noise_to_raw(jnp.asarray(0.1))
    med = median_lengthscale_init(x)
    raw["raw_lengthscale"] = positive_to_raw(jnp.broadcast_to(med, (d,)))
    flat0 = flatten_gp_params(cfg.kernel, raw)
    assert flat0.shape == (d + 2,)
    opt = LBFGSConfig(max_iters=25, history=8, max_growth=3, max_backtrack=10)

    def outer(feats):
        theta = fit_gp_implicit(cfg, opt, False, feats, y, flat0, None, mode_to_loc(med))
        return predictive_nll(
            cfg, unflatten_gp_params(cfg.kernel, theta), feats, y, xq, yq
        )

    loss, g = jax.value_and_grad(outer)(x)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_hypergradient_f32_matches_f64_pipeline():
    """Regression: the f32 pipeline's hypergradient must track the f64
    ground truth to <1e-3 relative. Without the f64/Gram-split backward
    (gp/ift.py:_bwd) this error was 20-140% — the IFT correction was
    numerical noise."""
    for seed in (3, 11):
        xs, ys, xq, yq = _episode(seed, ns=32, nq=16, d=16)
        g32 = np.asarray(jax.grad(lambda x_: _outer(x_, ys, xq, yq))(xs))
        with jax.enable_x64(True):
            xs64, ys64, xq64, yq64 = (
                jnp.asarray(np.asarray(a), jnp.float64) for a in (xs, ys, xq, yq)
            )
            g64 = np.asarray(jax.grad(lambda x_: _outer(x_, ys64, xq64, yq64))(xs64))
        rel = np.abs(g32 - g64).max() / np.abs(g64).max()
        assert rel < 1e-3, (seed, rel)
