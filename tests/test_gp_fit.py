"""Tests for the compiled inner-loop L-BFGS: convergence on analytic
functions, parity with scipy L-BFGS-B on real GP marginal likelihoods
(the reference's inner optimizer), and vmappability."""

import numpy as np
import jax
import jax.numpy as jnp

from adkf_ift_tpu.gp import (
    ExactGPConfig,
    GPPriorConfig,
    KernelConfig,
    LBFGSConfig,
    fit_gp,
    flatten_gp_params,
    init_raw_params,
    kernel_matrix,
    lbfgs_minimize,
    make_inner_loss,
    median_lengthscale_init,
    mode_to_loc,
    noise_to_raw,
    positive_to_raw,
    raw_to_noise,
    raw_to_positive,
    unflatten_gp_params,
)


def test_lbfgs_quadratic():
    a = jnp.asarray(np.diag([1.0, 10.0, 100.0]).astype(np.float32))
    b = jnp.asarray(np.array([1.0, -2.0, 3.0], np.float32))

    def f(x):
        return 0.5 * x @ a @ x - b @ x

    res = lbfgs_minimize(f, jnp.zeros(3), LBFGSConfig(max_iters=60))
    expected = np.linalg.solve(np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(res.x), expected, atol=1e-4)


def test_lbfgs_rosenbrock():
    def rosen(x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2

    res = lbfgs_minimize(rosen, jnp.asarray([-1.2, 1.0]), LBFGSConfig(max_iters=200, history=10))
    assert np.allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-2)


def _make_episode(seed, n=32, d=8):
    """Synthetic GP-distributed data so the MLL has a meaningful optimum."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    true_params = {
        "raw_noise": noise_to_raw(jnp.asarray(0.1)),
        "raw_outputscale": positive_to_raw(jnp.asarray(2.0)),
        "raw_lengthscale": positive_to_raw(jnp.asarray(1.5)),
    }
    cfg = KernelConfig("matern")
    k = np.array(kernel_matrix(cfg, true_params, jnp.asarray(x), jnp.asarray(x)))
    k += 0.1 * np.eye(n)
    y = np.linalg.cholesky(k + 1e-6 * np.eye(n)) @ rng.randn(n).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y.astype(np.float32))


def _default_init(cfg: ExactGPConfig, x):
    params = init_raw_params(cfg.kernel)
    params["raw_noise"] = noise_to_raw(jnp.asarray(cfg.priors.noise_mode))
    if cfg.kernel.has_lengthscale:
        med = median_lengthscale_init(x)
        params["raw_lengthscale"] = positive_to_raw(med)
    return flatten_gp_params(cfg.kernel, params)


def test_fit_matches_scipy_lbfgsb():
    """Our compiled L-BFGS must reach the same optimum (same final loss
    within tolerance) as scipy's L-BFGS-B — the reference's fitter."""
    from scipy.optimize import minimize

    x, y = _make_episode(0)
    cfg = ExactGPConfig(priors=GPPriorConfig(noise_mode=0.1, use_lengthscale_prior=True))
    med = median_lengthscale_init(x)
    ls_loc = mode_to_loc(med)
    init = _default_init(cfg, x)

    loss = make_inner_loss(cfg, x, y, lengthscale_prior_loc=ls_loc)
    theta_star, res = fit_gp(cfg, x, y, init, lengthscale_prior_loc=ls_loc)
    ours = float(loss(theta_star))

    loss_np = lambda t: float(loss(jnp.asarray(t, jnp.float32)))
    grad_np = lambda t: np.asarray(jax.grad(loss)(jnp.asarray(t, jnp.float32)), np.float64)
    sp = minimize(loss_np, np.asarray(init, np.float64), jac=grad_np, method="L-BFGS-B")
    assert ours <= sp.fun + 5e-4, (ours, sp.fun)
    # Recovered hyperparameters should be close to scipy's.
    ours_params = unflatten_gp_params(cfg.kernel, theta_star)
    sp_params = unflatten_gp_params(cfg.kernel, jnp.asarray(sp.x, jnp.float32))
    assert np.isclose(
        float(raw_to_noise(ours_params["raw_noise"])),
        float(raw_to_noise(sp_params["raw_noise"])),
        rtol=0.1,
        atol=5e-3,
    )
    assert np.isclose(
        float(raw_to_positive(ours_params["raw_lengthscale"])),
        float(raw_to_positive(sp_params["raw_lengthscale"])),
        rtol=0.1,
    )


def test_fit_gradient_near_zero_at_optimum():
    x, y = _make_episode(1)
    cfg = ExactGPConfig(priors=GPPriorConfig(use_lengthscale_prior=False))
    init = _default_init(cfg, x)
    theta_star, res = fit_gp(cfg, x, y, init)
    g = jax.grad(make_inner_loss(cfg, x, y))(theta_star)
    assert float(jnp.max(jnp.abs(g))) < 5e-3, np.asarray(g)


def test_fit_vmaps_over_tasks():
    episodes = [_make_episode(s) for s in range(4)]
    xs = jnp.stack([e[0] for e in episodes])
    ys = jnp.stack([e[1] for e in episodes])
    cfg = ExactGPConfig()

    def one(x, y):
        med = median_lengthscale_init(x)
        init = _default_init(cfg, x)
        theta, res = fit_gp(cfg, x, y, init, lengthscale_prior_loc=mode_to_loc(med))
        return theta, res.value

    thetas, values = jax.jit(jax.vmap(one))(xs, ys)
    assert thetas.shape == (4, 3)
    assert np.all(np.isfinite(np.asarray(values)))
    # Each vmapped fit must reach the SAME OPTIMUM as the solo fit. Under
    # the default (auto -> saddle-free Newton) the discrete branches
    # (Armijo argmax, eigh) amplify batched-vs-solo f32 kernel noise into
    # ~3e-3 theta slack along the optimum's flat directions, but the
    # achieved VALUE agrees to float noise — assert value tightly, theta
    # loosely here, and theta tightly under forced L-BFGS below.
    theta0, value0 = jax.jit(one)(xs[0], ys[0])
    assert np.allclose(float(values[0]), float(value0), rtol=1e-5, atol=1e-5)
    assert np.allclose(np.asarray(thetas[0]), np.asarray(theta0), atol=2e-2)

    def one_lbfgs(x, y):
        med = median_lengthscale_init(x)
        init = _default_init(cfg, x)
        theta, res = fit_gp(
            cfg, x, y, init,
            lengthscale_prior_loc=mode_to_loc(med),
            optimizer=LBFGSConfig(method="lbfgs"),
        )
        return theta, res.value

    thetas_l, _ = jax.jit(jax.vmap(one_lbfgs))(xs, ys)
    theta0_l, _ = jax.jit(one_lbfgs)(xs[0], ys[0])
    assert np.allclose(np.asarray(thetas_l[0]), np.asarray(theta0_l), atol=1e-4)


def test_newton_matches_lbfgs_optimum():
    """The damped-Newton inner optimizer (method='newton') must reach the
    same optimum as L-BFGS on the 3-parameter non-ARD problem."""
    from dataclasses import replace as _replace

    import numpy as np

    from adkf_ift_tpu.gp.fit import LBFGSConfig, minimize, make_inner_loss
    from adkf_ift_tpu.gp import ExactGPConfig, GPPriorConfig, KernelConfig

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    y = jnp.asarray(np.sign(rng.randn(32)).astype(np.float32))
    cfg = ExactGPConfig(
        kernel=KernelConfig(kind="matern"),
        priors=GPPriorConfig(noise_mode=0.1, use_noise_prior=True, use_lengthscale_prior=False),
    )
    loss = make_inner_loss(cfg, x, y)
    x0 = jnp.asarray([-2.0, 0.3, 0.5])

    res_l = minimize(loss, x0, LBFGSConfig(max_iters=80, grad_tol=1e-8))
    res_n = minimize(loss, x0, LBFGSConfig(method="newton", newton_iters=20, grad_tol=1e-8))
    assert float(res_n.value) <= float(res_l.value) + 1e-4, (res_l.value, res_n.value)
    np.testing.assert_allclose(np.asarray(res_n.x), np.asarray(res_l.x), rtol=0.05, atol=0.05)
    # Quadratic convergence: far fewer iterations than L-BFGS.
    assert int(res_n.iterations) <= 20


def test_ard_warmstart_matches_full_budget():
    """Two-stage ARD init (gp/fit.ard_warmstart_init): the isotropic
    Newton pre-fit must (a) strictly improve the starting loss, and
    (b) let HALF the L-BFGS budget reach at least the loss a cold start
    reaches with the full budget."""
    from adkf_ift_tpu.gp import ard_warmstart_init, minimize

    rng = np.random.RandomState(3)
    n, d = 40, 16
    x_np = rng.randn(n, d).astype(np.float32)
    y_np = np.tanh(x_np[:, 0] + 0.5 * x_np[:, 1]) + 0.05 * rng.randn(n)
    x = jnp.asarray(x_np)
    y = jnp.asarray((y_np - y_np.mean()).astype(np.float32))

    cfg = ExactGPConfig(
        kernel=KernelConfig("matern", ard_dims=d),
        priors=GPPriorConfig(noise_mode=0.1, use_lengthscale_prior=True),
    )
    med = median_lengthscale_init(x)
    ls_loc = mode_to_loc(med)
    params = init_raw_params(cfg.kernel)
    params["raw_noise"] = noise_to_raw(jnp.asarray(0.1))
    params["raw_lengthscale"] = positive_to_raw(
        jnp.broadcast_to(med, jnp.shape(params["raw_lengthscale"]))
    )
    init = flatten_gp_params(cfg.kernel, params)

    loss = make_inner_loss(cfg, x, y, lengthscale_prior_loc=ls_loc)
    warm = jax.jit(
        lambda i: ard_warmstart_init(cfg, x, y, i, None, ls_loc)
    )(init)
    assert warm.shape == init.shape
    assert float(loss(warm)) < float(loss(init)) - 1e-3

    cold_full = minimize(loss, init, LBFGSConfig(max_iters=24, history=8))
    warm_half = minimize(loss, warm, LBFGSConfig(max_iters=12, history=8))
    assert float(warm_half.value) <= float(cold_full.value) + 1e-3, (
        float(warm_half.value),
        float(cold_full.value),
    )


def test_default_method_is_auto_and_matches_bench():
    """The library default must be the measured-best configuration
    (VERDICT r2 weak #8): 'auto' resolves to saddle-free Newton for the
    tiny non-ARD inner problem (what bench.py measures) and to L-BFGS at
    ARD width (dense Hessians scale d^2)."""
    cfg = LBFGSConfig()
    assert cfg.method == "auto"
    assert cfg.resolve_method(3) == "newton"  # non-ARD: noise/outputscale/ls
    assert cfg.resolve_method(16) == "newton"
    assert cfg.resolve_method(2052) == "lbfgs"  # full-width ARD
    assert LBFGSConfig(method="lbfgs").resolve_method(3) == "lbfgs"
    assert LBFGSConfig(method="newton").resolve_method(2052) == "newton"


def test_minimize_auto_dispatches_newton_on_small_problem():
    """minimize() under the default config must take the Newton path on a
    small problem: newton_iters (not max_iters) bounds its iterations."""
    from adkf_ift_tpu.gp.fit import minimize

    def quad(x):
        return jnp.sum((x - 1.5) ** 2)

    # max_iters tiny, newton_iters generous: only the Newton path converges.
    cfg = LBFGSConfig(max_iters=1, newton_iters=12)
    res = minimize(quad, jnp.zeros(3), cfg)
    np.testing.assert_allclose(np.asarray(res.x), 1.5, atol=1e-4)


def test_ift_cg_budget_covers_measured_worst_case():
    """The ARD IFT backward's CG budget must cover the measured hard
    instance (~333 iterations to ift_cg_tol; benchmarks/ard_cpu_probe.py
    — the old 100-iteration default left 70-97% relative hypergradient
    error there, docs/ARD_TUNING.md). CG exits early at ift_cg_tol, so
    warm-started instances are unaffected by the larger ceiling."""
    cfg = LBFGSConfig()
    assert cfg.ift_cg_iters >= 400
    assert cfg.ift_cg_tol <= 1e-5


def test_ift_cg_solve_accurate_on_ill_conditioned_hessian():
    """The constant pin above can't catch a CG-solve regression (ADVICE
    r3 #2): under the DEFAULT budget, the matrix-free route of
    _solve_hessian_system must match a direct solve on a synthetic
    ill-conditioned problem shaped like the measured hard ARD tail
    (condition ~1e6 — ard_cpu_probe's hard instance needed 333
    iterations; a 100-iteration budget leaves ~80% error here too)."""
    from adkf_ift_tpu.gp.fit import LBFGSConfig
    from adkf_ift_tpu.gp.ift import DENSE_HESSIAN_MAX_DIM, _solve_hessian_system

    d = 160
    assert d > DENSE_HESSIAN_MAX_DIM  # must exercise the CG route
    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(d, d))
    # Condition 1e4 with a spread (logspace) spectrum: needs ~300 CG
    # iterations to 1e-5 — the same regime as the measured hard ARD
    # instance (333 iters) — while staying solvable inside the default
    # 400-iteration ceiling. (A 1e6-condition spread spectrum needs
    # ~1000+ iterations and would fail even a correct solver.)
    lam = np.logspace(-2, 2, d)
    h_np = (q * lam) @ q.T
    h_np = (h_np + h_np.T) / 2
    g_np = rng.randn(d)

    cfg = LBFGSConfig()
    with jax.enable_x64(True):
        h = jnp.asarray(h_np, jnp.float64)
        g = jnp.asarray(g_np, jnp.float64)
        theta_star = jnp.zeros(d, jnp.float64)

        def quad_loss(theta):
            return 0.5 * theta @ (h @ theta)

        v = _solve_hessian_system(
            quad_loss, theta_star, g,
            cg_iters=cfg.ift_cg_iters, cg_tol=cfg.ift_cg_tol,
        )
        direct = jnp.linalg.solve(h, g)
        rel = float(jnp.linalg.norm(v - direct) / jnp.linalg.norm(direct))
        # And the old insufficient budget really is insufficient here —
        # i.e. this problem would CATCH a silently-reduced budget.
        v100 = _solve_hessian_system(
            quad_loss, theta_star, g, cg_iters=100, cg_tol=cfg.ift_cg_tol,
        )
        rel100 = float(jnp.linalg.norm(v100 - direct) / jnp.linalg.norm(direct))
    assert rel < 1e-3, rel
    assert rel100 > 10 * rel, (rel100, rel)
