"""Cross-framework golden tests: our GP MLL / posterior / IFT
hypergradient vs an independent PyTorch implementation of the same math
(the reference stack is torch+GPyTorch; gpytorch itself is not installed,
so the torch side is written from the definitions — an independent
implementation agreeing to ~1e-4 is strong evidence both are right)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

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
    marginal_log_likelihood,
    noise_to_raw,
    positive_to_raw,
    posterior,
    predictive_nll,
    unflatten_gp_params,
)

NOISE_LB = 1e-4


def _torch_matern52(x1, x2, lengthscale, outputscale):
    # Manual pairwise distance: torch.cdist has no double-backward, which
    # the unrolled-IFT cross-check needs.
    a, b = x1 / lengthscale, x2 / lengthscale
    d2 = (a * a).sum(-1)[:, None] + (b * b).sum(-1)[None, :] - 2.0 * a @ b.T
    d = torch.sqrt(torch.clamp(d2, min=1e-12))
    sqrt5 = math.sqrt(5.0)
    return outputscale * (1 + sqrt5 * d + 5.0 / 3.0 * d**2) * torch.exp(-sqrt5 * d)


def _torch_mll(raw, x, y, noise_prior=False):
    """Per-datapoint exact MLL with softplus raw params (our convention),
    optionally with the LogNormal(mode 0.1, scale 0.25) noise prior."""
    noise = torch.nn.functional.softplus(raw[0]) + NOISE_LB
    outputscale = torch.nn.functional.softplus(raw[1])
    lengthscale = torch.nn.functional.softplus(raw[2])
    n = x.shape[0]
    k = _torch_matern52(x, x, lengthscale, outputscale) + noise * torch.eye(n, dtype=x.dtype)
    k = k + 1e-5 * torch.eye(n, dtype=x.dtype)
    chol = torch.linalg.cholesky(k)
    alpha = torch.cholesky_solve(y[:, None], chol)[:, 0]
    quad = torch.dot(y, alpha)
    logdet = 2.0 * torch.log(torch.diagonal(chol)).sum()
    mll = -0.5 * (quad + logdet + n * math.log(2 * math.pi))
    if noise_prior:
        scale = 0.25
        loc = math.log(0.1) + scale**2
        logn = torch.log(noise)
        mll = mll + (
            -logn - math.log(scale) - 0.5 * math.log(2 * math.pi)
            - (logn - loc) ** 2 / (2 * scale**2)
        )
    return mll / n


def _setup(n=24, d=6, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float64)
    w = rng.randn(d)
    y = np.tanh(x @ w) + 0.1 * rng.randn(n)
    raw = np.array([-2.0, 0.3, 0.5])  # raw noise/outputscale/lengthscale
    return x, y.astype(np.float64), raw


CFG = ExactGPConfig(
    kernel=KernelConfig(kind="matern"),
    priors=GPPriorConfig(use_noise_prior=False, use_lengthscale_prior=False),
)


def test_mll_matches_torch():
    x, y, raw = _setup()
    ours = float(
        marginal_log_likelihood(
            CFG,
            unflatten_gp_params(CFG.kernel, jnp.asarray(raw, jnp.float32)),
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
        )
    )
    theirs = float(_torch_mll(torch.tensor(raw), torch.tensor(x), torch.tensor(y)))
    assert abs(ours - theirs) < 5e-4, (ours, theirs)


def test_posterior_matches_torch():
    x, y, raw = _setup()
    xq = np.random.RandomState(1).randn(10, x.shape[1])
    params = unflatten_gp_params(CFG.kernel, jnp.asarray(raw, jnp.float32))
    post = posterior(
        CFG, params, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(xq, jnp.float32), noisy=True,
    )
    tr = torch.tensor(raw)
    noise = torch.nn.functional.softplus(tr[0]) + NOISE_LB
    outputscale = torch.nn.functional.softplus(tr[1])
    lengthscale = torch.nn.functional.softplus(tr[2])
    tx, ty, txq = torch.tensor(x), torch.tensor(y), torch.tensor(xq)
    kss = _torch_matern52(tx, tx, lengthscale, outputscale) + (noise + 1e-5) * torch.eye(len(x), dtype=tx.dtype)
    kqs = _torch_matern52(txq, tx, lengthscale, outputscale)
    kqq = _torch_matern52(txq, txq, lengthscale, outputscale)
    chol = torch.linalg.cholesky(kss)
    mean = kqs @ torch.cholesky_solve(ty[:, None], chol)[:, 0]
    v = torch.linalg.solve_triangular(chol, kqs.T, upper=False)
    var = torch.diagonal(kqq - v.T @ v) + noise
    np.testing.assert_allclose(np.asarray(post.mean), mean.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(post.variance), var.numpy(), rtol=2e-3, atol=2e-3)


def _torch_predictive_nll(tx, ty, txq, tyq, theta):
    noise = torch.nn.functional.softplus(theta[0]) + NOISE_LB
    outputscale = torch.nn.functional.softplus(theta[1])
    lengthscale = torch.nn.functional.softplus(theta[2])
    n = tx.shape[0]
    kss = _torch_matern52(tx, tx, lengthscale, outputscale) + (noise + 1e-5) * torch.eye(n, dtype=tx.dtype)
    kqs = _torch_matern52(txq, tx, lengthscale, outputscale)
    kqq = _torch_matern52(txq, txq, lengthscale, outputscale)
    chol = torch.linalg.cholesky(kss)
    mean = kqs @ torch.cholesky_solve(ty[:, None], chol)[:, 0]
    v = torch.linalg.solve_triangular(chol, kqs.T, upper=False)
    cov = kqq - v.T @ v + (noise + 1e-5) * torch.eye(txq.shape[0], dtype=tx.dtype)
    cholq = torch.linalg.cholesky(cov)
    resid = tyq - mean
    alpha = torch.linalg.solve_triangular(cholq, resid[:, None], upper=False)[:, 0]
    return 0.5 * (
        (alpha**2).sum()
        + 2.0 * torch.log(torch.diagonal(cholq)).sum()
        + txq.shape[0] * math.log(2 * math.pi)
    )


def test_vgp_elbo_and_predictive_match_torch():
    """Our VGP probit-ELBO + unwhitened predictive (gp/variational.py) vs
    an independent torch implementation of the reference's variational
    stack (gpytorch CholeskyVariationalDistribution +
    UnwhitenedVariationalStrategy + Bernoulli VariationalELBO,
    fs_mol/utils/gp_utils.py:52-103): KL against N(0, Kss), Gauss-Hermite
    expected probit log-likelihood, and q(f_*) moments."""
    from adkf_ift_tpu.gp.variational import (
        VGPConfig,
        VGPParams,
        flatten_vgp,
        vgp_elbo,
        vgp_predict,
    )

    rng = np.random.RandomState(11)
    s, d, q = 12, 5, 7
    x = rng.randn(s, d).astype(np.float64)
    xq = rng.randn(q, d).astype(np.float64)
    y = np.sign(rng.randn(s)).astype(np.float64)
    m0 = 0.3 * rng.randn(s)
    l0 = np.tril(0.1 * rng.randn(s, s)) + np.diag(0.5 + rng.rand(s))
    raw_os, raw_ls = 0.4, 0.7
    jitter = 1e-4

    cfg = VGPConfig(
        kernel=KernelConfig(kind="matern"), num_inducing=s, jitter=jitter,
        use_lengthscale_prior=False,
    )
    with jax.enable_x64(True):
        flat = flatten_vgp(
            cfg,
            VGPParams(
                jnp.asarray(m0), jnp.asarray(l0),
                {"raw_outputscale": jnp.asarray(raw_os), "raw_lengthscale": jnp.asarray(raw_ls)},
            ),
        )
        ours_elbo = float(vgp_elbo(cfg, flat, jnp.asarray(x), jnp.asarray(y)))
        mu_ours, var_ours = vgp_predict(cfg, flat, jnp.asarray(x), jnp.asarray(xq))
        mu_ours, var_ours = np.asarray(mu_ours), np.asarray(var_ours)

    # --- independent torch implementation
    tx, txq, ty = torch.tensor(x), torch.tensor(xq), torch.tensor(y)
    tm, tl = torch.tensor(m0), torch.tensor(l0)
    outputscale = torch.nn.functional.softplus(torch.tensor(raw_os, dtype=torch.float64))
    lengthscale = torch.nn.functional.softplus(torch.tensor(raw_ls, dtype=torch.float64))
    kss = _torch_matern52(tx, tx, lengthscale, outputscale) + jitter * torch.eye(s, dtype=tx.dtype)
    lp = torch.linalg.cholesky(kss)

    # KL(q || N(0, Kss))
    a = torch.linalg.solve_triangular(lp, tl, upper=False)
    b = torch.linalg.solve_triangular(lp, tm[:, None], upper=False)[:, 0]
    kl = 0.5 * (
        (a * a).sum() + (b * b).sum() - s
        + 2.0 * torch.log(torch.diagonal(lp)).sum()
        - 2.0 * torch.log(torch.diagonal(tl).abs()).sum()
    )
    # Expected probit log-likelihood by Gauss-Hermite (training points are
    # the inducing points, so q(f_i) = N(m_i, (L L^T)_ii)).
    var_q = (tl * tl).sum(1)
    nodes, weights = np.polynomial.hermite.hermgauss(20)
    f = tm[:, None] + torch.sqrt(2.0 * var_q)[:, None] * torch.tensor(nodes)[None, :]
    logp = torch.special.log_ndtr(ty[:, None] * f)
    ell = (torch.tensor(weights)[None, :] / math.sqrt(math.pi) * logp).sum()
    theirs_elbo = float((ell - kl) / s)
    assert abs(ours_elbo - theirs_elbo) < 1e-6, (ours_elbo, theirs_elbo)

    # Unwhitened predictive q(f_*)
    kqs = _torch_matern52(txq, tx, lengthscale, outputscale)
    kqq = _torch_matern52(txq, txq, lengthscale, outputscale)
    av = torch.cholesky_solve(kqs.T, lp)  # Kss^-1 Ksq
    mu_t = (av.T @ tm).numpy()
    tmp = torch.linalg.solve_triangular(lp, kqs.T, upper=False)
    sa = tl.T @ av
    var_t = (torch.diagonal(kqq) - (tmp * tmp).sum(0) + (sa * sa).sum(0)).numpy()
    np.testing.assert_allclose(mu_ours, mu_t, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(var_ours, var_t, rtol=1e-8, atol=1e-8)


def test_ift_hypergradient_matches_torch_cauchy():
    """Our custom_vjp IFT backward vs an independent torch implementation
    of the same mathematics (the reference's cauchy_hypergradient.py:
    dense inner Hessian, mixed partials, linear solve, grad correction),
    both evaluated at OUR inner optimum theta*. Uses the model's real
    configuration (LogNormal noise prior) — without it the optimum sits
    on the noise lower bound where the Hessian is numerically singular."""
    x, y, raw0 = _setup(n=16, d=4, seed=3)
    xq = np.random.RandomState(5).randn(8, 4)
    yq = np.sign(np.random.RandomState(6).randn(8)).astype(np.float64)

    cfg = ExactGPConfig(
        kernel=KernelConfig(kind="matern"),
        priors=GPPriorConfig(noise_mode=0.1, use_noise_prior=True, use_lengthscale_prior=False),
    )
    opt = LBFGSConfig(max_iters=200, history=10, grad_tol=1e-12)

    # f64 on the JAX side: the IFT solve amplifies the f32 convergence
    # floor of the inner fit; this test isolates the MATH, so run both
    # frameworks at the same precision.
    with jax.enable_x64(True):
        yj = jnp.asarray(y)

        theta_star = fit_gp_implicit(
            cfg, opt, False, jnp.asarray(x), yj, jnp.asarray(raw0), None, None
        )

        def outer(fs):
            theta = fit_gp_implicit(cfg, opt, False, fs, yj, jnp.asarray(raw0), None, None)
            return predictive_nll(
                cfg, unflatten_gp_params(cfg.kernel, theta), fs, yj,
                jnp.asarray(xq), jnp.asarray(yq),
            )

        g_ours = np.asarray(jax.grad(outer)(jnp.asarray(x)))
        theta_star = np.asarray(theta_star, np.float64)

    # --- torch: cauchy_hypergradient at the same theta*
    tx = torch.tensor(x, requires_grad=True)
    ty, txq, tyq = torch.tensor(y), torch.tensor(xq), torch.tensor(yq)
    th = torch.tensor(theta_star, requires_grad=True)

    inner = lambda theta, feats: -_torch_mll(theta, feats, ty, noise_prior=True)
    h = torch.autograd.functional.hessian(lambda t: inner(t, tx.detach()), th.detach())
    h = h + 1e-6 * torch.eye(3, dtype=h.dtype)  # same damping as gp/ift.py

    outer_t = _torch_predictive_nll(tx, ty, txq, tyq, th)
    g_theta, g_x_direct = torch.autograd.grad(outer_t, (th, tx))
    v = torch.linalg.solve(h, g_theta)

    # mixed partials: d/dx [ d(inner)/dtheta . v ]
    tx2 = torch.tensor(x, requires_grad=True)
    inner_loss = inner(th, tx2)
    (gi_theta,) = torch.autograd.grad(inner_loss, th, create_graph=True)
    (mixed,) = torch.autograd.grad((gi_theta * v).sum(), tx2)

    g_torch = (g_x_direct - mixed).numpy()
    cos = np.sum(g_ours * g_torch) / (np.linalg.norm(g_ours) * np.linalg.norm(g_torch))
    assert cos > 0.999, cos
    assert abs(np.linalg.norm(g_ours) / np.linalg.norm(g_torch) - 1.0) < 0.02
