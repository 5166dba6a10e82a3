"""Numeric golden tests for the exact-GP layer vs closed-form numpy."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adkf_ift_tpu.gp import (
    ExactGPConfig,
    GPPriorConfig,
    KernelConfig,
    kernel_matrix,
    lognormal_logpdf,
    marginal_log_likelihood,
    median_lengthscale_init,
    mode_to_loc,
    mvn_nll,
    noise_to_raw,
    positive_to_raw,
    posterior,
    predictive_nll,
    raw_to_noise,
    raw_to_positive,
)


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)


def _params(noise=0.1, outputscale=1.3, lengthscale=0.8):
    return {
        "raw_noise": noise_to_raw(jnp.asarray(noise)),
        "raw_outputscale": positive_to_raw(jnp.asarray(outputscale)),
        "raw_lengthscale": positive_to_raw(jnp.asarray(lengthscale)),
    }


def test_transforms_roundtrip():
    for v in [1e-3, 0.1, 1.0, 25.0]:
        assert np.isclose(float(raw_to_positive(positive_to_raw(jnp.asarray(v)))), v, rtol=1e-4)
        assert np.isclose(float(raw_to_noise(noise_to_raw(jnp.asarray(v)))), v, rtol=1e-4)


def test_matern52_closed_form():
    x1 = _rand((5, 3), 1)
    x2 = _rand((4, 3), 2)
    ls, os_ = 0.7, 2.1
    params = _params(outputscale=os_, lengthscale=ls)
    k = np.asarray(kernel_matrix(KernelConfig("matern"), params, x1, x2))
    x1n, x2n = np.asarray(x1), np.asarray(x2)
    for i in range(5):
        for j in range(4):
            r = np.linalg.norm(x1n[i] - x2n[j]) / ls
            expected = os_ * (1 + math.sqrt(5) * r + 5 * r * r / 3) * math.exp(-math.sqrt(5) * r)
            assert np.isclose(k[i, j], expected, rtol=1e-4), (i, j)


def test_rbf_closed_form():
    x = _rand((6, 2), 3)
    params = _params(outputscale=1.0, lengthscale=1.5)
    k = np.asarray(kernel_matrix(KernelConfig("rbf"), params, x, x))
    xn = np.asarray(x)
    for i in range(6):
        for j in range(6):
            expected = math.exp(-np.sum((xn[i] - xn[j]) ** 2) / (2 * 1.5**2))
            assert np.isclose(k[i, j], expected, rtol=1e-4)


def test_tanimoto_kernel_properties():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 3, size=(8, 32)).astype(np.float32))
    params = {"raw_outputscale": positive_to_raw(jnp.asarray(1.0))}
    k = np.asarray(kernel_matrix(KernelConfig("tanimoto"), params, x, x))
    assert np.allclose(np.diag(k), 1.0, atol=1e-4)
    assert np.all(k >= 0) and np.all(k <= 1.0 + 1e-5)
    assert np.allclose(k, k.T, atol=1e-5)


def test_mll_matches_numpy_closed_form():
    """MLL (without priors) must equal the multivariate normal log density / n."""
    n = 12
    x = _rand((n, 4), 5)
    y = _rand((n,), 6)
    noise, os_, ls = 0.23, 1.7, 0.9
    params = _params(noise, os_, ls)
    cfg = ExactGPConfig(
        kernel=KernelConfig("matern"),
        priors=GPPriorConfig(use_lengthscale_prior=False),
        jitter=0.0,
    )
    got = float(marginal_log_likelihood(cfg, params, x, y))

    k = np.asarray(kernel_matrix(cfg.kernel, params, x, x)) + noise * np.eye(n)
    sign, logdet = np.linalg.slogdet(k)
    quad = float(np.asarray(y) @ np.linalg.solve(k, np.asarray(y)))
    log_marg = -0.5 * (quad + logdet + n * math.log(2 * math.pi))
    log_prior = float(lognormal_logpdf(jnp.asarray(noise), mode_to_loc(jnp.asarray(0.1)), 0.25))
    expected = (log_marg + log_prior) / n
    assert np.isclose(got, expected, rtol=1e-4), (got, expected)


def test_posterior_matches_numpy():
    ns, nq = 10, 7
    xs = _rand((ns, 3), 7)
    ys = _rand((ns,), 8)
    xq = _rand((nq, 3), 9)
    noise = 0.15
    params = _params(noise=noise)
    cfg = ExactGPConfig(jitter=0.0)
    post = posterior(cfg, params, xs, ys, xq, noisy=True)

    kss = np.asarray(kernel_matrix(cfg.kernel, params, xs, xs)) + noise * np.eye(ns)
    kqs = np.asarray(kernel_matrix(cfg.kernel, params, xq, xs))
    kqq = np.asarray(kernel_matrix(cfg.kernel, params, xq, xq))
    mean = kqs @ np.linalg.solve(kss, np.asarray(ys))
    cov = kqq - kqs @ np.linalg.solve(kss, kqs.T) + noise * np.eye(nq)
    assert np.allclose(np.asarray(post.mean), mean, atol=1e-4)
    assert np.allclose(np.asarray(post.covariance), cov, atol=1e-4)


def test_masked_mll_equals_unpadded():
    """Padding with the identity-row trick must reproduce the unpadded value."""
    n, pad = 9, 4
    x = _rand((n, 3), 10)
    y = _rand((n,), 11)
    params = _params()
    cfg = ExactGPConfig(priors=GPPriorConfig(use_lengthscale_prior=False), jitter=0.0)
    base = float(marginal_log_likelihood(cfg, params, x, y))

    x_pad = jnp.concatenate([x, jnp.ones((pad, 3)) * 37.0])
    y_pad = jnp.concatenate([y, jnp.full((pad,), -5.0)])
    mask = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])
    padded = float(marginal_log_likelihood(cfg, params, x_pad, y_pad, mask=mask))
    assert np.isclose(base, padded, rtol=1e-4), (base, padded)


def test_masked_predictive_nll_equals_unpadded():
    ns, nq, pad_s, pad_q = 8, 6, 3, 5
    xs, ys = _rand((ns, 3), 12), _rand((ns,), 13)
    xq, yq = _rand((nq, 3), 14), _rand((nq,), 15)
    params = _params()
    cfg = ExactGPConfig(jitter=0.0)
    base = float(predictive_nll(cfg, params, xs, ys, xq, yq))

    xs_p = jnp.concatenate([xs, jnp.ones((pad_s, 3)) * 11.0])
    ys_p = jnp.concatenate([ys, jnp.ones(pad_s)])
    ms = jnp.concatenate([jnp.ones(ns), jnp.zeros(pad_s)])
    xq_p = jnp.concatenate([xq, jnp.ones((pad_q, 3)) * -4.0])
    yq_p = jnp.concatenate([yq, jnp.ones(pad_q)])
    mq = jnp.concatenate([jnp.ones(nq), jnp.zeros(pad_q)])
    padded = float(predictive_nll(cfg, params, xs_p, ys_p, xq_p, yq_p, support_mask=ms, query_mask=mq))
    assert np.isclose(base, padded, rtol=1e-4), (base, padded)


def test_mvn_nll_vs_scipy():
    from scipy.stats import multivariate_normal

    n = 8
    a = np.random.RandomState(3).randn(n, n).astype(np.float32)
    cov = a @ a.T + n * np.eye(n, dtype=np.float32)
    mean = np.random.RandomState(4).randn(n).astype(np.float32)
    y = np.random.RandomState(5).randn(n).astype(np.float32)
    got = float(mvn_nll(jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(y), jitter=0.0))
    expected = -multivariate_normal.logpdf(y, mean=mean, cov=cov)
    assert np.isclose(got, expected, rtol=1e-4)


def test_median_lengthscale_matches_reference_semantics():
    """sqrt(0.5 * median of positive upper-tri squared distances), torch
    median convention (lower middle element for even counts)."""
    x = _rand((9, 4), 20)
    got = float(median_lengthscale_init(x))
    xn = np.asarray(x)
    d2 = ((xn[:, None, :] - xn[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(9, k=1)
    vals = np.sort(d2[iu][d2[iu] > 0])
    med = vals[(len(vals) - 1) // 2]
    assert np.isclose(got, math.sqrt(0.5 * med), rtol=1e-4)


def test_mll_jits_and_vmaps():
    cfg = ExactGPConfig()
    params = _params()
    xs = _rand((4, 16, 3), 30)
    ys = _rand((4, 16), 31)
    fn = jax.jit(jax.vmap(lambda x, y: marginal_log_likelihood(cfg, params, x, y)))
    out = fn(xs, ys)
    assert out.shape == (4,)
    assert np.all(np.isfinite(np.asarray(out)))
