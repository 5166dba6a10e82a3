"""Variational GP with support-set inducing points (Bernoulli likelihood).

From-scratch replacement for the reference's VariationalGPLayer
(fs_mol/utils/gp_utils.py:52-103): a CholeskyVariationalDistribution over
an UnwhitenedVariationalStrategy whose inducing points ARE the support
features (non-learned locations), plus gpytorch's VariationalELBO with a
probit BernoulliLikelihood — used by the ADKT-VGP model
(fs_mol/models/adaptive_dkt_vgp.py).

Math (zero mean, S = support size, u = f(X_s)):
  q(u)   = N(m, L Lᵀ)
  ELBO   = Σ_i E_{q(f_i)}[log p(y_i | f_i)] − KL(q(u) ‖ N(0, K_ss))
  q(f_*) = N(K_*s K_ss⁻¹ m,
             K_** − K_*s K_ss⁻¹ K_s* + K_*s K_ss⁻¹ S K_ss⁻¹ K_s*)
The expected Bernoulli-probit log likelihood is a fixed-node
Gauss-Hermite quadrature (gpytorch's quadrature strategy) so the whole
objective jits; the Bernoulli marginal is Φ(μ/√(1+σ²)).

Inner fit: compiled L-BFGS over the flat [m, tril(L), raw_outputscale,
raw_lengthscale...] vector, differentiable via the IFT (CG on HVPs — the
inner dimension is S(S+3)/2+2, far past the dense-Hessian regime).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adkf_ift_tpu.gp.fit import LBFGSConfig, minimize
from adkf_ift_tpu.gp.kernels import KernelConfig, kernel_matrix
from adkf_ift_tpu.gp.priors import lognormal_logpdf
from adkf_ift_tpu.gp.transforms import raw_to_positive

_HIGHEST = jax.lax.Precision.HIGHEST
_QUAD_POINTS = 20


@dataclass(frozen=True)
class VGPConfig:
    kernel: KernelConfig = KernelConfig()
    num_inducing: int = 64  # = support size (static)
    jitter: float = 1e-4
    # LogNormal lengthscale prior around the exact-GP pre-fit value
    # (adaptive_dkt_vgp.py:112-119: scale 0.2, mode = pre-fit lengthscale).
    lengthscale_prior_scale: float = 0.2
    use_lengthscale_prior: bool = True

    @property
    def num_kernel_params(self) -> int:
        n = 1  # raw_outputscale
        if self.kernel.has_lengthscale:
            n += self.kernel.ard_dims or 1
        return n

    @property
    def flat_dim(self) -> int:
        s = self.num_inducing
        return s + (s * (s + 1)) // 2 + self.num_kernel_params


class VGPParams(NamedTuple):
    mean: jnp.ndarray  # [S]
    chol: jnp.ndarray  # [S, S] lower-triangular
    kernel_raw: dict  # raw_outputscale (+ raw_lengthscale)


def flatten_vgp(config: VGPConfig, p: VGPParams) -> jnp.ndarray:
    s = config.num_inducing
    il = jnp.tril_indices(s)
    parts = [p.mean, p.chol[il], jnp.reshape(p.kernel_raw["raw_outputscale"], (-1,))]
    if config.kernel.has_lengthscale:
        parts.append(jnp.reshape(p.kernel_raw["raw_lengthscale"], (-1,)))
    return jnp.concatenate(parts)


def unflatten_vgp(config: VGPConfig, flat: jnp.ndarray) -> VGPParams:
    s = config.num_inducing
    ntri = (s * (s + 1)) // 2
    mean = flat[:s]
    chol = jnp.zeros((s, s), flat.dtype).at[jnp.tril_indices(s)].set(flat[s : s + ntri])
    idx = s + ntri
    kernel_raw = {"raw_outputscale": flat[idx]}
    idx += 1
    if config.kernel.has_lengthscale:
        n_ls = config.kernel.ard_dims or 1
        ls = flat[idx : idx + n_ls]
        kernel_raw["raw_lengthscale"] = ls if config.kernel.ard_dims else ls[0]
    return VGPParams(mean, chol, kernel_raw)


def init_vgp_flat(config: VGPConfig, kernel_raw: dict) -> jnp.ndarray:
    """m = 0, L = I (gpytorch CholeskyVariationalDistribution init),
    kernel params from the exact-GP pre-fit."""
    s = config.num_inducing
    return flatten_vgp(config, VGPParams(jnp.zeros((s,)), jnp.eye(s), kernel_raw))


def _masked_kss(config: VGPConfig, kernel_raw: dict, x: jnp.ndarray, mask: Optional[jnp.ndarray]):
    k = kernel_matrix(config.kernel, kernel_raw, x, x)
    if mask is not None:
        m = mask.astype(k.dtype)
        k = k * (m[:, None] * m[None, :]) + jnp.diag(1.0 - m)
    return k + config.jitter * jnp.eye(k.shape[0], dtype=k.dtype)


def _masked_variational(p: VGPParams, mask: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero the variational params of padded inducing points and pin their
    chol diagonal to 1, so they contribute exactly 0 to the KL."""
    if mask is None:
        return p.mean, p.chol
    m = mask.astype(p.mean.dtype)
    mean = p.mean * m
    chol = p.chol * (m[:, None] * m[None, :]) + jnp.diag(1.0 - m)
    return mean, chol


# Gauss-Hermite nodes/weights (static, f64 -> f32).
_GH_NODES, _GH_WEIGHTS = np.polynomial.hermite.hermgauss(_QUAD_POINTS)


def expected_bernoulli_log_prob(
    mu: jnp.ndarray, var: jnp.ndarray, y_pm1: jnp.ndarray
) -> jnp.ndarray:
    """E_{f~N(mu,var)}[log Φ(y·f)] per point by Gauss-Hermite quadrature
    (gpytorch BernoulliLikelihood.expected_log_prob)."""
    nodes = jnp.asarray(_GH_NODES, mu.dtype)
    weights = jnp.asarray(_GH_WEIGHTS, mu.dtype) / math.sqrt(math.pi)
    f = mu[:, None] + jnp.sqrt(2.0 * jnp.maximum(var, 1e-12))[:, None] * nodes[None, :]
    logp = jax.scipy.stats.norm.logcdf(y_pm1[:, None] * f)
    return jnp.sum(weights[None, :] * logp, axis=1)


def vgp_elbo(
    config: VGPConfig,
    flat: jnp.ndarray,
    x: jnp.ndarray,
    y_pm1: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    lengthscale_prior_loc: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ELBO (+ lengthscale prior log-prob), averaged per data point —
    the quantity whose negative is the ADKT-VGP inner objective."""
    p = unflatten_vgp(config, flat)
    mean, chol = _masked_variational(p, mask)
    s = config.num_inducing

    kss = _masked_kss(config, p.kernel_raw, x, mask)
    lp = jnp.linalg.cholesky(kss)

    # KL(q||prior): 0.5 [tr(Kss⁻¹ S) + mᵀKss⁻¹m − S + logdet Kss − logdet S]
    a = jax.scipy.linalg.solve_triangular(lp, chol, lower=True)  # Lp⁻¹ Lq
    trace = jnp.sum(a * a)
    b = jax.scipy.linalg.solve_triangular(lp, mean, lower=True)
    quad = jnp.sum(b * b)
    logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(lp)))
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(chol)) + 1e-20))
    n_eff = jnp.sum(mask) if mask is not None else jnp.asarray(float(s))
    kl = 0.5 * (trace + quad - n_eff + logdet_p - logdet_q)
    if mask is not None:
        # Padded dims are pinned to q = prior = N(0,1); they contribute
        # exactly +1 each to the trace (and 0 elsewhere), a parameter-free
        # constant — subtract it so the value matches the unpadded KL.
        kl = kl - 0.5 * (float(s) - n_eff)

    # Data fit: training points coincide with inducing points, so
    # q(f_i) = N(m_i, S_ii).
    var_q = jnp.sum(chol * chol, axis=1)
    ell = expected_bernoulli_log_prob(mean, var_q, y_pm1)
    if mask is not None:
        ell = ell * mask.astype(ell.dtype)
    elbo = jnp.sum(ell) - kl

    if (
        config.use_lengthscale_prior
        and config.kernel.has_lengthscale
        and lengthscale_prior_loc is not None
    ):
        ls = raw_to_positive(p.kernel_raw["raw_lengthscale"])
        elbo = elbo + jnp.sum(
            lognormal_logpdf(ls, lengthscale_prior_loc, config.lengthscale_prior_scale)
        )
    return elbo / jnp.maximum(n_eff, 1.0)


def vgp_predict(
    config: VGPConfig,
    flat: jnp.ndarray,
    x_support: jnp.ndarray,
    x_query: jnp.ndarray,
    support_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unwhitened-strategy predictive: returns (mean, variance) of q(f_*)."""
    p = unflatten_vgp(config, flat)
    mean, chol = _masked_variational(p, support_mask)

    kss = _masked_kss(config, p.kernel_raw, x_support, support_mask)
    kqs = kernel_matrix(config.kernel, p.kernel_raw, x_query, x_support)
    if support_mask is not None:
        kqs = kqs * support_mask.astype(kqs.dtype)[None, :]
    kqq_diag = jnp.diagonal(kernel_matrix(config.kernel, p.kernel_raw, x_query, x_query))

    lp = jnp.linalg.cholesky(kss)
    # A = Kss⁻¹ Ksq via two triangular solves
    tmp = jax.scipy.linalg.solve_triangular(lp, kqs.T, lower=True)  # Lp⁻¹ Ksq
    a = jax.scipy.linalg.solve_triangular(lp.T, tmp, lower=False)  # Kss⁻¹ Ksq
    mu = jnp.matmul(a.T, mean, precision=_HIGHEST)
    # var = kqq − diag(Kqs Kss⁻¹ Ksq) + diag(Aᵀ S A), S = Lq Lqᵀ
    var_prior_red = jnp.sum(tmp * tmp, axis=0)
    sa = jnp.matmul(chol.T, a, precision=_HIGHEST)  # Lqᵀ A
    var_q = jnp.sum(sa * sa, axis=0)
    var = jnp.maximum(kqq_diag - var_prior_red + var_q, 1e-8)
    return mu, var


def bernoulli_marginal_probs(mu: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """p(y=1) = Φ(μ/√(1+σ²)) (probit marginalization)."""
    return jax.scipy.stats.norm.cdf(mu / jnp.sqrt(1.0 + var))


def bernoulli_marginal_log_prob(
    mu: jnp.ndarray, var: jnp.ndarray, y_pm1: jnp.ndarray
) -> jnp.ndarray:
    return jax.scipy.stats.norm.logcdf(y_pm1 * mu / jnp.sqrt(1.0 + var))


def make_vgp_inner_loss(config, x, y_pm1, mask, ls_prior_loc):
    def loss(flat):
        return -vgp_elbo(config, flat, x, y_pm1, mask, ls_prior_loc)

    return loss


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fit_vgp_implicit(
    config: VGPConfig,
    optimizer: LBFGSConfig,
    first_order: bool,
    x: jnp.ndarray,
    y_pm1: jnp.ndarray,
    init_flat: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    lengthscale_prior_loc: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Inner ELBO maximization, differentiable wrt x via the IFT
    (CG on Hessian-vector products; inner dim is S(S+3)/2 + kernel)."""
    loss = make_vgp_inner_loss(config, x, y_pm1, mask, lengthscale_prior_loc)
    return minimize(loss, init_flat, optimizer).x


def _fwd(config, optimizer, first_order, x, y, init_flat, mask, ls_loc):
    theta = fit_vgp_implicit(config, optimizer, first_order, x, y, init_flat, mask, ls_loc)
    return theta, (x, y, theta, mask, ls_loc)


_CG_ITERS = 100


def _bwd(config, optimizer, first_order, residuals, theta_bar):
    x, y, theta_star, mask, ls_loc = residuals
    zero_init = jnp.zeros_like(theta_star)
    zero_mask = None if mask is None else jnp.zeros_like(mask)
    zero_loc = None if ls_loc is None else jnp.zeros_like(ls_loc)
    if first_order:
        return (jnp.zeros_like(x), jnp.zeros_like(y), zero_init, zero_mask, zero_loc)

    # Float64 backward (trace-scoped x64) — reverse-over-reverse through
    # the ELBO in f32 carries the same catastrophic cancellation measured
    # on the exact-GP path (gp/ift.py:_bwd); the tensors here are tiny.
    x_dt, y_dt = x.dtype, y.dtype
    with jax.enable_x64(True):
        f64 = jnp.float64
        x64, y64, theta64, bar64 = (
            x.astype(f64), y.astype(f64), theta_star.astype(f64), theta_bar.astype(f64)
        )
        mask64 = None if mask is None else mask.astype(f64)
        loc64 = None if ls_loc is None else ls_loc.astype(f64)

        loss_theta = make_vgp_inner_loss(config, x64, y64, mask64, loc64)
        grad_fn = jax.grad(loss_theta)

        def hvp(v):
            return jax.jvp(grad_fn, (theta64,), (v,))[1] + 1e-6 * v

        v, _ = jax.scipy.sparse.linalg.cg(hvp, bar64, maxiter=_CG_ITERS)

        def grad_wrt_theta(x_, y_):
            return jax.grad(make_vgp_inner_loss(config, x_, y_, mask64, loc64))(theta64)

        _, vjp_fn = jax.vjp(grad_wrt_theta, x64, y64)
        x_bar, y_bar = vjp_fn(v)
        x_bar = x_bar.astype(x_dt)
        y_bar = y_bar.astype(y_dt)
    return (-x_bar, -y_bar, zero_init, zero_mask, zero_loc)


fit_vgp_implicit.defvjp(_fwd, _bwd)
